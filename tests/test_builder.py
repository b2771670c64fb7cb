"""Builder artifacts, resume/recovery, and generator determinism."""

import json
import os
import shutil

import numpy as np
import pytest
from pyspark.sql import functions as F


def test_dictionary_matches_oracle(spark, index_dir, oracle):
    d = spark.read.parquet(os.path.join(index_dir, "dictionary"))
    rows = {r["term"]: (r["df"], r["total_tf"]) for r in d.collect()}
    assert len(rows) == len(oracle.post)
    for t, plist in oracle.post.items():
        assert rows[t][0] == len(plist), t
        assert rows[t][1] == sum(plist.values()), t


def test_stats_match_oracle(index_dir, oracle):
    with open(os.path.join(index_dir, "stats.json")) as f:
        stats = json.load(f)
    assert stats["doc_count"] == oracle.doc_count
    assert stats["sum_dl"] == oracle.sum_dl
    assert stats["avgdl"] == pytest.approx(oracle.avgdl)


def test_docids_dense_and_unique(spark, index_dir):
    dm = spark.read.parquet(os.path.join(index_dir, "data", "_row=d"))
    n = dm.count()
    ids = dm.agg(
        F.count_distinct("_docid").alias("u"),
        F.min("_docid").alias("lo"),
        F.max("_docid").alias("hi"),
    ).collect()[0]
    assert ids["u"] == n and ids["lo"] == 0 and ids["hi"] == n - 1


def test_docids_ordered_within_segment(spark, index_dir):
    dm = spark.read.parquet(os.path.join(index_dir, "data", "_row=d"))
    pdf = dm.select("_seg", "_docid", "conv_id", "turn_idx").toPandas()
    for _, g in pdf.groupby("_seg"):
        g = g.sort_values("_docid")
        keys = list(zip(g["conv_id"], g["turn_idx"]))
        assert keys == sorted(keys)


def test_blocks_sized_and_sorted(spark, index_dir):
    post = spark.read.parquet(os.path.join(index_dir, "data", "_row=p"))
    assert post.filter(F.col("n_docs") > 128).count() == 0
    # per (seg, term): block_ids contiguous from 0, base_doc increasing
    pdf = (
        post.groupBy("_seg", "term")
        .agg(
            F.sort_array(F.collect_list("block_id")).alias("bids"),
            F.sort_array(F.collect_list(F.struct("block_id", "base_doc"))).alias("bb"),
        )
        .toPandas()
    )
    for _, r in pdf.iterrows():
        assert list(r["bids"]) == list(range(len(r["bids"])))
        bases = [b["base_doc"] for b in r["bb"]]
        assert bases == sorted(bases)


def test_resume_recovers_from_missing_manifest(spark, index_dir, tmp_path):
    """Crash window: data committed but manifest JSON missing -> recovery
    must NOT re-append the segment (FIXTURES.md §5 resume test)."""
    from opensearch_spark.index.builder import IndexConfig, build_index
    from opensearch_spark.transcripts import generate
    from tests.conftest import N_CONVS

    d = str(tmp_path / "resume")
    shutil.copytree(index_dir, d)
    os.remove(os.path.join(d, "manifests", "seg-00001.json"))
    os.remove(os.path.join(d, "manifests", "seg-00003.json"))
    pre = spark.read.parquet(os.path.join(d, "data")).count()
    docs = generate(spark, N_CONVS, partitions=4)
    build_index(spark, docs, d, IndexConfig(n_segments=8))
    post = spark.read.parquet(os.path.join(d, "data")).count()
    assert pre == post
    with open(os.path.join(d, "manifests", "seg-00001.json")) as f:
        assert json.load(f)["recovered"] is True


def test_waves_build_equivalent(spark, index_dir, tmp_path, oracle):
    from opensearch_spark.index.builder import IndexConfig, build_index
    from opensearch_spark.index.reader import InvertedIndex
    from opensearch_spark.query.executor import SearchEngine
    from opensearch_spark.transcripts import generate
    from tests.conftest import N_CONVS, assert_rank_identical

    d = str(tmp_path / "waves")
    docs = generate(spark, N_CONVS, partitions=4)
    build_index(spark, docs, d, IndexConfig(n_segments=8), waves=4)
    eng = SearchEngine(InvertedIndex(spark, d))
    rows = eng.search({"match": {"text": "error handling"}}, size=10).collect()
    assert_rank_identical(rows, oracle.topk(oracle.match("error handling"), 10))


def test_generator_deterministic_across_partitioning(spark):
    from opensearch_spark.transcripts import generate, generate_pandas

    a = generate(spark, 50, partitions=1).orderBy("conv_id", "turn_idx").toPandas()
    b = generate(spark, 50, partitions=7).orderBy("conv_id", "turn_idx").toPandas()
    assert a.equals(b)
    c = generate_pandas(np.arange(50)).sort_values(["conv_id", "turn_idx"], ignore_index=True)
    assert list(a["text"]) == list(c["text"])
    assert list(a["conv_id"]) == list(c["conv_id"])


def test_column_clash_rejected(spark):
    from opensearch_spark.index.builder import IndexConfig, build_index

    df = spark.createDataFrame([("a", 1, "t")], "conv_id string, turn_idx int, term string")
    with pytest.raises(ValueError, match="clash"):
        build_index(spark, df, "/tmp/never", IndexConfig())


def test_index_sort_layout_and_rank_identity(spark, index_dir, tmp_path, oracle):
    """index_sort (IndexSortConfig.java analog): docs are physically
    ordered by the sort field within each segment (tight parquet
    row-group min/max -> range/keyset pruning at scale), docIDs follow
    the sort, the plan records it — and results are identical to the
    default id-ordered build (scoring and tie-breaks never depend on
    docID order)."""
    import pandas as pd

    from opensearch_spark.index.builder import IndexConfig, build_index
    from opensearch_spark.index.reader import InvertedIndex
    from opensearch_spark.query.executor import SearchEngine
    from opensearch_spark.transcripts import generate
    from tests.conftest import N_CONVS, assert_rank_identical

    d = str(tmp_path / "sorted_idx")
    docs = generate(spark, N_CONVS, partitions=4)
    build_index(
        spark, docs, d, IndexConfig(n_segments=8, index_sort=[("ts", "desc")])
    )
    with open(os.path.join(d, "plan.json")) as f:
        plan = json.load(f)
    assert plan["index_sort"][0] == ["ts", "desc"]

    # physical layout: within each segment, docID order IS ts-desc order
    dm = spark.read.parquet(os.path.join(d, "data", "_row=d"))
    pdf = dm.select("_seg", "_docid", "ts").toPandas()
    for _, g in pdf.groupby("_seg"):
        ts = list(g.sort_values("_docid")["ts"])
        assert ts == sorted(ts, reverse=True)

    # rank identity vs the unsorted build for scoring + filter + sort paths
    eng_s = SearchEngine(InvertedIndex(spark, d))
    eng_u = SearchEngine(InvertedIndex(spark, index_dir))
    for q in [
        {"match": {"text": "error handling"}},
        {
            "bool": {
                "must": [{"match": {"text": "error"}}],
                "filter": [{"range": {"ts": {"gte": "2026-01-01 00:10:00"}}}],
            }
        },
    ]:
        a = [
            (r["conv_id"], r["turn_idx"], round(r["score"], 6))
            for r in eng_s.search(q, size=10).collect()
        ]
        b = [
            (r["conv_id"], r["turn_idx"], round(r["score"], 6))
            for r in eng_u.search(q, size=10).collect()
        ]
        assert a == b
    rows = eng_s.search({"match": {"text": "error handling"}}, size=10).collect()
    assert_rank_identical(rows, oracle.topk(oracle.match("error handling"), 10))


def test_index_sort_validated_and_resume_guarded(spark, tmp_path):
    """Bad sort fields fail fast on the driver; a resumed build refuses
    a changed index_sort (mixed-order segments would lie in plan.json)."""
    from opensearch_spark.index.builder import IndexConfig, build_index
    from opensearch_spark.transcripts import generate

    docs = generate(spark, 20, partitions=2)
    d = str(tmp_path / "guard_idx")
    with pytest.raises(ValueError, match="not in input schema"):
        build_index(spark, docs, d, IndexConfig(n_segments=2, index_sort=["tss"]))
    build_index(spark, docs, d, IndexConfig(n_segments=2))
    with pytest.raises(ValueError, match="index_sort changed"):
        build_index(
            spark, docs, d, IndexConfig(n_segments=2, index_sort=["ts"])
        )
    # explicit rebuild is the escape hatch
    shutil.rmtree(d)
    build_index(spark, docs, d, IndexConfig(n_segments=2, index_sort=["ts"]))
