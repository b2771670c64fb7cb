"""Crash-window recovery invariants: streaming batch append recovery
(data committed, manifest missing) and merge-of-merged docmap
propagation."""

from __future__ import annotations

import glob
import json
import os

import pytest
from pyspark.sql import functions as F

from opensearch_spark.index.builder import IndexConfig, build_index, _paths
from opensearch_spark.index.merge import merge_index
from opensearch_spark.index.reader import InvertedIndex
from opensearch_spark.query.executor import SearchEngine
from opensearch_spark.streaming import incremental as inc
from opensearch_spark.transcripts import generate


def _postings_rows(spark, idx):
    return spark.read.parquet(os.path.join(idx, "data", "_row=p")).count()


def test_append_batch_crash_window_recovery(spark, tmp_path):
    """A batch whose DATA committed but whose manifest write crashed must
    be recovered (manifest regenerated from the committed m-rows), NOT
    re-appended — re-appending would double df/tf and scores."""
    idx = str(tmp_path / "idx")
    docs = generate(spark, 60, partitions=2)
    cfg = IndexConfig(n_segments=4)
    inc.init_index_dir(spark, idx, cfg, docs.schema)
    assert inc.append_batch(spark, docs, idx, cfg, batch_id=0) is not None

    p = _paths(idx)
    rows_before = _postings_rows(spark, idx)
    with open(p["stats"]) as f:
        stats_before = json.load(f)

    # simulate the crash window: manifest gone, stats rolled back to the
    # pre-batch state (the batch's data + dictionary delta ARE committed)
    os.remove(os.path.join(p["manifests"], "batch-0000000000.json"))
    with open(p["stats"], "w") as f:
        json.dump({"n_docs": 0, "doc_count": 0, "sum_dl": 0, "avgdl": 0.0}, f)

    out = inc.append_batch(spark, docs, idx, cfg, batch_id=0)
    assert out is not None and out.get("recovered") is True

    # no duplicated postings, manifest restored, stats re-derived
    assert _postings_rows(spark, idx) == rows_before
    with open(p["stats"]) as f:
        stats_after = json.load(f)
    for k in ("n_docs", "doc_count", "sum_dl"):
        assert stats_after[k] == stats_before[k], k
    with open(os.path.join(p["manifests"], "batch-0000000000.json")) as f:
        man = json.load(f)
    assert man["status"] == "done" and man.get("recovered") is True

    # replay again (manifest now present): plain no-op
    assert inc.append_batch(spark, docs, idx, cfg, batch_id=0) is None
    assert _postings_rows(spark, idx) == rows_before


def test_append_batch_partial_commit_refused(spark, tmp_path):
    """Committer v1 renames per-file, so a crash mid job-commit can leave
    a PARTIAL segment set; recovery must refuse (PartialBatchError), not
    silently regenerate a manifest that drops the missing segments."""
    idx = str(tmp_path / "idx")
    docs = generate(spark, 60, partitions=2)
    cfg = IndexConfig(n_segments=4)
    inc.init_index_dir(spark, idx, cfg, docs.schema)
    assert inc.append_batch(spark, docs, idx, cfg, batch_id=0) is not None
    p = _paths(idx)
    os.remove(os.path.join(p["manifests"], "batch-0000000000.json"))
    # tamper the intent to expect one more segment than was committed —
    # equivalent to one segment's files missing after a partial rename
    ipath = inc._intent_path(p, 0)
    with open(ipath) as f:
        intent = json.load(f)
    intent["segments"] = sorted(set(intent["segments"]) | {9999})
    with open(ipath, "w") as f:
        json.dump(intent, f)
    with pytest.raises(inc.PartialBatchError):
        inc.append_batch(spark, docs, idx, cfg, batch_id=0)

    # second shape: data rows committed but NO manifest rows at all
    idx2 = str(tmp_path / "idx2")
    inc.init_index_dir(spark, idx2, cfg, docs.schema)
    inc.append_batch(spark, docs, idx2, cfg, batch_id=0)
    p2 = _paths(idx2)
    os.remove(os.path.join(p2["manifests"], "batch-0000000000.json"))
    import shutil

    shutil.rmtree(os.path.join(p2["data"], "_row=m"))
    with pytest.raises(inc.PartialBatchError):
        inc.append_batch(spark, docs, idx2, cfg, batch_id=0)


def test_append_batch_dictionary_delta_not_duplicated(spark, tmp_path):
    """Recovery must not re-append the dictionary delta when it was
    already committed (the _batch tag makes the check possible)."""
    idx = str(tmp_path / "idx")
    docs = generate(spark, 40, partitions=2)
    cfg = IndexConfig(n_segments=2)
    inc.init_index_dir(spark, idx, cfg, docs.schema)
    inc.append_batch(spark, docs, idx, cfg, batch_id=0)
    p = _paths(idx)
    d = spark.read.parquet(p["dictionary"])
    n_delta_rows = d.filter(F.col("_batch") == 0).count()
    os.remove(os.path.join(p["manifests"], "batch-0000000000.json"))
    inc.append_batch(spark, docs, idx, cfg, batch_id=0)  # recovery
    d2 = spark.read.parquet(p["dictionary"])
    assert d2.filter(F.col("_batch") == 0).count() == n_delta_rows


def test_merge_of_merged_index(spark, tmp_path):
    """Merging an already-merged index must resolve the docmap through
    the inherited plan pointer and stay rank-identical."""
    src = str(tmp_path / "src")
    m1 = str(tmp_path / "m1")
    m2 = str(tmp_path / "m2")
    docs = generate(spark, 120, partitions=4)
    build_index(spark, docs, src, IndexConfig(n_segments=4))
    q = {"match": {"text": "error handling"}}
    base = SearchEngine(InvertedIndex(spark, src)).search(q, size=10).collect()

    merge_index(spark, src, m1)
    merge_index(spark, m1, m2)  # second merge: docmap_dir must propagate
    out = SearchEngine(InvertedIndex(spark, m2)).search(q, size=10).collect()
    assert [(r["conv_id"], r["turn_idx"]) for r in base] == [
        (r["conv_id"], r["turn_idx"]) for r in out
    ]
    for a, b in zip(base, out):
        assert a["score"] == pytest.approx(b["score"], rel=1e-9)


def test_maybe_compact_trigger(spark, tmp_path):
    """Tiered-merge trigger: below thresholds -> no-op; above the
    delete-ratio threshold -> compaction runs and expunges."""
    from opensearch_spark.index import lifecycle
    from opensearch_spark.index.merge import maybe_compact

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    docs = generate(spark, 100, partitions=2)
    build_index(spark, docs, src, IndexConfig(n_segments=4))
    eng = SearchEngine(InvertedIndex(spark, src))

    assert maybe_compact(spark, src, dst) is None  # healthy index

    n = lifecycle.delete_by_query(eng, {"match": {"text": "error"}})
    assert n > 0
    out = maybe_compact(spark, src, dst, max_delete_ratio=0.0)
    assert out is not None and out["trigger"]["delete_ratio"] > 0.0
    # compacted index answers without tombstones and excludes deleted docs
    eng2 = SearchEngine(InvertedIndex(spark, dst))
    assert eng2.count({"match": {"text": "error"}}) == 0


def test_pruned_search_on_merged_index(spark, tmp_path):
    """The pruned path must work on a compacted index (merge layout has
    no _seg column -> one safe pseudo-segment) and stay rank-identical."""
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    docs = generate(spark, 150, partitions=4)
    build_index(spark, docs, src, IndexConfig(n_segments=4))
    merge_index(spark, src, dst)
    eng = SearchEngine(InvertedIndex(spark, dst))
    q = {"match": {"text": "the error"}}
    dense = eng.search(q, size=10, prune=False).collect()
    pruned = eng.search(q, size=10, prune=True).collect()
    assert [(r["conv_id"], r["turn_idx"]) for r in dense] == [
        (r["conv_id"], r["turn_idx"]) for r in pruned
    ]


def test_search_after_never_pruned(spark, tmp_path):
    """search_after pages must bypass the top-k prune (pruning discards
    docs below the first window's threshold)."""
    idx = str(tmp_path / "idx")
    docs = generate(spark, 200, partitions=4)
    build_index(spark, docs, idx, IndexConfig(n_segments=4))
    eng = SearchEngine(InvertedIndex(spark, idx))
    q = {"match": {"text": "error"}}
    full = eng.search(q, size=20, prune=False).collect()
    page1 = eng.search(q, size=10, prune=True).collect()
    last = page1[-1]
    page2 = eng.search(
        q, size=10, prune=True,
        search_after=(last["score"], last["conv_id"], last["turn_idx"]),
    ).collect()
    got = [(r["conv_id"], r["turn_idx"]) for r in page1 + page2]
    want = [(r["conv_id"], r["turn_idx"]) for r in full]
    assert got == want


def test_shingles_short_docs(spark):
    """Docs with fewer than n tokens must yield empty shingle sets, not
    a slice() crash; jaccard over such a corpus runs."""
    from opensearch_spark.ops import dedup

    df = spark.createDataFrame(
        [(0, "one"), (1, "two words"), (2, "a b c d e a b c d e")],
        "doc_id long, text string",
    )
    sh = dedup.shingle_sets(df).collect()
    assert {r["doc_id"] for r in sh} == {2}
    pairs = dedup.jaccard_pairs(df, threshold=0.5).collect()
    assert pairs == []


def test_datemath_leap_year():
    import datetime as dt

    from opensearch_spark.query import datemath as dm

    leap = dt.datetime(2024, 2, 29, 12, 0, 0)
    assert dm.resolve("now+1y", leap) == dt.datetime(2025, 2, 28, 12, 0, 0)
    assert dm.resolve("2024-02-29||+1y", None) == dt.datetime(2025, 2, 28)
