"""Similarity search: brute-force oracle, Lloyd-IVF recall, and the
partition-pruned materialized IVF layout."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from opensearch_spark.ops import similarity

N_VEC, DIM = 400, 16


@pytest.fixture(scope="module")
def vectors(spark):
    rng = np.random.RandomState(3)
    # clustered data so IVF cells are meaningful
    centers = rng.normal(size=(8, DIM)) * 3
    rows = []
    for i in range(N_VEC):
        v = centers[i % 8] + rng.normal(size=DIM)
        rows.append((i, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _numpy_topk(df_rows, qids, k):
    m = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in df_rows}
    out = {}
    for qid in qids:
        qv = m[qid]
        sims = []
        for vid, v in m.items():
            c = float(v @ qv / (np.linalg.norm(v) * np.linalg.norm(qv)))
            sims.append((round(c, 6), -vid, vid))
        sims.sort(reverse=True)
        out[qid] = [vid for _, _, vid in sims[:k]]
    return out


def test_cosine_topk_matches_numpy(spark, vectors):
    q = vectors.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = similarity.cosine_topk(vectors, q, k=5).collect()
    want = _numpy_topk(vectors.collect(), [0, 1, 2], 5)
    for qid in (0, 1, 2):
        ids = [r["vec_id"] for r in got if r["query_id"] == qid]
        assert ids == want[qid], qid


def test_ivf_lloyd_recall(spark, vectors):
    """Lloyd-refined IVF with nprobe=4/16 must recover most of the true
    top-5 on clustered data (recall >= 0.8 over 5 queries)."""
    q = vectors.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = _numpy_topk(vectors.collect(), list(range(5)), 5)
    approx = similarity.ivf_topk(vectors, q, k=5, nlist=16, nprobe=4).collect()
    hits = total = 0
    for qid in range(5):
        got = {r["vec_id"] for r in approx if r["query_id"] == qid}
        hits += len(got & set(exact[qid]))
        total += 5
    assert hits / total >= 0.8, f"recall {hits}/{total}"


def test_ivf_indexed_partition_pruning(spark, vectors, tmp_path):
    """The materialized cell-partitioned layout: probing reads only the
    probed cells (partition-pruning filter visible in the plan) and
    returns the same results as the on-the-fly IVF path."""
    path = str(tmp_path / "ivf")
    similarity.write_ivf_index(vectors, path, nlist=16)
    q = vectors.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    onfly = similarity.ivf_topk(vectors, q, k=5, nlist=16, nprobe=4).collect()
    indexed_df = similarity.ivf_topk_indexed(spark, path, q, k=5, nprobe=4)
    indexed = indexed_df.collect()
    assert sorted((r["query_id"], r["rank"], r["vec_id"]) for r in onfly) == sorted(
        (r["query_id"], r["rank"], r["vec_id"]) for r in indexed
    )
    plan = indexed_df._jdf.queryExecution().executedPlan().toString()
    assert "cell" in plan  # the cell filter reaches the scan


def test_dup_clusters_components(spark):
    """Connected components over pair lists: chains merge transitively
    (including a 41-node chain in 10 rounds — the label-shortcutting
    doubling, not one-hop propagation), the canonical label is the
    component min, and nodes absent from any pair do not appear
    (singletons are implicit survivors)."""
    from opensearch_spark.ops.dedup import dup_clusters

    long_chain = [(100 + i, 100 + i + 1) for i in range(40)]  # 41-node chain
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4),          # chain -> one component {1,2,3,4}
         (10, 11), (10, 12),              # star  -> {10,11,12}
         (20, 21)]                        # pair  -> {20,21}
        + long_chain,                     # pointer jumping: > max_iters hops
        "id_a long, id_b long",
    )
    got = {(r["doc_id"], r["canon"]) for r in dup_clusters(pairs, max_iters=10).collect()}
    expect = {
        (1, 1), (2, 1), (3, 1), (4, 1),
        (10, 10), (11, 10), (12, 10),
        (20, 20), (21, 20),
    } | {(100 + i, 100) for i in range(41)}
    assert got == expect


def test_minhash_index_incremental(spark, tmp_path):
    """Persisted MinHash index: a new batch's exact clones hit their
    indexed originals at est_jaccard 1.0, fresh docs produce no
    high-threshold hits, and append=True makes a later batch dedup
    against the earlier one."""
    import os

    from pyspark.sql import functions as F

    from opensearch_spark.ops.dedup import probe_minhash_index, write_minhash_index

    sf = "/root/testdata/sf0.001"
    if not os.path.isdir(sf):
        import pytest as _pytest

        _pytest.skip("driver testdata absent")
    docs = spark.read.parquet(os.path.join(sf, "documents.parquet"))
    base = docs.filter(F.col("doc_id") < 450)
    idx = str(tmp_path / "mh_index")
    write_minhash_index(base, idx)

    clones = (
        base.filter(F.col("doc_id") < 5)
        .withColumn("doc_id", F.col("doc_id") + F.lit(10_000))
    )
    fresh = docs.filter(F.col("doc_id") >= 450)
    batch1 = clones.unionByName(fresh)
    hits = probe_minhash_index(spark, idx, batch1, threshold=0.9, append=True)
    got = {(r["new_id"], r["indexed_id"]): r["est_jaccard"] for r in hits.collect()}
    for i in range(5):
        assert got.get((10_000 + i, i)) == 1.0, got
    assert all(nid < 10_005 for nid, _ in got), "fresh docs should not near-dup"

    # a second batch cloning batch-1's fresh docs must hit the APPENDED rows
    batch2 = fresh.filter(F.col("doc_id") < 455).withColumn(
        "doc_id", F.col("doc_id") + F.lit(20_000)
    )
    hits2 = {
        (r["new_id"], r["indexed_id"])
        for r in probe_minhash_index(spark, idx, batch2, threshold=0.9).collect()
    }
    for i in range(450, 455):
        assert (20_000 + i, i) in hits2, hits2
