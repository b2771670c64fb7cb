"""Similarity search over embedding columns (``array<float>``).

Baseline: brute-force cosine top-k — broadcast the (small) query set
against the corpus, dot products as JVM ``aggregate``/``zip_with``
expressions in float64 (whole-stage codegen; no Python in the hot path),
distributed top-k via window ``row_number``.

Scale paths for 100 TB / billions of vectors:
- **IVF**: partition the corpus by nearest coarse centroid; queries
  probe only ``nprobe`` partitions — turns a full scan into partition
  pruning on the centroid id.
- **Random-hyperplane LSH**: sign-bit sketches bucket near vectors
  together; candidate join on bucket, verify with exact cosine.

The reference models vectors as a field type (``KnnVectorFieldMapper``
in OpenSearch's k-NN surface); here they are first-class DataFrame
columns.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot_col(a: str, b: str) -> Column:
    """float64 dot product of two array columns (sequential fold, so the
    summation order is deterministic left-to-right)."""
    return F.aggregate(
        F.zip_with(F.col(a), F.col(b), lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )


def norm_col(a: str) -> Column:
    return F.sqrt(
        F.aggregate(
            F.col(a), F.lit(0.0).cast("double"), lambda acc, x: acc + x * x
        )
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact brute-force cosine top-k.

    ``queries`` is broadcast (it is small by construction), so the scan
    over the corpus is shuffle-free; the only shuffle is the final
    per-query top-k (``row_number`` window over ``query_id``).
    Returns ``(query_id, rank, vec_id, cosine)`` with deterministic
    tie-break on ``vec_id``.
    """
    c = corpus.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("_cv")
    ).withColumn("_cn", norm_col("_cv"))
    q = queries.select(
        F.col(query_id_col), F.col(vec_col).cast("array<double>").alias("_qv")
    ).withColumn("_qn", norm_col("_qv"))
    cos = (dot_col("_cv", "_qv") / (F.col("_cn") * F.col("_qn"))).cast("double")
    scored = c.crossJoin(F.broadcast(q)).withColumn(
        "cosine", F.round(cos, 6)
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("cosine"), F.asc(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "rank", id_col, "cosine")
    )


def _centroid_matrix(
    corpus: DataFrame,
    nlist: int,
    id_col: str,
    vec_col: str,
    sample_size: int = 4096,
    iters: int = 5,
) -> np.ndarray:
    """Coarse centroids via spherical k-means (Lloyd) on a bounded,
    DETERMINISTIC sample: vectors are hash-ordered (``xxhash64(id)``)
    so the same corpus always yields the same centroids, the sample is
    capped at ``sample_size`` regardless of corpus size (driver memory
    stays O(sample), not O(corpus)), and ``iters`` Lloyd rounds refine
    evenly-spaced seeds.  At 100 TB the centroids are computed once and
    persisted with the cell-partitioned layout (``write_ivf_index``);
    probing then prunes whole partitions."""
    sample_rows = (
        corpus.select(F.col(id_col), F.col(vec_col))
        .withColumn("_h", F.pmod(F.xxhash64(F.col(id_col)), F.lit(1_000_003)))
        .orderBy(F.asc("_h"), F.asc(id_col))
        .limit(int(sample_size))
        .select(vec_col)
        .collect()
    )
    x = np.array([list(r[0]) for r in sample_rows], dtype=np.float64)
    x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    n = x.shape[0]
    idx = np.linspace(0, max(0, n - 1), num=min(nlist, n)).astype(np.int64)
    c = x[idx].copy()
    if c.shape[0] < nlist:  # degenerate tiny corpus: pad by repetition
        reps = int(np.ceil(nlist / max(1, c.shape[0])))
        c = np.tile(c, (reps, 1))[:nlist]
    for _ in range(int(iters)):
        sims = x @ c.T
        assign = np.argmax(sims, axis=1)
        for j in range(nlist):
            members = x[assign == j]
            if members.shape[0] > 0:
                c[j] = members.mean(axis=0)
        c = c / np.maximum(np.linalg.norm(c, axis=1, keepdims=True), 1e-12)
    return c


def _cell_udf(cn: np.ndarray, topn: int):
    """Arrow-batched nearest-centroid assignment: one numpy matmul per
    batch against the broadcast centroid matrix."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<int>")
    def cells(vs: pd.Series) -> pd.Series:
        m = np.array(vs.tolist(), dtype=np.float64)
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        sims = m @ cn.T
        order = np.argsort(-sims, axis=1, kind="stable")[:, :topn]
        return pd.Series(list(order.astype(np.int32)))

    return cells


def assign_ivf_cells(
    corpus: DataFrame,
    nlist: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: Optional[np.ndarray] = None,
) -> DataFrame:
    """IVF coarse quantization: adds a ``cell`` column (nearest centroid
    index).  Writing the corpus partitioned by ``cell`` gives
    partition-pruned probes at query time (``write_ivf_index``)."""
    cn = (
        centroids
        if centroids is not None
        else _centroid_matrix(corpus, nlist, id_col, vec_col)
    )
    udf = _cell_udf(cn, 1)
    return corpus.withColumn(
        "cell", udf(F.col(vec_col).cast("array<double>")).getItem(0)
    )


def write_ivf_index(
    corpus: DataFrame,
    path: str,
    nlist: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Materialize the IVF layout: corpus parquet PARTITIONED BY cell
    plus the centroid matrix (``centroids.npy``) — the scale path where
    a probe reads only ``nprobe`` of ``nlist`` partition directories
    (Spark partition pruning on the ``cell`` filter; nothing else is
    even listed)."""
    import os

    cn = _centroid_matrix(corpus, nlist, id_col, vec_col)
    cells = assign_ivf_cells(corpus, nlist, id_col, vec_col, centroids=cn)
    cells.write.mode("overwrite").partitionBy("cell").parquet(
        os.path.join(path, "vectors")
    )
    np.save(os.path.join(path, "centroids.npy"), cn)
    return cn


def ivf_topk_indexed(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Probe a materialized IVF index: the ``cell IN probes`` filter is
    a partition-pruning predicate over the cell-partitioned parquet —
    only ``nprobe`` directories per query batch are scanned."""
    import os

    cn = np.load(os.path.join(path, "centroids.npy"))
    cells = spark.read.parquet(os.path.join(path, "vectors"))
    udf = _cell_udf(cn, nprobe)
    probe = queries.select(
        F.col(query_id_col),
        F.explode(udf(F.col(vec_col).cast("array<double>"))).alias("probe_cell"),
    )
    probe_ids = [
        int(r["probe_cell"]) for r in probe.select("probe_cell").distinct().collect()
    ]
    cand = cells.filter(F.col("cell").isin(probe_ids)).join(
        F.broadcast(probe), F.col("cell") == F.col("probe_cell")
    ).drop("probe_cell")
    return _brute_force_in(cand, queries, k, id_col, vec_col, query_id_col)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nlist: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: probe the ``nprobe`` nearest IVF cells per
    query, brute-force inside them.  Centroids are Lloyd-refined once
    and shared by the corpus assignment and the query probes."""
    cn = _centroid_matrix(corpus, nlist, id_col, vec_col)
    cells = assign_ivf_cells(corpus, nlist, id_col, vec_col, centroids=cn)
    udf = _cell_udf(cn, nprobe)
    probe = queries.select(
        F.col(query_id_col),
        F.explode(udf(F.col(vec_col).cast("array<double>"))).alias("probe_cell"),
    )
    cand = cells.join(
        F.broadcast(probe), cells["cell"] == probe["probe_cell"]
    ).drop("probe_cell")
    return _brute_force_in(cand, queries, k, id_col, vec_col, query_id_col)


def _brute_force_in(
    cand: DataFrame, queries: DataFrame, k: int, id_col, vec_col, query_id_col
) -> DataFrame:
    """Exact cosine top-k restricted to pre-probed candidates (the
    shared tail of the IVF paths)."""
    q = queries.select(
        F.col(query_id_col).alias("_qid"),
        F.col(vec_col).cast("array<double>").alias("_qv"),
    ).withColumn("_qn", norm_col("_qv"))
    cand = cand.withColumn("_v", F.col(vec_col).cast("array<double>")).withColumn(
        "_n", norm_col("_v")
    )
    scored = cand.join(
        F.broadcast(q), cand[query_id_col] == q["_qid"]
    ).withColumn(
        "cosine",
        F.round((dot_col("_v", "_qv") / (F.col("_n") * F.col("_qn"))).cast("double"), 6),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "rank", id_col, "cosine")
    )


def hyperplane_lsh_pairs(
    corpus: DataFrame,
    nbits: int = 16,
    bands: int = 4,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 11,
    dim: int = 64,
) -> DataFrame:
    """BANDED random-hyperplane LSH near-dup pairs, verified with exact
    cosine.  Sign sketch = ``nbits`` fixed random hyperplanes (seeded
    numpy, compiled to JVM literal arrays), split into ``bands`` bands
    of ``nbits // bands`` bits; candidates = pairs agreeing on ANY one
    band (hash join on ``(band, bucket)``, union over bands via
    explode + distinct), then exact-cosine verification keeps precision
    at 1.0.

    Banding sets the recall S-curve ``1 - (1 - p^r)^b`` with
    ``p = 1 - theta/pi``: at cosine 0.9 (p ≈ 0.856), full-16-bit sketch
    equality gives p^16 ≈ 8% recall, while 4 bands of 4 bits give
    ``1 - (1 - 0.537)^4`` ≈ 95% — measured on the sf0.001 fixture
    embeddings with planted near-dups (``planted_neardup_corpus``,
    cosines 0.879-0.949): banded recall **0.95** vs **0.15** for the
    full-sketch join, against the brute-force ``embedding_dup_pairs``
    oracle at threshold 0.85 (see ``tests/test_similarity_recall.py``
    and the approx_suite ``lsh_recall`` row).  Verification joins the
    small candidate set back to the vectors on the id keys — never a
    vector-vector product."""
    if nbits % bands:
        raise ValueError("nbits must be divisible by bands")
    r = nbits // bands
    rng = np.random.RandomState(seed)
    planes = rng.normal(size=(nbits, dim))
    v = corpus.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("_v")
    ).withColumn("_n", norm_col("_v"))
    bits = []
    for i in range(nbits):
        lit = F.array(*[F.lit(float(x)) for x in planes[i]])
        d = F.aggregate(
            F.zip_with(F.col("_v"), lit, lambda x, y: x * y),
            F.lit(0.0).cast("double"),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(d > 0, F.lit(1 << (i % r)).cast("long")).otherwise(F.lit(0).cast("long")))
    band_keys = F.array(
        *[
            F.struct(
                F.lit(bi).alias("band"),
                sum(bits[bi * r : (bi + 1) * r], F.lit(0).cast("long")).alias("bucket"),
            )
            for bi in range(bands)
        ]
    )
    s = v.withColumn("_bk", F.explode(band_keys)).select(
        id_col, F.col("_bk.band").alias("band"), F.col("_bk.bucket").alias("bucket")
    )
    a = s.select(F.col(id_col).alias("id_a"), "band", "bucket")
    b = s.select(F.col(id_col).alias("id_b"), "band", "bucket")
    cands = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    va = v.select(F.col(id_col).alias("id_a"), F.col("_v").alias("va"), F.col("_n").alias("na"))
    vb = v.select(F.col(id_col).alias("id_b"), F.col("_v").alias("vb"), F.col("_n").alias("nb"))
    cos = dot_col("va", "vb") / (F.col("na") * F.col("nb"))
    return (
        cands.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("cosine", F.round(cos.cast("double"), 6))
        .filter(F.col("cosine") >= F.lit(float(threshold)))
        .select("id_a", "id_b", "cosine")
    )


# --------------------------------------------------- recall evaluation

def planted_neardup_corpus(
    emb: DataFrame,
    n_plant: int = 40,
    alpha: float = 0.9,
    beta: float = 0.436,
    id_offset: int = 100_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministically augment a corpus with planted near-duplicates
    for recall evaluation: for each of the first ``n_plant`` ids, add
    ``v' = alpha*v + beta*reverse(v)`` under ``id + id_offset``.  Since
    ``reverse(v)`` has the same norm as ``v`` and is near-orthogonal for
    random-ish vectors, ``cos(v, v') ≈ alpha / sqrt(alpha² + beta²)``
    (≈0.9 at the defaults) with natural spread from the actual
    ``v·reverse(v)`` term — pure Catalyst, no RNG at plan time."""
    base = emb.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias(vec_col))
    planted = base.filter(F.col(id_col) < n_plant).select(
        (F.col(id_col) + F.lit(id_offset)).alias(id_col),
        F.zip_with(
            F.col(vec_col),
            F.reverse(F.col(vec_col)),
            lambda x, y: F.lit(float(alpha)) * x + F.lit(float(beta)) * y,
        ).alias(vec_col),
    )
    return base.unionByName(planted)


def pair_recall(truth: DataFrame, got: DataFrame) -> DataFrame:
    """One-row ``(n_truth, n_hit, recall)`` of candidate-pair recall:
    the fraction of ``truth`` pairs (id_a, id_b) also present in
    ``got``.  Both inputs are (id_a, id_b[, ...]) with id_a < id_b."""
    t = truth.select("id_a", "id_b")
    g = got.select("id_a", "id_b").withColumn("_hit", F.lit(1))
    j = t.join(g, ["id_a", "id_b"], "left")
    return j.agg(
        F.count(F.lit(1)).alias("n_truth"),
        F.sum(F.coalesce("_hit", F.lit(0))).cast("long").alias("n_hit"),
        F.round(
            F.sum(F.coalesce("_hit", F.lit(0)))
            / F.greatest(F.count(F.lit(1)), F.lit(1)),
            6,
        ).alias("recall"),
    )


def topk_recall(
    exact: DataFrame,
    approx: DataFrame,
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """One-row ``(n_truth, n_hit, recall)`` recall@k of an approximate
    top-k result vs the exact brute-force one: the fraction of exact
    (query_id, vec_id) result pairs the approximate result returned
    (standard ANN recall@k, averaged over queries by pooling)."""
    t = exact.select(query_id_col, id_col)
    g = approx.select(query_id_col, id_col).withColumn("_hit", F.lit(1))
    j = t.join(g, [query_id_col, id_col], "left")
    return j.agg(
        F.count(F.lit(1)).alias("n_truth"),
        F.sum(F.coalesce("_hit", F.lit(0))).cast("long").alias("n_hit"),
        F.round(
            F.sum(F.coalesce("_hit", F.lit(0)))
            / F.greatest(F.count(F.lit(1)), F.lit(1)),
            6,
        ).alias("recall"),
    )
