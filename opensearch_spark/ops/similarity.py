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
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 11,
    dim: int = 64,
) -> DataFrame:
    """Random-hyperplane LSH near-dup candidate pairs, verified with
    exact cosine.  Sign sketch = ``nbits`` fixed random hyperplanes
    (seeded numpy, compiled to JVM literal arrays); candidates share the
    full sketch; verification keeps precision at 1.0."""
    rng = np.random.RandomState(seed)
    planes = rng.normal(size=(nbits, dim))
    v = corpus.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("_v")
    ).withColumn("_n", norm_col("_v"))
    sketch = F.lit(0).cast("long")
    for i in range(nbits):
        lit = F.array(*[F.lit(float(x)) for x in planes[i]])
        d = F.aggregate(
            F.zip_with(F.col("_v"), lit, lambda x, y: x * y),
            F.lit(0.0).cast("double"),
            lambda acc, x: acc + x,
        )
        sketch = sketch + F.when(d > 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long"))
    s = v.withColumn("sketch", sketch)
    a = s.select(F.col(id_col).alias("id_a"), F.col("_v").alias("va"), F.col("_n").alias("na"), "sketch")
    b = s.select(F.col(id_col).alias("id_b"), F.col("_v").alias("vb"), F.col("_n").alias("nb"), "sketch")
    cos = dot_col("va", "vb") / (F.col("na") * F.col("nb"))
    return (
        a.join(b, "sketch")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", F.round(cos.cast("double"), 6))
        .filter(F.col("cosine") >= F.lit(float(threshold)))
        .select("id_a", "id_b", "cosine")
    )
