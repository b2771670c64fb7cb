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
    corpus: DataFrame, nlist: int, id_col: str, vec_col: str
) -> np.ndarray:
    """Deterministic coarse centroids: the first ``nlist`` corpus vectors
    by id, L2-normalized.  (At scale you would run a few Lloyd
    iterations over a sample; the assignment plan below is identical.)"""
    rows = (
        corpus.orderBy(F.asc(id_col)).limit(nlist).select(vec_col).collect()
    )
    c = np.array([list(r[0]) for r in rows], dtype=np.float64)
    return c / np.maximum(np.linalg.norm(c, axis=1, keepdims=True), 1e-12)


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
) -> DataFrame:
    """IVF coarse quantization: adds a ``cell`` column (nearest centroid
    index).  Writing the corpus partitioned by ``cell`` gives
    partition-pruned probes at query time."""
    cn = _centroid_matrix(corpus, nlist, id_col, vec_col)
    udf = _cell_udf(cn, 1)
    return corpus.withColumn(
        "cell", udf(F.col(vec_col).cast("array<double>")).getItem(0)
    )


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
    query, brute-force inside them.  Shuffle-light: the probed subset
    is filtered before any scoring."""
    cells = assign_ivf_cells(corpus, nlist, id_col, vec_col)
    # per-query probe list: the nprobe nearest centroids by cosine
    probe = (
        _query_probe_cells(corpus, queries, nlist, nprobe, id_col, vec_col, query_id_col)
    )
    cand = cells.join(
        F.broadcast(probe), cells["cell"] == probe["probe_cell"]
    ).drop("probe_cell")
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


def _query_probe_cells(
    corpus, queries, nlist, nprobe, id_col, vec_col, query_id_col
) -> DataFrame:
    cn = _centroid_matrix(corpus, nlist, id_col, vec_col)
    udf = _cell_udf(cn, nprobe)
    return queries.select(
        F.col(query_id_col),
        F.explode(udf(F.col(vec_col).cast("array<double>"))).alias("probe_cell"),
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
