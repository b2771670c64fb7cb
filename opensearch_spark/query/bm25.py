"""Okapi BM25 scoring, Lucene-9-compatible (SURVEY.md §4.6).

Reference defaults: ``LegacyBM25Similarity(k1=1.2, b=0.75)``
(``server/src/main/java/org/opensearch/index/similarity/SimilarityProviders.java:274-281``,
``SimilarityService.java:72``).  Effective Lucene 9 formula:

    idf    = ln(1 + (N - df + 0.5) / (df + 0.5))
    score  = idf * (k1 + 1) * tf / (tf + k1 * (1 - b + b * dl / avgdl))

with ``dl`` the SmallFloat-byte4-quantized field length and
``avgdl = sumTotalTermFreq / docCount`` from **global** corpus stats (our
single-postings-table design gives DFS_QUERY_THEN_FETCH semantics for
free, SURVEY.md §3.1).  Per-term scores are computed in float64 and
rounded to float32 — the same double-compute-then-narrow Lucene does —
then summed across terms in float64.

The norm decode is a 256-entry literal array evaluated JVM-side
(``element_at``), so scoring stays inside whole-stage codegen: no Python
in the per-posting hot path.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

from opensearch_spark.analysis import smallfloat as sfl

K1 = 1.2
B = 0.75


def idf(df: int, doc_count: int) -> float:
    """Lucene-9 BM25 idf on global stats (float64)."""
    return math.log(1.0 + (doc_count - df + 0.5) / (df + 0.5))


def norm_decode_col(norm_byte: Column) -> Column:
    """Quantized doc length from the 1-byte norm, via a JVM-side literal
    lookup table (element_at is 1-indexed)."""
    table = F.array(*[F.lit(int(v)) for v in sfl.DECODE_TABLE])
    return F.element_at(table, norm_byte + 1)


def term_score_col(
    tf: Column,
    idf_col: Column,
    dl: Column,
    avgdl: float,
    k1: float = K1,
    b: float = B,
) -> Column:
    """Per-(term, doc) BM25 score, float64 math narrowed to float32."""
    tf_d = tf.cast("double")
    denom = tf_d + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * dl.cast("double") / F.lit(float(avgdl))
    )
    return (idf_col * F.lit(k1 + 1.0) * tf_d / denom).cast("float")


def term_score_np(
    tf: np.ndarray, idf_val: float, dl: np.ndarray, avgdl: float,
    k1: float = K1, b: float = B,
) -> np.ndarray:
    """Numpy twin of term_score_col (used by WAND bounds + the oracle)."""
    tf = np.asarray(tf, dtype=np.float64)
    dl = np.asarray(dl, dtype=np.float64)
    denom = tf + k1 * (1.0 - b + b * dl / avgdl)
    return (idf_val * (k1 + 1.0) * tf / denom).astype(np.float32)


def block_max_score(
    max_tf: np.ndarray, idf_val: float, min_dl: np.ndarray, avgdl: float,
    k1: float = K1, b: float = B,
) -> np.ndarray:
    """Upper bound of any score inside a block (block-max WAND metadata):
    monotonically increasing in tf, decreasing in dl, so (max_tf, min_dl)
    bounds the block (SURVEY.md §4.4)."""
    return term_score_np(max_tf, idf_val, min_dl, avgdl, k1, b)
