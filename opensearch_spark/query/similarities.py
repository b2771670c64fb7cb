"""Per-field similarity modules beyond BM25.

The reference registers configurable similarities per field
(``index/similarity/SimilarityProviders.java``: ``BM25`` :274-281,
``boolean`` :287, ``LMDirichlet`` :380-387 (mu default 2000),
``LMJelinekMercer`` :395-403 (lambda default 0.1), ``DFI`` :343-352
(independence measures standardized/saturated/chisquared); wiring in
``index/similarity/SimilarityService.java:72-90``).  The Lucene scorers
they produce live in ``lucene/search/similarities/``:

- ``LMDirichletSimilarity``:  ``score = boost * (ln(1 + tf / (mu*p_c))
  + ln(mu / (dl + mu)))`` clamped at 0, with the collection model
  ``p_c = (ttf + 1) / (sumTotalTermFreq + 1)``
  (``LMSimilarity.DefaultCollectionModel``).
- ``LMJelinekMercerSimilarity``: ``score = boost * ln(1 +
  ((1-lambda) * tf / dl) / (lambda * p_c))`` clamped at 0.
- ``BooleanSimilarity``: score = boost, tf/norm-independent.
- ``DFISimilarity``: ``expected = (ttf+1) * dl / (sumTotalTermFreq+1)``;
  0 when ``tf <= expected`` else ``boost * log2(measure + 1)`` with the
  independence measures Standardized ``(tf-e)/sqrt(e)``, Saturated
  ``(tf-e)/e``, ChiSquared ``(tf-e)^2/e`` (``Independence*.java``).

Spark-first design: every similarity is a pure Catalyst column
expression over per-posting ``(tf, dl)`` plus ONE broadcast per-term
scalar (``tconst``) and engine-level constants — the scoring stays
inside whole-stage codegen exactly like the BM25 path, and each class
carries a numpy twin so the pure-Python oracle and WAND-style bound
checks cannot drift.  Per-term scores are computed in float64 and
narrowed to float32 (Lucene's SimScorer returns float), then summed in
float64 across clauses.

Scope (documented deviation): the engine applies the configured
similarity to the term/match scoring family (match, term, terms,
multi_match most/best over the default field path).  Positional
queries (phrase/span/intervals) and WAND pruning keep BM25 — WAND's
block-max bounds are derived from the BM25 formula, so the executor
disables pruning whenever a non-BM25 similarity is active.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

from opensearch_spark.query import bm25

_LN2 = math.log(2.0)


class Similarity:
    """Interface: one scalar per term + a codegen-able score column."""

    name = "?"
    is_bm25 = False

    def term_const(self, df: int, ttf: int, n: int, sum_dl: float) -> float:
        """The single per-term broadcast scalar this similarity needs."""
        raise NotImplementedError

    def score_col(self, tf: Column, tconst: Column, dl: Column) -> Column:
        """float32 per-(term, doc) score, JVM-side."""
        raise NotImplementedError

    def score_np(self, tf, tconst: float, dl) -> np.ndarray:
        """Numpy twin of score_col (oracle/tests)."""
        raise NotImplementedError


@dataclass
class BM25(Similarity):
    """Okapi BM25 (the default; SimilarityProviders.java:274-281)."""

    k1: float = bm25.K1
    b: float = bm25.B
    avgdl: float = 1.0
    name = "BM25"
    is_bm25 = True

    def term_const(self, df, ttf, n, sum_dl):
        return bm25.idf(int(df), int(n))

    def score_col(self, tf, tconst, dl):
        return bm25.term_score_col(tf, tconst, dl, self.avgdl, self.k1, self.b)

    def score_np(self, tf, tconst, dl):
        return bm25.term_score_np(tf, tconst, dl, self.avgdl, self.k1, self.b)


@dataclass
class LMDirichlet(Similarity):
    """LMDirichletSimilarity (mu default 2000, SimilarityProviders.java:380)."""

    mu: float = 2000.0
    name = "LMDirichlet"

    def term_const(self, df, ttf, n, sum_dl):
        # mu * p_c, with DefaultCollectionModel p_c = (ttf+1)/(sum_ttf+1)
        return self.mu * (float(ttf) + 1.0) / (float(sum_dl) + 1.0)

    def score_col(self, tf, tconst, dl):
        tf_d = tf.cast("double")
        dl_d = dl.cast("double")
        raw = F.log(F.lit(1.0) + tf_d / tconst) + F.log(
            F.lit(self.mu) / (dl_d + F.lit(self.mu))
        )
        return F.greatest(raw, F.lit(0.0)).cast("float")

    def score_np(self, tf, tconst, dl):
        tf = np.asarray(tf, dtype=np.float64)
        dl = np.asarray(dl, dtype=np.float64)
        raw = np.log(1.0 + tf / tconst) + np.log(self.mu / (dl + self.mu))
        return np.maximum(raw, 0.0).astype(np.float32)


@dataclass
class LMJelinekMercer(Similarity):
    """LMJelinekMercerSimilarity (lambda default 0.1,
    SimilarityProviders.java:395)."""

    lam: float = 0.1
    name = "LMJelinekMercer"

    def term_const(self, df, ttf, n, sum_dl):
        return (float(ttf) + 1.0) / (float(sum_dl) + 1.0)  # p_c

    def score_col(self, tf, tconst, dl):
        tf_d = tf.cast("double")
        dl_d = dl.cast("double")
        raw = F.log(
            F.lit(1.0)
            + (F.lit(1.0 - self.lam) * tf_d / dl_d) / (F.lit(self.lam) * tconst)
        )
        return F.greatest(raw, F.lit(0.0)).cast("float")

    def score_np(self, tf, tconst, dl):
        tf = np.asarray(tf, dtype=np.float64)
        dl = np.asarray(dl, dtype=np.float64)
        raw = np.log(1.0 + ((1.0 - self.lam) * tf / dl) / (self.lam * tconst))
        return np.maximum(raw, 0.0).astype(np.float32)


@dataclass
class Boolean(Similarity):
    """BooleanSimilarity: score = boost, norms/tf ignored
    (SimilarityProviders.java:287)."""

    name = "boolean"

    def term_const(self, df, ttf, n, sum_dl):
        return 1.0

    def score_col(self, tf, tconst, dl):
        return tconst.cast("float")

    def score_np(self, tf, tconst, dl):
        return np.full(np.shape(tf), np.float32(tconst), dtype=np.float32)


_MEASURES = ("standardized", "saturated", "chisquared")


@dataclass
class DFI(Similarity):
    """DFISimilarity with the three independence measures
    (SimilarityProviders.java:343-352)."""

    measure: str = "standardized"
    name = "DFI"

    def __post_init__(self):
        if self.measure not in _MEASURES:
            raise ValueError(f"independence_measure must be one of {_MEASURES}")

    def term_const(self, df, ttf, n, sum_dl):
        # expected = tconst * dl  with  tconst = (ttf+1)/(sum_ttf+1)
        return (float(ttf) + 1.0) / (float(sum_dl) + 1.0)

    def _measure_col(self, tf_d: Column, exp: Column) -> Column:
        if self.measure == "standardized":
            return (tf_d - exp) / F.sqrt(exp)
        if self.measure == "saturated":
            return (tf_d - exp) / exp
        return (tf_d - exp) * (tf_d - exp) / exp

    def score_col(self, tf, tconst, dl):
        tf_d = tf.cast("double")
        exp = tconst * dl.cast("double")
        m = self._measure_col(tf_d, exp)
        raw = F.when(tf_d <= exp, F.lit(0.0)).otherwise(
            F.log(m + F.lit(1.0)) / F.lit(_LN2)
        )
        return raw.cast("float")

    def score_np(self, tf, tconst, dl):
        tf = np.asarray(tf, dtype=np.float64)
        exp = tconst * np.asarray(dl, dtype=np.float64)
        if self.measure == "standardized":
            m = (tf - exp) / np.sqrt(exp)
        elif self.measure == "saturated":
            m = (tf - exp) / exp
        else:
            m = (tf - exp) ** 2 / exp
        out = np.where(tf <= exp, 0.0, np.log(m + 1.0) / _LN2)
        return out.astype(np.float32)


class Scripted(Similarity):
    """ScriptedSimilarity analog (``index/similarity/
    ScriptedSimilarity.java``): the user supplies a function of Catalyst
    columns + per-term stats returning the score column.  ``fn`` receives
    keyword args ``tf, dl, df, ttf`` (Columns) and ``n, sum_dl, avgdl``
    (floats) and must return a Column; it runs JVM-side like any other
    similarity as long as it sticks to pyspark.sql.functions."""

    name = "scripted"

    def __init__(self, fn):
        self.fn = fn
        self._stats = (0.0, 0.0, 1.0)  # n, sum_dl, avgdl (bound by engine)

    # scripted needs df and ttf separately: the engine broadcasts both
    # (score_col receives them as columns via the stats frame).
    def term_const(self, df, ttf, n, sum_dl):
        return float(df)  # unused; kept for interface shape

    def score_full_col(
        self, tf: Column, dl: Column, df: Column, ttf: Column,
        n: float, sum_dl: float, avgdl: float,
    ) -> Column:
        return self.fn(
            tf=tf.cast("double"), dl=dl.cast("double"),
            df=df.cast("double"), ttf=ttf.cast("double"),
            n=float(n), sum_dl=float(sum_dl), avgdl=float(avgdl),
        ).cast("float")


def from_spec(spec, avgdl: float = 1.0) -> Similarity:
    """Build a Similarity from a mapping-style settings dict
    (``{"type": "LMDirichlet", "mu": 500}`` — the shape
    SimilarityProviders.java parses from index settings)."""
    if isinstance(spec, Similarity):
        if isinstance(spec, BM25):
            spec.avgdl = avgdl
        return spec
    t = spec.get("type", "BM25")
    if t == "BM25":
        return BM25(
            k1=float(spec.get("k1", bm25.K1)),
            b=float(spec.get("b", bm25.B)),
            avgdl=avgdl,
        )
    if t == "LMDirichlet":
        return LMDirichlet(mu=float(spec.get("mu", 2000.0)))
    if t == "LMJelinekMercer":
        return LMJelinekMercer(lam=float(spec.get("lambda", 0.1)))
    if t == "boolean":
        return Boolean()
    if t == "DFI":
        return DFI(measure=spec.get("independence_measure", "standardized"))
    raise ValueError(f"unknown similarity type: {t!r}")
