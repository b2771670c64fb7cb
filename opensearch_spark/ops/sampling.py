"""Deterministic sampling & domain-mixture ops for training-data
pipelines.

An LLM data pipeline needs reproducible subsetting long before it needs
randomness: train/val/test splits that never leak across reruns,
per-domain quotas ("temperature" mixing a la multilingual sampling),
stratified keep-rates, and fixed-size per-key samples.  All of these
are expressible as PURE Catalyst over a deterministic integer hash of
the row id — no RNG state, no seed files, rerunnable on any cluster
size with identical membership (the property `df.sample()` explicitly
does NOT have: Spark's sample is partition-layout dependent).

Hash: ``h(id) = ((id + salt) * 2654435761) mod 1_000_003`` (Knuth
multiplicative hashing; the prime modulus keeps the low bits mixed).
Exact in int64 for ``id + salt < ~3.4e9``; for wider id spaces pass
``hash_col=F.xxhash64(...)`` style overrides — the default stays
oracle-replayable in any SQL engine (the driver's DuckDB oracle runs
the same arithmetic).

Scale notes (100 TB): every op here is one groupBy/window shuffle over
the id/key columns only; quota computation touches a per-DOMAIN count
table (tiny, collected like term stats); membership predicates are
whole-stage-codegen integer math with no Python in the row path.
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

KNUTH = 2654435761
MOD = 1_000_003


def hash_col(id_col: str, salt: int = 0) -> Column:
    """The deterministic per-row hash in [0, MOD)."""
    return F.pmod((F.col(id_col) + F.lit(salt)) * F.lit(KNUTH), F.lit(MOD))


def hash_split(
    df: DataFrame, id_col: str, splits: Dict[str, float], salt: int = 0
) -> DataFrame:
    """Assign every row to a named split by hash threshold — the
    train/val/test splitter.  ``splits`` maps name -> weight (need not
    sum to 1; normalized).  Thresholds are INTEGER cut points of the
    hash range computed once driver-side, so membership is exact
    integer comparison (reproducible across engines and reruns).
    Adds a ``split`` string column."""
    total = float(sum(splits.values()))
    cuts = []
    acc = 0.0
    for name in sorted(splits):  # deterministic order
        acc += splits[name] / total
        cuts.append((name, min(MOD, int(math.floor(acc * MOD)))))
    cuts[-1] = (cuts[-1][0], MOD)  # close the range against rounding
    h = hash_col(id_col, salt)
    expr = None
    for name, cut in cuts:
        cond = h < F.lit(cut)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    return df.withColumn("split", expr)


def stratified_sample(
    df: DataFrame,
    key_col: str,
    id_col: str,
    fractions: Dict[str, float],
    default: float = 0.0,
    salt: int = 1,
) -> DataFrame:
    """Keep a deterministic per-stratum fraction of rows (exact-ish:
    the hash is uniform, membership is fixed).  ``fractions`` maps
    key value -> keep fraction; unlisted keys use ``default``.
    Thresholds are integers computed driver-side."""
    h = hash_col(id_col, salt)
    thr = F.lit(int(math.floor(default * MOD)))
    for k in sorted(fractions):
        thr = (
            F.when(F.col(key_col) == F.lit(k), F.lit(int(math.floor(fractions[k] * MOD))))
            .otherwise(thr)
        )
    return df.filter(h < thr)


def mixture_quotas(
    counts: Dict[str, int], alpha: float, target: int
) -> Dict[str, int]:
    """Integer per-domain quotas for temperature-``alpha`` mixing:
    quota_s proportional to n_s**alpha (alpha < 1 upweights rare
    domains — the multilingual/data-mixing rule), apportioned by
    largest remainder so quotas sum EXACTLY to
    ``min(target, sum(min(quota cap)))`` and never exceed a domain's
    row count.  alpha 0.5/1.0/2.0 use sqrt/identity/square (correctly
    rounded IEEE ops, bit-identical across engines); other alphas use
    ``pow``."""
    def _p(n: float) -> float:
        if alpha == 0.5:
            return math.sqrt(n)
        if alpha == 1.0:
            return float(n)
        if alpha == 2.0:
            return float(n) * float(n)
        return math.pow(float(n), alpha)

    keys = sorted(counts)
    denom = 0.0
    for k in keys:  # fixed summation order (keys asc)
        denom += _p(counts[k])
    raw = {k: target * _p(counts[k]) / denom for k in keys}
    base = {k: min(counts[k], int(math.floor(raw[k]))) for k in keys}
    rem = min(target, sum(counts.values())) - sum(base.values())
    # largest-remainder apportionment: +1 to the `rem` domains with the
    # biggest fractional part (ties by key asc), skipping saturated
    # domains.  When nothing saturates, rem <= #domains and one +1 pass
    # suffices — exactly the rule the SQL oracle replays; under
    # saturation the loop keeps filling non-saturated domains in the
    # same order until the target (or every domain) is exhausted.
    order = sorted(keys, key=lambda k: (-(raw[k] - math.floor(raw[k])), k))
    while rem > 0:
        progressed = False
        for k in order:
            if rem <= 0:
                break
            if base[k] < counts[k]:
                base[k] += 1
                rem -= 1
                progressed = True
        if not progressed:
            break
    return base


def mixture_sample(
    df: DataFrame,
    source_col: str,
    id_col: str,
    alpha: float,
    target: int,
    salt: int = 2,
    quotas: Optional[Dict[str, int]] = None,
) -> DataFrame:
    """Temperature-mixed deterministic subsample: per domain keep the
    ``quota_s`` rows with the SMALLEST hash (rank-based, so membership
    is exact integer comparison — no float thresholds in the row
    path).  Domain counts are collected driver-side (a tiny per-domain
    table, like term statistics); the row-path is one window over
    ``source_col``."""
    if quotas is None:
        counts = {
            r["k"]: r["n"]
            for r in df.groupBy(F.col(source_col).alias("k"))
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        quotas = mixture_quotas(counts, alpha, target)
    h = hash_col(id_col, salt)
    w = Window.partitionBy(source_col).orderBy(h.asc(), F.col(id_col).asc())
    qcol = F.lit(0)
    for k in sorted(quotas):
        qcol = F.when(F.col(source_col) == F.lit(k), F.lit(int(quotas[k]))).otherwise(qcol)
    return (
        df.withColumn("_mx_rn", F.row_number().over(w))
        .filter(F.col("_mx_rn") <= qcol)
        .drop("_mx_rn")
    )


def reservoir_per_key(
    df: DataFrame, key_col: str, id_col: str, k: int, salt: int = 3
) -> DataFrame:
    """Deterministic fixed-size uniform sample per key: the k rows with
    the smallest hash in each key group (uniform-without-replacement
    because the hash is uniform over ids; reproducible because it is a
    hash, not an RNG)."""
    h = hash_col(id_col, salt)
    w = Window.partitionBy(key_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.withColumn("_rs_rn", F.row_number().over(w))
        .filter(F.col("_rs_rn") <= F.lit(int(k)))
        .drop("_rs_rn")
    )
