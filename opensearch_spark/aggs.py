"""Aggregation framework — the reference's agg tree re-expressed as
native Spark aggregations (SURVEY.md §2.3-2.5).

Every function takes a (possibly query-filtered) DataFrame — the agg
context the reference evaluates per shard and reduces on the
coordinator; Spark's partial/final hash aggregation is exactly that
split (``SearchPhaseController.reducedQueryPhase``,
``InternalAggregation.reduce``), so each helper is a thin, semantics-
preserving mapping:

- bucket aggs return ``(key, doc_count, ...)`` rows ordered like the
  reference's bucket ordering (count desc, key asc for ``terms``);
- metric aggs return one row of named metric columns;
- pipeline aggs are window functions over the bucket series (they run
  in the reference's reduce phase — coordinator-side — which is
  precisely a window over the materialized buckets).

Exactness notes vs the reference, preserved deliberately:
- ``terms`` here is EXACT (Spark global agg) where the reference's
  per-shard top-N is approximate with ``doc_count_error_upper_bound``
  (``TermsAggregatorFactory.java:112-123``) — superset semantics.
- ``cardinality(exact=False)`` uses Spark's HLL++ — same sketch family
  as the reference (``HyperLogLogPlusPlus.java:70``, precision 14 ~
  rsd 0.01); exact=True gives the verifiable count.
- ``percentiles(exact=True)`` interpolates like numpy/SQL
  ``quantile_cont``; the reference's t-digest is approximate
  (``AbstractTDigestPercentilesAggregator.java``) — we expose
  ``exact=False`` -> ``percentile_approx`` as the scale path.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# ------------------------------------------------------------- bucket


def terms(
    df: DataFrame,
    field: str,
    size: int = 10,
    order_by_key: bool = False,
    min_doc_count: int = 1,
    missing=None,
) -> DataFrame:
    """``terms`` bucket agg (``TermsAggregationBuilder.java:81-86``):
    top ``size`` buckets by doc count desc, key asc tie-break (the
    reference's default ordering).

    ``min_doc_count`` (default 1, the reference's) drops buckets below
    the threshold AFTER counting; ``missing`` substitutes a bucket key
    for docs without the field (ValuesSourceAggregationBuilder
    ``missing``), and when unset such docs are simply not bucketed —
    both exactly the reference's semantics."""
    key = F.col(field)
    if missing is not None:
        key = F.coalesce(key, F.lit(missing))
    else:
        df = df.filter(F.col(field).isNotNull())
    out = df.groupBy(key.alias("key")).agg(
        F.count(F.lit(1)).alias("doc_count")
    )
    if min_doc_count > 1:
        out = out.filter(F.col("doc_count") >= int(min_doc_count))
    if order_by_key:
        return out.orderBy(F.asc("key")).limit(size)
    return out.orderBy(F.desc("doc_count"), F.asc("key")).limit(size)


def terms_tree(
    df: DataFrame,
    field: str,
    metrics: Dict[str, Column],
    size: int = 10,
    order: Optional[Sequence[Tuple[str, bool]]] = None,
) -> DataFrame:
    """Aggregation TREE: a ``terms`` bucket agg with nested metric
    sub-aggregations computed in the same grouped pass (the reference's
    agg-tree = sub-aggs collected per bucket, SURVEY.md §2.4; Spark's
    one groupBy with many aggregate expressions is the partial+final
    reduce of the whole tree at once).

    ``order`` is the reference's ``BucketOrder`` (TermsAggregationBuilder
    ``order`` param / BucketOrder.java:63-116): a compound list of
    ``(path, asc)`` where path is ``"_count"``, ``"_key"`` or a
    sub-aggregation name from ``metrics`` (dotted ``agg.metric`` paths
    arrive here already flattened to the output alias).  A ``key asc``
    tie-breaker is appended automatically, exactly as
    TermsAggregationBuilder.java:138 does.  Default: count desc.

    Scale note: ordering by a sub-aggregation forces the full bucket
    set to be aggregated before top-``size`` selection — the same
    cost the reference pays (order-by-agg disables its shard_size
    short-circuit and makes doc_count_error unbounded); Spark compiles
    the orderBy+limit into TakeOrderedAndProject after the hash
    aggregate, so no global sort materializes."""
    aggs_ = [F.count(F.lit(1)).alias("doc_count")] + [
        expr.alias(name) for name, expr in metrics.items()
    ]
    if order is None:
        order = [("_count", False)]
    sort_cols = []
    for path, asc in order:
        name = {"_count": "doc_count", "_key": "key"}.get(path, path)
        if name != "key" and name != "doc_count" and name not in metrics:
            raise ValueError(f"order path {path!r} is not a sub-aggregation")
        sort_cols.append(F.asc(name) if asc else F.desc(name))
    sort_cols.append(F.asc("key"))
    return (
        df.groupBy(F.col(field).alias("key"))
        .agg(*aggs_)
        .orderBy(*sort_cols)
        .limit(size)
    )


def multi_terms(df: DataFrame, fields: Sequence[str], size: int = 10) -> DataFrame:
    """``multi_terms``: buckets keyed by a field tuple."""
    keys = [F.col(f).alias(f"key_{f}") for f in fields]
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("doc_count"))
        .orderBy(F.desc("doc_count"), *[F.asc(f"key_{f}") for f in fields])
        .limit(size)
    )


def terms_shard_model(
    df: DataFrame,
    field: str,
    shard_col: str,
    size: int = 10,
    shard_size: Optional[int] = None,
    n_shards: int = 8,
) -> Tuple[DataFrame, DataFrame]:
    """The reference's ACTUAL distributed ``terms`` agg — the two-phase
    shard model with its error accounting (``TermsAggregator.java``
    per-shard top ``shard_size``; merge + error bounds
    ``InternalTerms.java reduce``; ``shard_size`` default
    ``size * 1.5 + 10`` from ``TermsAggregatorFactory.java:112-123``):

    - phase 1: each shard (here ``pmod(shard_col, n_shards)`` — a
      deterministic stand-in for the reference's routing hash) returns
      its local top ``shard_size`` buckets by (count desc, key asc);
    - a shard's error contribution is the doc_count of its LAST
      returned bucket when it had more buckets than ``shard_size``
      (anything unreturned is bounded by it), else 0;
    - phase 2 merges returned buckets by key; a merged bucket's
      ``doc_count_error`` is the sum of error contributions of shards
      that did NOT return it (its count from those shards is unknown
      but bounded); the agg-level ``doc_count_error_upper_bound`` is
      the sum over ALL shards;
    - ``sum_other_doc_count`` = docs not covered by the final buckets:
      per-shard unreturned remainders + merged buckets trimmed by the
      final ``size`` cut.

    The default :func:`terms` stays EXACT (Spark's global agg makes the
    one-phase answer free — superset semantics); this op exists for
    semantics parity and because at 100 TB the per-shard-top-N +
    error-bound contract is what a reference user actually consumes.
    Everything here is Catalyst over the pre-aggregated (shard, key)
    frame — the raw table is touched once.

    Returns ``(buckets, meta)``: buckets ``(key, doc_count,
    doc_count_error)`` top ``size``; meta one row
    ``(doc_count_error_upper_bound, sum_other_doc_count)``.
    """
    if shard_size is None:
        shard_size = int(size * 1.5 + 10)
    per = (
        df.select(
            F.pmod(F.col(shard_col), F.lit(n_shards)).alias("shard"),
            F.col(field).cast("string").alias("key"),
        )
        .groupBy("shard", "key")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("shard").orderBy(F.desc("cnt"), F.asc("key"))
    # the ranked (shard, key, cnt) frame is tiny (distinct keys x
    # shards) but feeds every downstream branch — materialize it once
    # so the 100 TB raw scan happens exactly once, not per branch
    ranked = per.withColumn("rn", F.row_number().over(w)).localCheckpoint(eager=False)
    in_top = F.col("rn") <= F.lit(shard_size)
    sstats = (
        ranked.groupBy("shard")
        .agg(
            F.sum("cnt").alias("total"),
            F.sum(F.when(in_top, F.col("cnt")).otherwise(F.lit(0))).alias("ret_sum"),
            F.count(F.lit(1)).alias("n_buckets"),
            F.min(F.when(in_top, F.col("cnt"))).alias("last_cnt"),
        )
        .withColumn(
            "err",
            F.when(
                F.col("n_buckets") > F.lit(shard_size), F.col("last_cnt")
            ).otherwise(F.lit(0)),
        )
        .withColumn("other", F.col("total") - F.col("ret_sum"))
    )
    tot = sstats.agg(
        F.sum("err").alias("total_err"), F.sum("other").alias("shard_other")
    )
    merged = (
        ranked.filter(in_top)
        .join(sstats.select("shard", "err"), "shard")
        .groupBy("key")
        .agg(
            F.sum("cnt").alias("doc_count"),
            F.sum("err").alias("err_covered"),
        )
        .localCheckpoint(eager=False)  # feeds buckets, mtot and ttot
    )
    buckets = (
        merged.crossJoin(F.broadcast(tot))
        .withColumn("doc_count_error", F.col("total_err") - F.col("err_covered"))
        .orderBy(F.desc("doc_count"), F.asc("key"))
        .limit(size)
        .select("key", "doc_count", "doc_count_error")
    )
    mtot = merged.agg(F.sum("doc_count").alias("merged_sum"))
    ttot = (
        merged.orderBy(F.desc("doc_count"), F.asc("key"))
        .limit(size)
        .agg(F.sum("doc_count").alias("top_sum"))
    )
    meta = (
        tot.crossJoin(F.broadcast(mtot))
        .crossJoin(F.broadcast(ttot))
        .select(
            F.col("total_err").alias("doc_count_error_upper_bound"),
            (F.col("shard_other") + F.col("merged_sum") - F.col("top_sum")).alias(
                "sum_other_doc_count"
            ),
        )
    )
    return buckets, meta


def rare_terms(df: DataFrame, field: str, max_doc_count: int = 1) -> DataFrame:
    """``rare_terms`` (``RareTermsAggregationBuilder.java``): buckets with
    doc_count <= threshold, key asc."""
    return (
        df.groupBy(F.col(field).alias("key"))
        .agg(F.count(F.lit(1)).alias("doc_count"))
        .filter(F.col("doc_count") <= max_doc_count)
        .orderBy(F.asc("key"))
    )


def histogram(df: DataFrame, field: str, interval: float) -> DataFrame:
    """``histogram``: fixed-interval numeric buckets
    (``HistogramAggregationBuilder.java``); key = floor(v/i)*i."""
    key = (F.floor(F.col(field) / F.lit(interval)) * F.lit(interval)).cast("double")
    return (
        df.groupBy(key.alias("key"))
        .agg(F.count(F.lit(1)).alias("doc_count"))
        .orderBy(F.asc("key"))
    )


def date_histogram(
    df: DataFrame, field: str, calendar_interval: str = "day"
) -> DataFrame:
    """``date_histogram`` with a calendar interval
    (``DateHistogramAggregator.java``); bucket key as ISO string for
    engine-neutral comparison."""
    key = F.date_format(F.date_trunc(calendar_interval, F.col(field)), "yyyy-MM-dd HH:mm:ss")
    return (
        df.groupBy(key.alias("key"))
        .agg(F.count(F.lit(1)).alias("doc_count"))
        .orderBy(F.asc("key"))
    )


def range_agg(
    df: DataFrame, field: str, ranges: Sequence[Tuple[Optional[float], Optional[float]]]
) -> DataFrame:
    """``range`` agg (``RangeAggregationBuilder.java``): [from, to)
    buckets, docs can only land in one bucket per range entry; emits one
    row per range in definition order with its doc_count (empty ranges
    included, count 0 — reference keeps empty range buckets)."""
    aggs = []
    keys = []
    for lo, hi in ranges:
        cond = F.lit(True)
        if lo is not None:
            cond = cond & (F.col(field) >= F.lit(lo))
        if hi is not None:
            cond = cond & (F.col(field) < F.lit(hi))
        key = f"{lo if lo is not None else '*'}-{hi if hi is not None else '*'}"
        keys.append(key)
        aggs.append(F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(key))
    row = df.agg(*aggs)
    stack = ", ".join(f"'{k}', `{k}`" for k in keys)
    return row.selectExpr(f"stack({len(keys)}, {stack}) as (key, doc_count)")


def filter_agg(df: DataFrame, cond: Column) -> DataFrame:
    """``filter`` single-bucket agg (``FilterAggregationBuilder.java``):
    one bucket counting docs matching the predicate; sub-aggs run over
    the filtered frame (compose by aggregating ``df.filter(cond)``)."""
    return df.filter(cond).agg(F.count(F.lit(1)).cast("long").alias("doc_count"))


def filters_agg(df: DataFrame, named: Dict[str, Column]) -> DataFrame:
    """``filters`` agg (``FiltersAggregationBuilder.java``): one bucket
    per named predicate; docs may match several (conditional sums — no
    per-filter scans)."""
    aggs = [
        F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(name)
        for name, cond in named.items()
    ]
    row = df.agg(*aggs)
    stack = ", ".join(f"'{n}', `{n}`" for n in named)
    return row.selectExpr(f"stack({len(named)}, {stack}) as (key, doc_count)")


def adjacency_matrix(df: DataFrame, named: Dict[str, Column]) -> DataFrame:
    """``adjacency_matrix`` (``AdjacencyMatrixAggregationBuilder.java``):
    doc counts for every filter and every pairwise intersection, one
    conditional-sum pass (keys ``a``, ``a&b`` like the reference)."""
    names = list(named)
    aggs, keys = [], []
    for i, a in enumerate(names):
        keys.append(a)
        aggs.append(F.sum(F.when(named[a], 1).otherwise(0)).cast("long").alias(a))
        for b in names[i + 1 :]:
            k = f"{a}&{b}"
            keys.append(k)
            aggs.append(
                F.sum(F.when(named[a] & named[b], 1).otherwise(0)).cast("long").alias(k)
            )
    row = df.agg(*aggs)
    stack = ", ".join(f"'{k}', `{k}`" for k in keys)
    return row.selectExpr(f"stack({len(keys)}, {stack}) as (key, doc_count)").filter(
        F.col("doc_count") > 0
    )


def auto_date_histogram(df: DataFrame, field: str, target_buckets: int = 10) -> DataFrame:
    """``auto_date_histogram`` (``AutoDateHistogramAggregationBuilder.java``):
    pick the coarsest calendar interval producing <= target buckets
    (second/minute/hour/day/month/year ladder), then bucket."""
    bounds = df.agg(
        F.min(field).alias("lo"), F.max(field).alias("hi")
    ).collect()[0]
    if bounds["lo"] is None:
        return df.sparkSession.createDataFrame([], "key string, doc_count long")
    span_s = (bounds["hi"] - bounds["lo"]).total_seconds()
    for unit, secs in [
        ("second", 1), ("minute", 60), ("hour", 3600),
        ("day", 86400), ("month", 2592000), ("year", 31536000),
    ]:
        if span_s / secs <= target_buckets:
            break
    key = F.date_format(F.date_trunc(unit, F.col(field)), "yyyy-MM-dd HH:mm:ss")
    return (
        df.groupBy(key.alias("key"))
        .agg(F.count(F.lit(1)).alias("doc_count"))
        .withColumn("interval", F.lit(unit))
        .orderBy(F.asc("key"))
    )


def missing_agg(df: DataFrame, field: str) -> DataFrame:
    """``missing`` (``MissingAggregationBuilder.java``)."""
    return df.agg(
        F.sum(F.when(F.col(field).isNull(), 1).otherwise(0)).cast("long").alias("doc_count")
    )


def composite(
    df: DataFrame,
    fields: Sequence[str],
    size: int = 10,
    after: Optional[Sequence] = None,
) -> DataFrame:
    """``composite`` agg (``CompositeAggregator.java``): key-ordered
    paginated buckets; ``after`` is the last key tuple of the previous
    page (keyset pagination — in Spark a filter on the sort tuple)."""
    keys = [F.col(f).alias(f"key_{f}") for f in fields]
    out = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("doc_count"))
    if after is not None:
        cond = F.lit(False)
        eq = F.lit(True)
        for f, v in zip(fields, after):
            cond = cond | (eq & (F.col(f"key_{f}") > F.lit(v)))
            eq = eq & (F.col(f"key_{f}") == F.lit(v))
        out = out.filter(cond)
    return out.orderBy(*[F.asc(f"key_{f}") for f in fields]).limit(size)


def significant_terms(
    df: DataFrame, fg_cond: Column, field: str, size: int = 10, heuristic: str = "jlh"
) -> DataFrame:
    """``significant_terms`` (``SignificantTermsAggregationBuilder.java``):
    buckets over-represented in the foreground (query) set vs the
    background corpus.  Heuristics (``search/aggregations/bucket/terms/
    heuristic/``): ``jlh`` (default, ``JLHScore.java``:
    ``(fg% - bg%) * (fg% / bg%)``), ``chi_square``
    (``ChiSquare.java``, include_negatives=false semantics),
    ``mutual_information`` (``MutualInformation.java``), ``gnd``
    (``GND.java``, normalized Google distance)."""
    import math as _math

    fg = df.filter(fg_cond)
    fgc = fg.groupBy(F.col(field).alias("key")).agg(F.count(F.lit(1)).alias("fg_count"))
    bgc = df.groupBy(F.col(field).alias("key")).agg(F.count(F.lit(1)).alias("bg_count"))
    fg_total = float(fg.count())
    bg_total = float(df.count())
    j = fgc.join(bgc, "key")
    fg_pct = F.col("fg_count") / F.lit(fg_total)
    bg_pct = F.col("bg_count") / F.lit(bg_total)
    if heuristic == "chi_square":
        # (N * (ad - bc)^2) / ((a+b)(a+c)(b+d)(c+d)) over the 2x2 table
        a = F.col("fg_count").cast("double")
        b_ = (F.col("bg_count") - F.col("fg_count")).cast("double")
        c = F.lit(fg_total) - a
        d = F.lit(bg_total - fg_total) - b_
        n = F.lit(bg_total)
        score = (
            n * F.pow(a * d - b_ * c, F.lit(2.0))
            / ((a + b_) * (a + c) * (b_ + d) * (c + d))
        )
    elif heuristic == "mutual_information":
        # Full 4-term MI over the 2x2 (term presence x foreground
        # membership) contingency table (MutualInformation.java
        # getScore/getMITerm), with the reference's 0*log(0)=0 guard.
        n = F.lit(bg_total)
        n11 = F.col("fg_count").cast("double")  # term & fg
        n01 = (F.col("bg_count") - F.col("fg_count")).cast("double")  # term & !fg
        n10 = F.lit(fg_total) - n11  # !term & fg
        n00 = F.lit(bg_total - fg_total) - n01  # !term & !fg
        nt1 = F.col("bg_count").cast("double")  # term marginal
        nt0 = n - nt1
        nc1 = F.lit(fg_total)  # class (fg) marginal
        nc0 = F.lit(bg_total - fg_total)

        def _mi_term(nij, nt, nc):
            return F.when(
                nij > 0, (nij / n) * F.log2(n * nij / (nt * nc))
            ).otherwise(F.lit(0.0))

        score = (
            _mi_term(n11, nt1, nc1)
            + _mi_term(n01, nt1, nc0)
            + _mi_term(n10, nt0, nc1)
            + _mi_term(n00, nt0, nc0)
        )
    elif heuristic == "gnd":
        # normalized Google distance similarity (GND.java:113): the
        # reference returns exp(-dist) ("we must invert the order")
        # and short-circuits fxy==0 -> 0.0 and the perfect
        # co-occurrence case fx==fy==fxy -> 1.0 (zero denominator).
        fx = F.log(F.lit(fg_total))
        fy = F.log(F.col("bg_count").cast("double"))
        fxy = F.log(F.col("fg_count").cast("double"))
        logn = F.lit(_math.log(bg_total))
        dist = (F.greatest(fx, fy) - fxy) / (logn - F.least(fx, fy))
        score = (
            F.when(F.col("fg_count") == 0, F.lit(0.0))
            .when((fx == fy) & (fy == fxy), F.lit(1.0))
            .otherwise(F.exp(-dist))
        )
    else:  # jlh
        score = (fg_pct - bg_pct) * (fg_pct / bg_pct)
    # the shared fg_pct > bg_pct filter IS the reference's
    # include_negatives=false semantics (NXYSignificanceHeuristic.java:
    # score = -inf when N11/N_1 < N10/N_0): the overall rate is a
    # weighted mean of the fg rate and the complement rate, so
    # fg_rate > overall_rate <=> fg_rate > complement_rate —
    # foreground-depleted terms never surface for ANY heuristic
    return (
        j.withColumn("score", F.round(score.cast("double"), 6))
        .filter(fg_pct > bg_pct)
        .orderBy(F.desc("score"), F.asc("key"))
        .limit(size)
        .select("key", "fg_count", "bg_count", "score")
    )


# ------------------------------------------------------------- metric


def stats(df: DataFrame, field: str) -> DataFrame:
    """``stats`` (``StatsAggregator.java``): count/min/max/sum/avg.
    Sum in float64 (the reference uses Kahan compensation,
    ``CompensatedSum.java``; Spark's double sum matches to ulps at
    these magnitudes — documented tolerance)."""
    c = F.col(field)
    return df.agg(
        F.count(c).alias("count"),
        F.round(F.min(c).cast("double"), 6).alias("min"),
        F.round(F.max(c).cast("double"), 6).alias("max"),
        F.round(F.sum(c).cast("double"), 4).alias("sum"),
        F.round(F.avg(c), 6).alias("avg"),
    )


def extended_stats(df: DataFrame, field: str) -> DataFrame:
    """``extended_stats`` (``ExtendedStatsAggregator.java``): population
    variance/std-dev like the reference."""
    c = F.col(field)
    return df.agg(
        F.count(c).alias("count"),
        F.round(F.sum(c).cast("double"), 4).alias("sum"),
        F.round(F.avg(c), 6).alias("avg"),
        F.round(F.var_pop(c), 4).alias("variance"),
        F.round(F.stddev_pop(c), 6).alias("std_deviation"),
    )


def value_count(df: DataFrame, field: str) -> DataFrame:
    return df.agg(F.count(F.col(field)).alias("value_count"))


def weighted_avg(df: DataFrame, value: str, weight: str) -> DataFrame:
    """``weighted_avg`` (``InternalWeightedAvg.java``):
    sum(v*w)/sum(w)."""
    v, w = F.col(value).cast("double"), F.col(weight).cast("double")
    return df.agg(
        F.round((F.sum(v * w) / F.sum(w)), 6).alias("weighted_avg")
    )


def cardinality(df: DataFrame, field: str, exact: bool = False, rsd: float = 0.01) -> DataFrame:
    """``cardinality`` (``CardinalityAggregator.java``): HLL++ approx
    distinct (precision 14 default ~ rsd 0.01) — same sketch family as
    the reference; ``exact=True`` for the verifiable count."""
    if exact:
        return df.agg(F.count_distinct(F.col(field)).alias("cardinality"))
    return df.agg(F.approx_count_distinct(F.col(field), rsd).alias("cardinality"))


def percentiles(
    df: DataFrame, field: str, percents: Sequence[float] = (50.0, 95.0, 99.0), exact: bool = True
) -> DataFrame:
    """``percentiles``: exact linear-interpolation quantiles
    (verifiable against SQL ``quantile_cont``), or the sketch-based
    scale path (``percentile_approx``, the analog of the reference's
    t-digest)."""
    fn = "percentile" if exact else "percentile_approx"
    aggs = [
        F.round(
            F.expr(f"{fn}({field}, {p / 100.0})").cast("double"), 4
        ).alias(f"p{str(p).replace('.', '_')}")
        for p in percents
    ]
    return df.agg(*aggs)


def median_absolute_deviation(df: DataFrame, field: str) -> DataFrame:
    """``median_absolute_deviation``: median(|x - median(x)|), exact."""
    med = df.agg(F.expr(f"percentile({field}, 0.5)").alias("m")).collect()[0]["m"]
    return df.agg(
        F.round(
            F.expr(f"percentile(abs({field} - {float(med)}), 0.5)").cast("double"), 4
        ).alias("mad")
    )


def top_hits(
    df: DataFrame,
    bucket: str,
    sort_col: str,
    k: int = 3,
    ascending: bool = False,
    tie_col: Optional[str] = None,
) -> DataFrame:
    """``top_hits`` (``TopHitsAggregator.java``): per-bucket top-k by
    sort with deterministic tie-break."""
    order = [F.asc(sort_col) if ascending else F.desc(sort_col)]
    if tie_col:
        order.append(F.asc(tie_col))
    w = Window.partitionBy(bucket).orderBy(*order)
    return (
        df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


# ----------------------------------------------------------- pipeline


def derivative(buckets: DataFrame, key: str = "key", value: str = "doc_count") -> DataFrame:
    """``derivative`` (``DerivativePipelineAggregator.java``):
    value - lag(value) over the key-ordered bucket series."""
    w = Window.orderBy(F.asc(key))
    return buckets.withColumn(
        "derivative", (F.col(value) - F.lag(value).over(w)).cast("double")
    )


def cumulative_sum(buckets: DataFrame, key: str = "key", value: str = "doc_count") -> DataFrame:
    """``cumulative_sum`` (``CumulativeSumPipelineAggregator.java``)."""
    w = Window.orderBy(F.asc(key)).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return buckets.withColumn("cumulative_sum", F.sum(value).over(w).cast("double"))


def moving_avg(
    buckets: DataFrame, key: str = "key", value: str = "doc_count", window: int = 3
) -> DataFrame:
    """``moving_avg`` simple model (``MovAvgPipelineAggregator.java``):
    trailing window mean."""
    w = Window.orderBy(F.asc(key)).rowsBetween(-(window - 1), Window.currentRow)
    return buckets.withColumn(
        "moving_avg", F.round(F.avg(F.col(value).cast("double")).over(w), 6)
    )


def moving_fn(
    buckets: DataFrame,
    key: str = "key",
    value: str = "doc_count",
    window: int = 5,
    model: str = "ewma",
    alpha: float = 0.3,
    beta: float = 0.1,
    gamma: float = 0.3,
    period: int = 7,
) -> DataFrame:
    """``moving_fn`` / ``moving_avg`` models (MovAvgPipelineAggregator.java:
    simple / min / max / sum / linear / ewma / holt / holt_winters) over
    the trailing window of the key-ordered bucket series.  The window
    values are gathered with ``collect_list`` over a rows-window and the
    model runs vectorized in a pandas UDF — the reduce-phase
    (coordinator-side) evaluation the reference does.  ``holt_winters``
    is additive triple exponential smoothing seeded from the first
    ``period`` values (returns null until 2 full periods are in the
    window, like the reference's minimum-data requirement)."""
    import numpy as np
    import pandas as pd

    w = Window.orderBy(F.asc(key)).rowsBetween(-(window - 1), Window.currentRow)

    def _model(vals: pd.Series) -> pd.Series:
        def one(xs):
            a = np.asarray(xs, dtype=np.float64)
            if a.size == 0:
                return None
            if model == "simple":
                return float(a.mean())
            if model == "min":
                return float(a.min())
            if model == "max":
                return float(a.max())
            if model == "sum":
                return float(a.sum())
            if model == "linear":
                wts = np.arange(1, a.size + 1, dtype=np.float64)
                return float((a * wts).sum() / wts.sum())
            if model == "holt":
                s, b = a[0], (a[1] - a[0]) if a.size > 1 else 0.0
                for x in a[1:]:
                    s_prev = s
                    s = alpha * x + (1 - alpha) * (s + b)
                    b = beta * (s - s_prev) + (1 - beta) * b
                return float(s)
            if model == "holt_winters":
                p = int(period)
                if a.size < 2 * p:
                    return None  # HoltWintersModel needs 2 full periods
                level = float(a[:p].mean())
                trend = float((a[p : 2 * p].mean() - a[:p].mean()) / p)
                seas = (a[:p] - level).astype(np.float64)
                for i in range(p, a.size):
                    x = a[i]
                    last_level = level
                    si = seas[i % p]
                    level = alpha * (x - si) + (1 - alpha) * (level + trend)
                    trend = beta * (level - last_level) + (1 - beta) * trend
                    seas[i % p] = gamma * (x - level) + (1 - gamma) * si
                return float(level + trend + seas[a.size % p])
            # ewma
            s = a[0]
            for x in a[1:]:
                s = alpha * x + (1 - alpha) * s
            return float(s)

        return vals.map(one)

    model_udf = F.pandas_udf(_model, "double")
    return buckets.withColumn(
        "moving_fn",
        F.round(model_udf(F.collect_list(F.col(value).cast("double")).over(w)), 6),
    )


def bucket_script(buckets: DataFrame, name: str, expr: Column) -> DataFrame:
    """``bucket_script`` (BucketScriptPipelineAggregator.java): per-bucket
    arithmetic as a plain projection."""
    return buckets.withColumn(name, expr)


def serial_diff(
    buckets: DataFrame, key: str = "key", value: str = "doc_count", lag: int = 1
) -> DataFrame:
    """``serial_diff`` (``SerialDiffPipelineAggregator.java``)."""
    w = Window.orderBy(F.asc(key))
    return buckets.withColumn(
        "serial_diff", (F.col(value) - F.lag(value, lag).over(w)).cast("double")
    )


def bucket_sort(
    buckets: DataFrame, sort_col: str, size: int, ascending: bool = False, tie_col: str = "key"
) -> DataFrame:
    """``bucket_sort`` (``BucketSortPipelineAggregator.java``)."""
    order = [F.asc(sort_col) if ascending else F.desc(sort_col), F.asc(tie_col)]
    return buckets.orderBy(*order).limit(size)


def bucket_selector(buckets: DataFrame, cond: Column) -> DataFrame:
    """``bucket_selector`` = HAVING (``BucketSelectorPipelineAggregator.java``)."""
    return buckets.filter(cond)


def avg_bucket(buckets: DataFrame, value: str = "doc_count") -> DataFrame:
    """``avg_bucket`` second-level metric over the bucket series."""
    return buckets.agg(F.round(F.avg(F.col(value).cast("double")), 6).alias("avg_bucket"))


def stats_bucket(buckets: DataFrame, value: str = "doc_count") -> DataFrame:
    """``stats_bucket`` / ``min/max/sum_bucket`` family
    (AvgBucketPipelineAggregator.java siblings)."""
    c = F.col(value).cast("double")
    return buckets.agg(
        F.count(c).alias("count"),
        F.round(F.min(c), 6).alias("min"),
        F.round(F.max(c), 6).alias("max"),
        F.round(F.sum(c), 4).alias("sum"),
        F.round(F.avg(c), 6).alias("avg"),
    )


def extended_stats_bucket(
    buckets: DataFrame, value: str = "doc_count", sigma: float = 2.0
) -> DataFrame:
    """``extended_stats_bucket``
    (ExtendedStatsBucketPipelineAggregationBuilder.java): the sibling
    series' extended stats — population variance (sum_sq/n - avg², the
    reference's InternalExtendedStats.getVariance) and sigma std
    bounds."""
    c = F.col(value).cast("double")
    raw = buckets.agg(
        F.count(c).alias("count"),
        F.min(c).alias("_min"),
        F.max(c).alias("_max"),
        F.sum(c).alias("_sum"),
        F.avg(c).alias("_avg"),
        F.sum(c * c).alias("_sum_sq"),
    )
    var = F.col("_sum_sq") / F.col("count") - F.col("_avg") * F.col("_avg")
    std = F.sqrt(var)
    return raw.select(
        F.col("count").cast("double").alias("count"),
        F.round(F.col("_min"), 6).alias("min"),
        F.round(F.col("_max"), 6).alias("max"),
        F.round(F.col("_sum"), 4).alias("sum"),
        F.round(F.col("_avg"), 6).alias("avg"),
        F.round(F.col("_sum_sq"), 4).alias("sum_of_squares"),
        F.round(var, 6).alias("variance"),
        F.round(std, 6).alias("std_deviation"),
        F.round(F.col("_avg") + F.lit(float(sigma)) * std, 6).alias("std_upper"),
        F.round(F.col("_avg") - F.lit(float(sigma)) * std, 6).alias("std_lower"),
    )


def percentiles_bucket(
    buckets: DataFrame, value: str = "doc_count", percents: Sequence[float] = (50, 95)
) -> DataFrame:
    """``percentiles_bucket``: exact quantiles over the bucket series."""
    aggs_ = [
        F.round(F.expr(f"percentile({value}, {p / 100.0})").cast("double"), 4).alias(
            f"p{int(p)}"
        )
        for p in percents
    ]
    return buckets.agg(*aggs_)


# ------------------------------------------- round-2 breadth operators


def date_range_agg(
    df: DataFrame, field: str, ranges: Sequence[Tuple[Optional[str], Optional[str]]]
) -> DataFrame:
    """``date_range`` agg (``RangeAggregationBuilder.java`` date variant,
    ``DateRangeAggregationBuilder``): [from, to) buckets over a timestamp
    column, bounds as ISO strings; one conditional-sum pass like
    ``range_agg`` (empty buckets kept, count 0)."""
    aggs, keys = [], []
    c = F.col(field)
    for lo, hi in ranges:
        cond = F.lit(True)
        if lo is not None:
            cond = cond & (c >= F.to_timestamp(F.lit(lo)))
        if hi is not None:
            cond = cond & (c < F.to_timestamp(F.lit(hi)))
        key = f"{lo or '*'}-{hi or '*'}"
        keys.append(key)
        aggs.append(F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(key))
    row = df.agg(*aggs)
    stack = ", ".join(f"'{k}', `{k}`" for k in keys)
    return row.selectExpr(f"stack({len(keys)}, {stack}) as (key, doc_count)")


def ip_to_long(col: Column) -> Column:
    """IPv4 -> uint32-as-long (the comparable form of the reference's
    16-byte IP points, ``IpFieldMapper.java``).  Accepts dotted-quad
    strings AND the canonical 32-hex v6-mapped storage an explicit
    ``ip`` mapping writes (low 32 bits when the ::ffff:0:0/96 marker
    is present); true IPv6 values stay NULL — the v4 CIDR arithmetic
    of ip_range does not apply to them."""
    part = lambda i: F.split(col, r"\.").getItem(i).cast("long")
    dotted = part(0) * 16777216 + part(1) * 65536 + part(2) * 256 + part(3)
    hex_v4 = F.conv(col.substr(25, 8), 16, 10).cast("long")
    return (
        F.when(col.contains("."), dotted)
        .when((F.length(col) == 32) & (col.substr(21, 4) == "ffff"), hex_v4)
    )


def ip_range_agg(
    df: DataFrame, field: str, ranges: Sequence[Tuple[Optional[str], Optional[str]]]
) -> DataFrame:
    """``ip_range`` agg (``IpRangeAggregationBuilder``): [from, to)
    buckets over a dotted-quad IPv4 string column, compared numerically."""
    v = ip_to_long(F.col(field))
    aggs, keys = [], []
    for lo, hi in ranges:
        cond = F.col(field).isNotNull()
        if lo is not None:
            cond = cond & (v >= ip_to_long(F.lit(lo)))
        if hi is not None:
            cond = cond & (v < ip_to_long(F.lit(hi)))
        key = f"{lo or '*'}-{hi or '*'}"
        keys.append(key)
        aggs.append(F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(key))
    row = df.agg(*aggs)
    stack = ", ".join(f"'{k}', `{k}`" for k in keys)
    return row.selectExpr(f"stack({len(keys)}, {stack}) as (key, doc_count)")


def variable_width_histogram(df: DataFrame, field: str, buckets: int = 5) -> DataFrame:
    """``variable_width_histogram``
    (``VariableWidthHistogramAggregationBuilder.java``): adaptive buckets
    sized to the data distribution.  The reference runs an online 1-D
    clustering per shard; we use equal-population quantile sharding
    (``ntile`` over the value order) — deterministic, one pass, and
    distribution-adaptive in the same sense (narrow buckets where data
    is dense).  Documented deviation: bucket boundaries are quantiles,
    not cluster centroids.  Emits (bucket, min, max, avg=key, doc_count)."""
    w = Window.orderBy(F.asc(field))
    c = F.col(field).cast("double")
    return (
        df.filter(F.col(field).isNotNull())
        .withColumn("_b", F.ntile(buckets).over(w))
        .groupBy(F.col("_b").alias("bucket"))
        .agg(
            F.round(F.min(c), 6).alias("min"),
            F.round(F.max(c), 6).alias("max"),
            F.round(F.avg(c), 6).alias("key"),
            F.count(F.lit(1)).alias("doc_count"),
        )
        .orderBy(F.asc("bucket"))
    )


def diversified_sampler(
    df: DataFrame,
    diversity_field: str,
    score_col: str,
    shard_size: int = 100,
    max_docs_per_value: int = 1,
    tie_col: Optional[str] = None,
) -> DataFrame:
    """``diversified_sampler`` (``DiversifiedAggregationBuilder.java``):
    the top-``shard_size`` sample by score, allowing at most
    ``max_docs_per_value`` docs per ``diversity_field`` value — a
    de-duplicated sampler.  Two windows: per-value rank to enforce the
    diversity cap, then global top-N."""
    order = [F.desc(score_col)] + ([F.asc(tie_col)] if tie_col else [])
    wv = Window.partitionBy(diversity_field).orderBy(*order)
    capped = (
        df.withColumn("_vr", F.row_number().over(wv))
        .filter(F.col("_vr") <= max_docs_per_value)
        .drop("_vr")
    )
    return capped.orderBy(*order).limit(shard_size)


def matrix_stats(df: DataFrame, fields: Sequence[str]) -> DataFrame:
    """``matrix_stats`` (``modules/aggs-matrix-stats/``): per-field-pair
    count / means / covariance / correlation in one aggregate pass
    (``F.covar_samp`` / ``F.corr`` match the reference's sample
    covariance).  Emits one row per unordered pair (field_a <= field_b)."""
    rows = []
    for i, a in enumerate(fields):
        for b_ in fields[i:]:
            ca, cb = F.col(a).cast("double"), F.col(b_).cast("double")
            rows.append(
                F.struct(
                    F.lit(a).alias("field_a"),
                    F.lit(b_).alias("field_b"),
                    F.count(F.when(ca.isNotNull() & cb.isNotNull(), 1)).alias("count"),
                    F.round(F.avg(ca), 6).alias("mean_a"),
                    F.round(F.avg(cb), 6).alias("mean_b"),
                    F.round(F.covar_samp(ca, cb), 4).alias("covariance"),
                    F.round(F.corr(ca, cb), 6).alias("correlation"),
                )
            )
    row = df.agg(F.array(*rows).alias("_m"))
    return row.select(F.explode("_m").alias("m")).select("m.*")


def scripted_metric(
    df: DataFrame,
    bucket: Optional[str],
    map_fn,
    reduce_fn,
    state_schema: str = "value double",
    result_name: str = "value",
):
    """``scripted_metric`` UDAF (``ScriptedMetricAggregationBuilder.java:63-66``:
    init/map/combine/reduce scripts).  Spark mapping mirrors the
    shard/coordinator split exactly:

    - ``map_fn(pdf) -> dict`` runs per PARTITION chunk over the bucket's
      rows (init+map+combine of one shard) inside ``applyInPandas`` with
      a partition-salt key, producing one partial-state row per chunk;
    - ``reduce_fn(list[dict]) -> float`` folds the partial states per
      bucket on a second tiny grouped pass (the coordinator reduce).

    Both callables are arbitrary Python over pandas — the Painless-UDAF
    analog — but the per-doc path stays Arrow-batched."""
    import pandas as pd

    spark_salt = F.spark_partition_id()
    keys = ([bucket] if bucket else []) + ["_salt"]
    with_salt = df.withColumn("_salt", spark_salt)

    part_fields = (f"{bucket} string, " if bucket else "") + state_schema

    def _partial(pdf: pd.DataFrame) -> pd.DataFrame:
        state = map_fn(pdf)
        out = {k: [v] for k, v in state.items()}
        if bucket:
            out[bucket] = [pdf[bucket].iloc[0]]
        return pd.DataFrame(out)

    partials = with_salt.groupBy(*keys).applyInPandas(_partial, part_fields)

    res_fields = (f"{bucket} string, " if bucket else "") + f"{result_name} double"

    def _reduce(pdf: pd.DataFrame) -> pd.DataFrame:
        drop = [c for c in ([bucket] if bucket else ["_g"]) if c in pdf.columns]
        states = pdf.drop(columns=drop).to_dict("records")
        out = {result_name: [float(reduce_fn(states))]}
        if bucket:
            out[bucket] = [pdf[bucket].iloc[0]]
        else:
            out["_g"] = [1]
        return pd.DataFrame(out)

    if bucket:
        return partials.groupBy(bucket).applyInPandas(_reduce, res_fields)
    return (
        partials.withColumn("_g", F.lit(1))
        .groupBy("_g")
        .applyInPandas(_reduce, "_g int, " + f"{result_name} double")
        .drop("_g")
    )


def significant_text(
    df: DataFrame,
    fg_cond: Column,
    text_col: str = "text",
    size: int = 10,
    min_doc_count: int = 3,
    filter_duplicate_text: bool = False,
    id_col: Optional[str] = None,
    dup_gram: int = 6,
) -> DataFrame:
    """``significant_text`` (``SignificantTextAggregationBuilder``): JLH
    over ANALYZED TERMS of the hit set vs the background corpus — the
    corpus-mining agg (which words characterize the matching docs).
    Counts are document frequencies (distinct tokens per doc), computed
    with one explode + two conditional counts; JLH = (fg%-bg%)*(fg%/bg%).

    ``filter_duplicate_text`` is the builder's boilerplate stripper
    (Lucene DeDuplicatingTokenFilter / DuplicateByteSequenceSpotter,
    sequence length 6): token occurrences inside a ``dup_gram``-token
    run shared with ANOTHER document are excluded from counting, so
    copy-pasted spans don't dominate the statistics.  The reference's
    spotter is stateful per-shard-stream (trims sequences already seen
    earlier in the stream); the distributed analog here is
    order-independent — a span is dropped wherever its exact
    ``dup_gram``-gram occurs in >= 2 documents — which drops BOTH
    copies rather than all-but-the-first (documented deviation; the
    statistics goal is identical).  Needs ``id_col`` to identify docs.

    Scale shape: one n-gram explode -> groupBy to find cross-doc
    grams, one join back to mark covered positions — the
    MinHash-candidate shape from ops/dedup.py, shuffle bounded by
    corpus token count."""
    from opensearch_spark.ops.dedup import tokens_col

    if not filter_duplicate_text:
        toks = df.select(
            fg_cond.alias("_fg"),
            F.explode(F.array_distinct(tokens_col(text_col))).alias("key"),
        )
    else:
        if id_col is None:
            raise ValueError("filter_duplicate_text requires id_col")
        g = int(dup_gram)
        t = df.select(
            F.col(id_col).alias("_id"),
            fg_cond.alias("_fg"),
            tokens_col(text_col).alias("_tk"),
        )
        n = F.size("_tk")
        grams = t.select(
            "_id",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(1), F.greatest(n - F.lit(g - 1), F.lit(0))),
                    lambda i: F.concat_ws(" ", F.slice("_tk", i, g)),
                )
            ).alias("_s0", "gram"),
        ).select("_id", (F.col("_s0") + F.lit(1)).alias("_start"), "gram")
        dup = (
            grams.groupBy("gram")
            .agg(F.count_distinct("_id").alias("_docs"))
            .filter(F.col("_docs") >= 2)
            .select("gram")
        )
        covered = (
            grams.join(dup, "gram")
            .select(
                "_id",
                F.explode(
                    F.sequence(F.col("_start"), F.col("_start") + F.lit(g - 1))
                ).alias("_pos"),
            )
            .distinct()
        )
        poss = t.select(
            "_id", "_fg", F.posexplode("_tk").alias("_p0", "key")
        ).select("_id", "_fg", (F.col("_p0") + F.lit(1)).alias("_pos"), "key")
        toks = (
            poss.join(covered, ["_id", "_pos"], "left_anti")
            .select("_id", "_fg", "key")
            .distinct()
            .select("_fg", "key")
        )
    totals = df.agg(
        F.sum(F.when(fg_cond, 1).otherwise(0)).cast("double").alias("fg_total"),
        F.count(F.lit(1)).cast("double").alias("bg_total"),
    ).collect()[0]
    fg_total, bg_total = float(totals["fg_total"]), float(totals["bg_total"])
    counts = toks.groupBy("key").agg(
        F.sum(F.when(F.col("_fg"), 1).otherwise(0)).cast("long").alias("fg_count"),
        F.count(F.lit(1)).cast("long").alias("bg_count"),
    )
    fg_pct = F.col("fg_count") / F.lit(fg_total)
    bg_pct = F.col("bg_count") / F.lit(bg_total)
    score = (fg_pct - bg_pct) * (fg_pct / bg_pct)
    return (
        counts.filter(F.col("fg_count") >= min_doc_count)
        .withColumn("score", F.round(score.cast("double"), 6))
        .filter(fg_pct > bg_pct)
        .orderBy(F.desc("score"), F.asc("key"))
        .limit(size)
        .select("key", "fg_count", "bg_count", "score")
    )


def geo_centroid(
    df: DataFrame, lat_col: str = "lat", lon_col: str = "lon"
) -> DataFrame:
    """``geo_centroid`` (GeoCentroidAggregationBuilder; metrics/
    GeoCentroidAggregator.java): doc-count-weighted mean of the points
    — one row (lat, lon, count).  Simple arithmetic mean of the
    coordinates (the reference accumulates in the same lat/lon space);
    longitude wrap-around near the antimeridian is not special-cased
    (documented simplification)."""
    return df.agg(
        F.round(F.avg(F.col(lat_col)), 6).alias("lat"),
        F.round(F.avg(F.col(lon_col)), 6).alias("lon"),
        F.count(F.lit(1)).cast("long").alias("count"),
    )


def geo_bounds(
    df: DataFrame, lat_col: str = "lat", lon_col: str = "lon"
) -> DataFrame:
    """``geo_bounds`` (GeoBoundsAggregationBuilder): the tightest
    non-wrapping bounding box of the points — one row
    (top, bottom, left, right)."""
    return df.agg(
        F.max(F.col(lat_col)).alias("top"),
        F.min(F.col(lat_col)).alias("bottom"),
        F.min(F.col(lon_col)).alias("left"),
        F.max(F.col(lon_col)).alias("right"),
    )


def geo_bounds_shapes(df: DataFrame, field: str) -> DataFrame:
    """``geo_bounds`` over SHAPE docs (modules/geo
    ``GeoShapeBoundsAggregator``): the union box of per-doc envelope
    structs (min_lat/max_lat/min_lon/max_lon) — still one exact agg,
    no wrap special-case (matching :func:`geo_bounds`)."""
    c = F.col(field)
    return df.filter(c.isNotNull()).agg(
        F.max(c["max_lat"]).alias("top"),
        F.min(c["min_lat"]).alias("bottom"),
        F.min(c["min_lon"]).alias("left"),
        F.max(c["max_lon"]).alias("right"),
    )


def geo_centroid_shapes(df: DataFrame, field: str) -> DataFrame:
    """``geo_centroid`` over SHAPE docs: each envelope contributes its
    box center, doc-count weighted (the reference's shape centroid
    accumulates per-shape centroids the same way)."""
    c = F.col(field)
    lat_mid = (c["min_lat"] + c["max_lat"]) / 2.0
    lon_mid = (c["min_lon"] + c["max_lon"]) / 2.0
    return df.filter(c.isNotNull()).agg(
        F.round(F.avg(lat_mid), 6).alias("lat"),
        F.round(F.avg(lon_mid), 6).alias("lon"),
        F.count(F.lit(1)).cast("long").alias("count"),
    )


# base32 alphabet of the geohash spec (Geohash.java BASE_32)
GEOHASH_ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash_key(
    precision: int, lat_col: str = "lat", lon_col: str = "lon"
) -> Column:
    """Base32 geohash of (lat, lon) at ``precision`` chars as ONE
    whole-stage-codegen Column (closed-form bit interleave — see
    :func:`geohash_grid`).  Shared by geohash_grid and the completion
    suggester's GeoContextMapping analog."""
    bits = 5 * precision
    lon_bits = (bits + 1) // 2
    lat_bits = bits // 2
    x = F.floor((F.col(lon_col) + 180.0) / 360.0 * (1 << lon_bits))
    y = F.floor((F.col(lat_col) + 90.0) / 180.0 * (1 << lat_bits))
    x = F.greatest(F.lit(0), F.least(F.lit((1 << lon_bits) - 1), x)).cast(
        "long"
    )
    y = F.greatest(F.lit(0), F.least(F.lit((1 << lat_bits) - 1), y)).cast(
        "long"
    )
    code = F.lit(0).cast("long")
    for i in range(bits):  # msb-first: even stream positions are lon bits
        src, src_bits = (x, lon_bits) if i % 2 == 0 else (y, lat_bits)
        code = code + F.shiftleft(
            F.shiftright(src, src_bits - 1 - i // 2).bitwiseAND(F.lit(1)),
            bits - 1 - i,
        )
    alpha = F.array(*[F.lit(c) for c in GEOHASH_ALPHABET])
    chars = [
        F.element_at(
            alpha,
            (
                F.shiftright(code, 5 * (precision - 1 - c)).bitwiseAND(
                    F.lit(31)
                )
            ).cast("int")
            + 1,
        )
        for c in range(precision)
    ]
    return F.concat(*chars)


def geohash_encode(lat: float, lon: float, precision: int = 6) -> str:
    """Driver-side geohash encode — the same closed form as
    :func:`geohash_key`, for query-time points (GeoQueryContext).
    Pinned against published geohashes in tests/test_operators2.py."""
    bits = 5 * precision
    lon_bits = (bits + 1) // 2
    lat_bits = bits // 2
    x = min(max(int((lon + 180.0) / 360.0 * (1 << lon_bits)), 0), (1 << lon_bits) - 1)
    y = min(max(int((lat + 90.0) / 180.0 * (1 << lat_bits)), 0), (1 << lat_bits) - 1)
    code = 0
    for i in range(bits):
        src, src_bits = (x, lon_bits) if i % 2 == 0 else (y, lat_bits)
        code += ((src >> (src_bits - 1 - i // 2)) & 1) << (bits - 1 - i)
    return "".join(
        GEOHASH_ALPHABET[(code >> (5 * (precision - 1 - c))) & 31]
        for c in range(precision)
    )

# Web-Mercator latitude bound (GeoTileUtils.java LATITUDE_MASK)
GEOTILE_LAT_MAX = 85.0511287798066


def geotile_grid(
    df: DataFrame,
    precision: int = 7,
    lat_col: str = "lat",
    lon_col: str = "lon",
    size: int = 10000,
) -> DataFrame:
    """``geotile_grid`` bucket agg (GeoTileGridAggregationBuilder.java;
    key math in GeoTileUtils.java:133-150): web-mercator "z/x/y" tile
    keys at zoom ``precision``, count per tile, ordered count desc / key
    asc.  Pure Catalyst arithmetic (one groupBy shuffle on the tile key;
    at 100 TB this is a plain map-side-combinable count)."""
    import math as _math

    z = 1 << precision
    lat = F.greatest(
        F.lit(-GEOTILE_LAT_MAX),
        F.least(F.lit(GEOTILE_LAT_MAX), F.col(lat_col)),
    )
    r = F.radians(lat)
    x = F.floor((F.col(lon_col) + 180.0) / 360.0 * z)
    y = F.floor(
        (1.0 - F.log(F.tan(r) + 1.0 / F.cos(r)) / _math.pi) / 2.0 * z
    )
    clamp = lambda c: F.greatest(F.lit(0), F.least(F.lit(z - 1), c))  # noqa: E731
    key = F.concat_ws(
        "/", F.lit(str(precision)), clamp(x).cast("string"),
        clamp(y).cast("string")
    )
    return (
        df.groupBy(key.alias("key"))
        .agg(F.count(F.lit(1)).cast("long").alias("doc_count"))
        .orderBy(F.desc("doc_count"), F.asc("key"))
        .limit(size)
    )


def geohash_grid(
    df: DataFrame,
    precision: int = 5,
    lat_col: str = "lat",
    lon_col: str = "lon",
    size: int = 10000,
) -> DataFrame:
    """``geohash_grid`` bucket agg (GeoHashGridAggregationBuilder.java;
    encode in ``libs/geo/.../Geohash.java``): base32 geohash cell keys.

    Implemented closed-form instead of the reference's per-bit loop: a
    geohash interleaves lon/lat bisection bits (lon first), so the
    ``5*precision``-bit code is the bit-interleave of
    X = floor((lon+180)/360 * 2^ceil(bits/2)) and
    Y = floor((lat+90)/180 * 2^floor(bits/2)) — both plain integer
    arithmetic, unrolled here into one whole-stage-codegen expression
    (no UDF, no Python in the hot path)."""
    key = geohash_key(precision, lat_col, lon_col)
    return (
        df.groupBy(key.alias("key"))
        .agg(F.count(F.lit(1)).cast("long").alias("doc_count"))
        .orderBy(F.desc("doc_count"), F.asc("key"))
        .limit(size)
    )


def geo_distance_agg(
    df: DataFrame,
    origin_lat: float,
    origin_lon: float,
    ranges,
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """``geo_distance`` bucket agg (GeoDistanceAggregationBuilder.java):
    [from, to) km buckets around an origin, arc (haversine) distance —
    one conditional-sum pass over the computed distance column, same
    shape as ``range_agg``."""
    from opensearch_spark.query.executor import _haversine_km

    km = _haversine_km(F.col(lat_col), F.col(lon_col), origin_lat, origin_lon)
    # same [from, to) bucket semantics, keys and melt as range_agg —
    # delegate over the computed distance column instead of duplicating
    return range_agg(df.withColumn("_gd_km", km), "_gd_km", ranges)


def percentile_ranks(
    df: DataFrame, field: str, values: Sequence[float]
) -> DataFrame:
    """``percentile_ranks`` (PercentileRanksAggregationBuilder;
    HDR/TDigestPercentileRanksAggregator): for each given value, the
    percentage of observations <= it — the inverse of ``percentiles``.
    EXACT variant (one conditional-sum pass); the reference's t-digest
    estimate is the approximate path, same family as
    ``percentiles(exact=False)``."""
    n = F.count(F.col(field)).cast("double")
    aggs_ = [n.alias("_n")] + [
        F.sum(F.when(F.col(field) <= F.lit(float(v)), 1).otherwise(0))
        .cast("double")
        .alias(f"_le{i}")
        for i, v in enumerate(values)
    ]
    row = df.agg(*aggs_)
    stack = ", ".join(
        f"'{v}', 100.0 * `_le{i}` / `_n`" for i, v in enumerate(values)
    )
    return row.selectExpr(f"stack({len(values)}, {stack}) as (key, rank_pct)")
