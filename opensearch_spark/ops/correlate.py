"""Events correlation engine: time-window correlation across event sets.

Reference: ``plugins/events-correlation-engine`` — a ``CorrelationRule``
(``rules/model/CorrelationRule.java:28-45``) declares N ``correlate``
entries (``rules/model/CorrelationQuery.java:37-66``: index + query +
``timestampField`` + tags); the engine finds events matching the
per-index queries whose timestamps fall within the configured
``correlation_time_window`` of each other
(``settings/EventsCorrelationSettings.java``).

Spark-first design: each ``correlate`` entry resolves to a tagged event
frame (any filter/query over any table — callers can use the engine's
query DSL or plain Catalyst predicates); correlation is a **banded
time join**: bucket every event by ``floor(ts / window)``, explode one
side to its three adjacent buckets, equi-join on (bucket), then apply
the exact ``|ts_a - ts_b| <= window`` predicate.  The equi-join keys
make it a plain shuffle join — NO range/cross join — and each
qualifying pair is produced exactly once (the left side keeps its
single home bucket).  At 100 TB the shuffle is bounded by events per
window bucket: skew equals real temporal burstiness, which the window
parameter controls.
"""

from __future__ import annotations

from functools import reduce
from typing import Dict

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def correlate_events(
    sources: Dict[str, DataFrame],
    ts_col: str = "ts",
    id_col: str = "event_id",
    window_seconds: float = 60.0,
) -> DataFrame:
    """All cross-source event pairs within ``window_seconds`` of each
    other: ``(tag_a, id_a, ts_a, tag_b, id_b, ts_b)`` with
    ``tag_a < tag_b`` (each unordered pair once).

    ``sources`` maps a tag (the rule entry's tag/index name) to its
    matched-events frame carrying ``id_col`` + ``ts_col``."""
    if len(sources) < 2:
        raise ValueError("correlation needs at least two sources")
    w = float(window_seconds)
    tagged = reduce(
        DataFrame.unionByName,
        [
            df.select(
                F.lit(tag).alias("_tag"),
                F.col(id_col).alias("_id"),
                # epoch seconds; NTZ timestamps go via TIMESTAMP (the
                # session is pinned UTC) — Spark 4 forbids NTZ->double
                F.col(ts_col).cast("timestamp").cast("double").alias("_ts"),
            )
            for tag, df in sorted(sources.items())
        ],
    )
    bucket = (F.col("_ts") / F.lit(w)).cast("long")
    left = tagged.select(
        F.col("_tag").alias("tag_a"), F.col("_id").alias("id_a"),
        F.col("_ts").alias("ts_a"), bucket.alias("_b"),
    )
    right = tagged.select(
        F.col("_tag").alias("tag_b"), F.col("_id").alias("id_b"),
        F.col("_ts").alias("ts_b"),
        F.explode(F.array(bucket - 1, bucket, bucket + 1)).alias("_b"),
    )
    pairs = (
        left.join(right, "_b")
        .filter(F.col("tag_a") < F.col("tag_b"))
        .filter(F.abs(F.col("ts_a") - F.col("ts_b")) <= F.lit(w))
        .drop("_b")
    )
    return pairs


def correlated_ids(pairs: DataFrame, tag: str) -> DataFrame:
    """Distinct ids of ``tag``'s events that correlate with at least one
    event of another source (the rule-hit view: "these events have
    related events within the window")."""
    a = pairs.filter(F.col("tag_a") == tag).select(F.col("id_a").alias("id"))
    b = pairs.filter(F.col("tag_b") == tag).select(F.col("id_b").alias("id"))
    return a.unionByName(b).distinct()
