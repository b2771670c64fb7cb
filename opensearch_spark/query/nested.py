"""Nested / parent-child queries and aggregations (SURVEY.md §2.2).

The reference stores ``nested`` fields as hidden sub-documents and
joins them back at query time with a block join
(``NestedQueryBuilder.java:508``, ``OpenSearchToParentBlockJoinQuery``);
``has_child``/``has_parent`` live in the parent-join module.  The
engine's only real joins.

Spark mapping: a nested field IS an ``array<struct>`` column — the
block join is ``explode`` + ``groupBy(parent)``; parent-child across
two frames is a plain aggregate-then-join.  ``score_mode``
(avg/sum/min/max/none) is the grouped aggregate choice.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MODES = {
    "avg": F.avg,
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
}


def nest(df: DataFrame, parent_cols, struct_cols, nested_col: str = "children") -> DataFrame:
    """Materialize a nested table: one row per parent with an
    ``array<struct>`` of its children (how a nested mapping lays out)."""
    return df.groupBy(*parent_cols).agg(
        F.collect_list(F.struct(*struct_cols)).alias(nested_col)
    )


def nested_query(
    nested_df: DataFrame,
    parent_cols,
    child_pred: Column,
    nested_col: str = "children",
    score_expr: Optional[Column] = None,
    score_mode: str = "sum",
) -> DataFrame:
    """``nested`` query: parents with >= 1 matching child; score combines
    matching children's scores per ``score_mode``
    (NestedQueryBuilder.java score_mode avg/sum/min/max/none)."""
    exploded = nested_df.select(
        *parent_cols, F.explode(nested_col).alias("_child")
    ).filter(child_pred)
    if score_mode == "none" or score_expr is None:
        return (
            exploded.groupBy(*parent_cols)
            .agg(F.count(F.lit(1)).alias("matched_children"))
            .withColumn("score", F.lit(1.0))
        )
    agg = _MODES[score_mode](score_expr.cast("double")).alias("score")
    return exploded.groupBy(*parent_cols).agg(
        agg, F.count(F.lit(1)).alias("matched_children")
    )


def has_child(
    parents: DataFrame,
    children: DataFrame,
    join_cols,
    child_pred: Column,
    score_expr: Optional[Column] = None,
    score_mode: str = "sum",
    min_children: int = 1,
    max_children: Optional[int] = None,
) -> DataFrame:
    """``has_child`` (parent-join module): parents whose child set has
    min_children..max_children matches; score from children per mode."""
    matched = children.filter(child_pred)
    aggs = [F.count(F.lit(1)).alias("matched_children")]
    if score_expr is not None and score_mode != "none":
        aggs.append(_MODES[score_mode](score_expr.cast("double")).alias("score"))
    grouped = matched.groupBy(*join_cols).agg(*aggs)
    grouped = grouped.filter(F.col("matched_children") >= min_children)
    if max_children is not None:
        grouped = grouped.filter(F.col("matched_children") <= max_children)
    if "score" not in grouped.columns:
        grouped = grouped.withColumn("score", F.lit(1.0))
    return parents.join(grouped, list(join_cols))


def has_parent(
    parents: DataFrame,
    children: DataFrame,
    join_cols,
    parent_pred: Column,
    score_expr: Optional[Column] = None,
    score: bool = False,
) -> DataFrame:
    """``has_parent`` (parent-join module, HasParentQueryBuilder.java):
    children whose parent matches the inner query.  ``score=false``
    (the reference default) gives constant 1.0; ``score=true``
    propagates the parent's score to every child
    (ParentConstantScoreQuery vs ParentQuery).  One equi-join on the
    parent key — Catalyst broadcasts the matched-parent side when it is
    small (the usual case: parents are the filtered dimension)."""
    matched = parents.filter(parent_pred)
    if score and score_expr is not None:
        sel = matched.select(*join_cols, score_expr.cast("double").alias("score"))
    else:
        sel = matched.select(*join_cols).withColumn("score", F.lit(1.0))
    return children.join(sel, list(join_cols))


def reverse_nested_agg(
    nested_df: DataFrame,
    parent_cols,
    child_pred: Column,
    parent_agg_col: str,
    nested_col: str = "children",
) -> DataFrame:
    """``reverse_nested`` (NestedAggregationBuilder.java): bucket by a
    child-level predicate, aggregate back at the parent level — i.e.
    count PARENTS (not children) per bucket."""
    exploded = nested_df.select(
        *parent_cols, F.col(parent_agg_col), F.explode(nested_col).alias("_child")
    ).filter(child_pred)
    parents = exploded.select(*parent_cols, parent_agg_col).distinct()
    return (
        parents.groupBy(F.col(parent_agg_col).alias("key"))
        .agg(F.count(F.lit(1)).alias("doc_count"))
        .orderBy(F.desc("doc_count"), F.asc("key"))
    )


def nested_sort_key(
    nested_col,
    value,
    child_filter=None,
    mode: str = "min",
) -> Column:
    """Sort key for a nested-field sort (FieldSortBuilder.java ``nested``
    context + ``sort_mode``; value selection semantics are
    MultiValueMode.java MIN/MAX/SUM/AVG/MEDIAN:236-261 — MEDIAN over
    the SORTED child values, averaging the two middles on even counts).

    ``nested_col`` is the ``array<struct>`` column (or name);
    ``child_filter`` is the optional nested filter as a lambda
    ``struct -> Column``; ``value`` is a lambda ``struct -> Column``
    extracting the sort value.  Parents with no matching children get
    NULL — compose with ``F.asc_nulls_last`` / ``F.desc_nulls_first``
    etc. to express the reference's ``missing: _last/_first`` policy
    (its defaults: _last for asc, _first effectively for desc).

    Scale: pure per-row JVM higher-order functions (filter/transform/
    array_min/aggregate) — no explode, no shuffle, stays inside
    whole-stage codegen; the block-join the reference performs is a
    per-document lambda here."""
    arr = F.col(nested_col) if isinstance(nested_col, str) else nested_col
    if child_filter is not None:
        arr = F.filter(arr, child_filter)
    vals = F.transform(arr, lambda x: value(x).cast("double"))
    n = F.size(vals)
    if mode == "min":
        key = F.array_min(vals)
    elif mode == "max":
        key = F.array_max(vals)
    elif mode == "sum":
        key = F.aggregate(vals, F.lit(0.0), lambda a, x: a + x)
    elif mode == "avg":
        key = F.aggregate(vals, F.lit(0.0), lambda a, x: a + x) / n
    elif mode == "median":
        s = F.array_sort(vals)
        mid_hi = F.element_at(s, (n / 2 + 1).cast("int"))
        mid_lo = F.element_at(s, ((n + 1) / 2).cast("int"))
        key = (mid_lo + mid_hi) / F.lit(2.0)
    else:
        raise ValueError(f"unsupported sort_mode {mode!r}")
    return F.when(n > 0, key)
