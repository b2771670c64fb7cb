"""Hybrid lexical + vector retrieval with reciprocal rank fusion.

OpenSearch's hybrid/neural search combines BM25 hits with k-NN hits;
RRF (``score = sum_i 1/(k + rank_i)``, k=60 default) is the standard
score-scale-free fusion.  Here both legs are DataFrames of ranked ids,
so fusion is a union + groupBy — no score normalization needed, fully
deterministic (ranks come from the legs' own tie-broken orderings).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RRF_K = 60


def rrf_fuse(
    ranked_lists: Sequence[DataFrame],
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k: int = RRF_K,
    size: int = 10,
) -> DataFrame:
    """Fuse ranked lists: ``(id, rrf_score)`` ordered desc with id
    tie-break.  Each input needs (id_col, rank_col) with rank starting
    at 1; an id absent from a list simply contributes nothing."""
    contribs = [
        df.select(
            F.col(id_col),
            (F.lit(1.0) / (F.lit(float(k)) + F.col(rank_col).cast("double"))).alias("_c"),
        )
        for df in ranked_lists
    ]
    unioned = contribs[0]
    for c in contribs[1:]:
        unioned = unioned.unionByName(c)
    return (
        unioned.groupBy(id_col)
        .agg(F.round(F.sum("_c"), 6).alias("rrf_score"))
        .orderBy(F.desc("rrf_score"), F.asc(id_col))
        .limit(size)
    )
