"""Search quality evaluation — the ``rank-eval`` module analog
(``modules/rank-eval``: RankEvalSpec/RatedRequest + the metric set
PrecisionAtK.java, RecallAtK.java, MeanReciprocalRank.java,
DiscountedCumulativeGain.java).

The reference evaluates each rated request's hits coordinator-side;
the Spark-native shape is two frames joined per query — ``hits``
(query_id, rank, doc_id), produced by any search surface, and
``ratings`` (query_id, doc_id, rating) — with every metric a grouped
Catalyst aggregate (no Python in the loop, scales to millions of rated
queries):

- precision@k = relevant_retrieved / retrieved (unrated hits count in
  the denominator — PrecisionAtK's default ignore_unlabeled=false);
- recall@k    = relevant_retrieved / total_relevant;
- mean_reciprocal_rank = 1 / rank of the first hit with
  rating >= relevant_threshold, else 0 (MeanReciprocalRank.java:128);
- dcg@k = sum over RATED hits of (2^rating - 1) / log2(rank + 1)
  (DiscountedCumulativeGain.computeDCG; unrated hits are skipped);
- ndcg@k = dcg / ideal-dcg over the query's ratings sorted desc.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rank_eval(
    hits: DataFrame,
    ratings: DataFrame,
    k: int = 10,
    relevant_threshold: int = 1,
) -> DataFrame:
    """Per-query metrics as a long ``(query_id, metric, value)`` frame
    (metrics: precision, recall, mean_reciprocal_rank, dcg, ndcg)."""
    h = hits.filter(F.col("rank") <= F.lit(int(k)))
    j = h.join(ratings, ["query_id", "doc_id"], "left")
    rel = F.col("rating") >= F.lit(int(relevant_threshold))
    per = j.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("double").alias("retrieved"),
        F.sum(F.when(rel, 1).otherwise(0)).cast("double").alias("rel_ret"),
        F.min(F.when(rel, F.col("rank"))).cast("double").alias("first_rel"),
        F.sum(
            (F.pow(F.lit(2.0), F.col("rating")) - 1)
            / F.log2(F.col("rank").cast("double") + 1)
        ).alias("dcg"),  # null ratings drop out of the sum (unrated skipped)
    )
    n_rel = (
        ratings.filter(rel)
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).cast("double").alias("n_rel"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("rating"), F.asc("doc_id")
    )
    idcg = (
        ratings.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= F.lit(int(k)))
        .groupBy("query_id")
        .agg(
            F.sum(
                (F.pow(F.lit(2.0), F.col("rating")) - 1)
                / F.log2(F.col("_rn").cast("double") + 1)
            ).alias("idcg")
        )
    )
    # every query id present in EITHER frame gets metric rows — a rated
    # request with zero hits reports zeroed metrics (the reference's
    # RankEvalResponse lists every rated request), never a silent gap
    qids = (
        hits.select("query_id")
        .unionByName(ratings.select("query_id"))
        .distinct()
    )
    out = (
        qids.join(per, "query_id", "left")
        .join(n_rel, "query_id", "left")
        .join(idcg, "query_id", "left")
        .select(
            "query_id",
            F.when(
                F.coalesce(F.col("retrieved"), F.lit(0.0)) > 0,
                F.col("rel_ret") / F.col("retrieved"),
            )
            .otherwise(F.lit(0.0))
            .alias("precision"),
            F.when(
                F.coalesce(F.col("n_rel"), F.lit(0.0)) > 0,
                F.col("rel_ret") / F.col("n_rel"),
            )
            .otherwise(F.lit(0.0))
            .alias("recall"),
            F.coalesce(1.0 / F.col("first_rel"), F.lit(0.0)).alias(
                "mean_reciprocal_rank"
            ),
            F.coalesce(F.col("dcg"), F.lit(0.0)).alias("dcg"),
            F.when(
                F.coalesce(F.col("idcg"), F.lit(0.0)) > 0,
                F.coalesce(F.col("dcg"), F.lit(0.0)) / F.col("idcg"),
            )
            .otherwise(F.lit(0.0))
            .alias("ndcg"),
        )
    )
    stack = ", ".join(
        f"'{m}', `{m}`"
        for m in ("precision", "recall", "mean_reciprocal_rank", "dcg", "ndcg")
    )
    return out.selectExpr(
        "query_id", f"stack(5, {stack}) as (metric, value)"
    )
