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

from typing import Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rank_eval(
    hits: DataFrame,
    ratings: DataFrame,
    k: int = 10,
    relevant_threshold: int = 1,
    max_relevance: Optional[int] = None,
) -> DataFrame:
    """Per-query metrics as a long ``(query_id, metric, value)`` frame
    (metrics: precision, recall, mean_reciprocal_rank, dcg, ndcg; plus
    ``err`` when ``max_relevance`` is set — ExpectedReciprocalRank.java
    / Chapelle et al. 2009: probR(g) = (2^g - 1) / 2^max_relevance,
    err = sum_r p_r * probR(g_r) / r with p updating only on RATED
    hits (unrated docs advance the rank but are skipped, the
    unknown_doc_rating=null behavior); computed as a rank-ordered JVM
    array fold — no Python, no extra shuffle)."""
    h = hits.filter(F.col("rank") <= F.lit(int(k)))
    j = h.join(ratings, ["query_id", "doc_id"], "left")
    rel = F.col("rating") >= F.lit(int(relevant_threshold))
    aggs = [
        F.count(F.lit(1)).cast("double").alias("retrieved"),
        F.sum(F.when(rel, 1).otherwise(0)).cast("double").alias("rel_ret"),
        F.min(F.when(rel, F.col("rank"))).cast("double").alias("first_rel"),
        F.sum(
            (F.pow(F.lit(2.0), F.col("rating")) - 1)
            / F.log2(F.col("rank").cast("double") + 1)
        ).alias("dcg"),  # null ratings drop out of the sum (unrated skipped)
    ]
    if max_relevance is not None:
        two_pow = float(2 ** int(max_relevance))
        pairs = F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("rank").cast("double").alias("r"),
                    F.col("rating").cast("double").alias("g"),
                )
            )
        )

        def _step(acc, x):
            prob = (F.pow(F.lit(2.0), x["g"]) - F.lit(1.0)) / F.lit(two_pow)
            rated = x["g"].isNotNull()
            return F.struct(
                F.when(rated, acc["p"] * (F.lit(1.0) - prob))
                .otherwise(acc["p"])
                .alias("p"),
                F.when(rated, acc["e"] + acc["p"] * prob / x["r"])
                .otherwise(acc["e"])
                .alias("e"),
            )

        aggs.append(
            F.aggregate(
                pairs,
                F.struct(F.lit(1.0).alias("p"), F.lit(0.0).alias("e")),
                _step,
                lambda a: a["e"],
            ).alias("err")
        )
    per = j.groupBy("query_id").agg(*aggs)
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
            *(
                [F.coalesce(F.col("err"), F.lit(0.0)).alias("err")]
                if max_relevance is not None
                else []
            ),
        )
    )
    metrics = ["precision", "recall", "mean_reciprocal_rank", "dcg", "ndcg"]
    if max_relevance is not None:
        metrics.append("err")
    stack = ", ".join(f"'{m}', `{m}`" for m in metrics)
    return out.selectExpr(
        "query_id", f"stack({len(metrics)}, {stack}) as (metric, value)"
    )
