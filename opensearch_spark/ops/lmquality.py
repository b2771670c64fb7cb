"""CCNet-style language-model quality scoring for training-data
pipelines.

Published method: Wenzek et al. 2020, *CCNet: Extracting High Quality
Monolingual Datasets from Web Crawl Data* — score every document by
its (per-token) log-probability under a language model trained on a
trusted reference corpus, then split the corpus into head / middle /
tail quality buckets by score terciles.  CCNet uses a 5-gram KenLM;
this op keeps the identical pipeline shape with a bigram
stupid-backoff LM (Brants et al. 2007) so the whole path stays
exact-SQL-checkable (no model binary, no UDF):

    P(w2 | w1) = c(w1 w2) / c(w1)            when the bigram was seen
               = alpha * (c(w2) + 1) / (N + V)  backoff, add-one smoothed
                                                (OOV-safe: P > 0 always)

Scale shape: LM "training" is two map-side-combined count shuffles
over the reference corpus (bigram + unigram tables — DataFrames, not
driver state, so the reference can be arbitrarily large); scoring is
explode + two broadcast-or-shuffle joins against those count tables +
one per-doc aggregate.  Bucketing is an exact ``ntile(3)`` over
(score desc, id) — deterministic, no approximate percentiles.
"""

from __future__ import annotations

from typing import Tuple

from pyspark.sql import DataFrame, Window, functions as F

from opensearch_spark.ops.dedup import tokens_col


def _bigrams(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, w1, w2) rows — adjacent token pairs per document."""
    t = df.select(F.col(id_col), tokens_col(text_col).alias("_t"))
    n = F.size("_t")
    pairs = F.arrays_zip(
        F.slice("_t", 1, F.greatest(n - 1, F.lit(0))).alias("w1"),
        F.slice("_t", 2, F.greatest(n - 1, F.lit(0))).alias("w2"),
    )
    return (
        t.filter(n >= 2)
        .select(F.col(id_col), F.explode(pairs).alias("_p"))
        .select(id_col, F.col("_p.w1").alias("w1"), F.col("_p.w2").alias("w2"))
    )


def train_bigram_lm(
    ref_df: DataFrame, text_col: str = "text"
) -> Tuple[DataFrame, DataFrame, int, int]:
    """Reference corpus -> (bigram counts, unigram counts, N, V).

    Two count aggregations (the only reference-corpus passes); N =
    total token count, V = distinct vocabulary size (the add-one
    denominator).  Counts stay distributed — join them, don't collect.
    """
    toks = ref_df.select(F.explode(tokens_col(text_col)).alias("w"))
    uni = toks.groupBy("w").agg(F.count("*").alias("c1"))
    bi = (
        _bigrams(ref_df.select(F.lit(0).alias("_rid"), text_col), "_rid", text_col)
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("c12"))
    )
    totals = uni.agg(
        F.sum("c1").alias("n"), F.count("*").alias("v")
    ).collect()[0]
    return bi, uni, int(totals["n"] or 0), int(totals["v"] or 0)


def lm_scores(
    df: DataFrame,
    ref_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.4,
) -> DataFrame:
    """Per-doc LM quality: ``lm_logprob`` = mean log10 P over the doc's
    bigrams (docs with < 2 tokens score NULL), ``lm_bucket`` =
    head/middle/tail by exact score terciles (CCNet's split), ties and
    bucket boundaries fixed by (score desc, id asc)."""
    bi, uni, n_tokens, vocab = train_bigram_lm(ref_df, text_col)
    dg = _bigrams(df, id_col, text_col)
    joined = (
        dg.join(bi, ["w1", "w2"], "left")
        .join(uni.withColumnRenamed("w", "w1").withColumnRenamed("c1", "c_w1"), "w1", "left")
        .join(uni.withColumnRenamed("w", "w2").withColumnRenamed("c1", "c_w2"), "w2", "left")
    )
    p = F.when(
        F.col("c12").isNotNull() & F.col("c_w1").isNotNull(),
        F.col("c12").cast("double") / F.col("c_w1").cast("double"),
    ).otherwise(
        F.lit(float(alpha))
        * (F.coalesce(F.col("c_w2"), F.lit(0)).cast("double") + F.lit(1.0))
        / F.lit(float(n_tokens + vocab))
    )
    scored = joined.groupBy(id_col).agg(
        F.round(F.avg(F.log10(p)), 6).alias("lm_logprob")
    )
    base = df.select(id_col).join(scored, id_col, "left")
    # exact terciles via a global ntile window (single-partition sort —
    # fine for a per-slice driver op; at full corpus scale compute the
    # two tercile THRESHOLDS with one quantile job and bucket by
    # comparison instead, same labels)
    w = F.ntile(3).over(
        Window.orderBy(F.desc_nulls_last("lm_logprob"), F.asc(id_col))
    )
    return base.select(
        id_col,
        "lm_logprob",
        F.when(F.col("lm_logprob").isNull(), F.lit("short"))
        .otherwise(
            F.when(w == 1, F.lit("head"))
            .when(w == 2, F.lit("middle"))
            .otherwise(F.lit("tail"))
        )
        .alias("lm_bucket"),
    )
