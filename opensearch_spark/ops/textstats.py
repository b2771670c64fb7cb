"""Text analysis operators: token counting, quality scoring,
language-ID, document fingerprinting.

All transforms are deterministic column expressions over the standard
analyzer's token array (Arrow-batched UDF for tokenization, JVM
expressions for everything downstream), so they are exactly
reproducible — each has a SQL-expressible oracle.

Reference parity: the reference exposes per-value transforms as ingest
processors (``modules/ingest-common``; SURVEY.md §2.8) and token
counting as the ``token_count`` field type
(``index/mapper/TokenCountFieldMapper`` in mapper-extras); quality /
language heuristics are the standard training-data-pipeline additions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from opensearch_spark.analysis import analyzer as ana
from opensearch_spark.ops.dedup import tokens_col

# deterministic stopword list shared with the SQL oracles (subset of the
# Lucene English stop set that is cheap to inline in SQL)
QUALITY_STOPWORDS = sorted(ana.ENGLISH_STOP_WORDS)


# BPE-rate proxy: greedy <=4-char alnum chunks over the LOWERCASED
# text.  A deterministic, regex-only estimate of subword-tokenizer
# counts (~chars/4 for prose), identical under Java regex and RE2 so
# the SQL oracle reproduces it.
BPE_CHUNK_RE = "[a-z0-9]{1,4}"


def token_stats(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-doc token statistics: whitespace/analyzer token count,
    distinct count, mean token length (``token_count`` field-type
    semantics), plus ``n_subtokens`` — a BPE-ish subword estimate
    (greedy 4-char alnum chunking, the budget unit LLM training
    pipelines meter by)."""
    d = df.select(
        F.col(id_col), F.col(text_col).alias("_raw"), tokens_col(text_col).alias("_t")
    )
    n = F.size("_t")
    return d.select(
        id_col,
        n.cast("int").alias("n_tokens"),
        F.size(F.array_distinct("_t")).cast("int").alias("n_distinct"),
        F.round(
            F.when(
                n > 0,
                F.aggregate(
                    "_t", F.lit(0.0), lambda acc, t: acc + F.length(t)
                )
                / n.cast("double"),
            ).otherwise(F.lit(0.0)),
            4,
        ).alias("mean_token_len"),
        F.size(F.regexp_extract_all(F.lower(F.col("_raw")), F.lit(BPE_CHUNK_RE), 0))
        .cast("int")
        .alias("n_subtokens"),
    )


def quality_scores(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Heuristic quality scoring: stopword ratio, type-token ratio,
    length score — combined into one [0,1] score.  Pure arithmetic over
    the token array (deterministic; SQL-oracle-able)."""
    d = df.select(F.col(id_col), tokens_col(text_col).alias("_t"))
    n = F.size("_t").cast("double")
    stop_arr = F.array(*[F.lit(w) for w in QUALITY_STOPWORDS])
    n_stop = F.size(F.filter("_t", lambda t: F.array_contains(stop_arr, t))).cast("double")
    uniq = F.size(F.array_distinct("_t")).cast("double")
    stop_ratio = F.when(n > 0, n_stop / n).otherwise(F.lit(0.0))
    ttr = F.when(n > 0, uniq / n).otherwise(F.lit(0.0))
    len_score = F.least(n / F.lit(64.0), F.lit(1.0))
    score = F.lit(0.4) * len_score + F.lit(0.3) * ttr + F.lit(0.3) * (
        F.lit(1.0) - F.abs(stop_ratio - F.lit(0.4))
    )
    return d.select(
        id_col,
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(ttr, 6).alias("type_token_ratio"),
        F.round(len_score, 6).alias("length_score"),
        F.round(score, 6).alias("quality"),
    )


def language_id(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """N-gram-free language-ID heuristic: English function-word hit rate.

    Predicts ``en`` when >= 20% of tokens are English stopwords, else
    ``und`` (undetermined).  Deliberately simple so the exact decision
    boundary is SQL-replicable; a production pipeline would swap in a
    char-n-gram Naive Bayes with the same DataFrame shape.
    """
    d = df.select(F.col(id_col), tokens_col(text_col).alias("_t"))
    n = F.size("_t").cast("double")
    stop_arr = F.array(*[F.lit(w) for w in QUALITY_STOPWORDS])
    hit = F.size(F.filter("_t", lambda t: F.array_contains(stop_arr, t))).cast("double")
    rate = F.when(n > 0, hit / n).otherwise(F.lit(0.0))
    return d.select(
        id_col,
        F.round(rate, 6).alias("en_rate"),
        F.when(rate >= 0.2, F.lit("en")).otherwise(F.lit("und")).alias("pred_lang"),
    )


def _langid_profiles() -> dict:
    """Language -> function-word set, drawn from the snowball stop
    lists the analysis chain already ships (analysis/analyzer.py).
    Stopword-profile language-ID (the classic function-word variant of
    Cavnar-Trenkle profiling): function words are the highest-frequency
    tokens of each language, so DISTINCT stop-word hits separate
    languages sharply on running text while staying exact-SQL-checkable
    (no model weights)."""
    from opensearch_spark.analysis import analyzer as _a

    return {
        "da": _a.DANISH_STOP_WORDS,
        "de": _a.GERMAN_STOP_WORDS,
        "en": _a.ENGLISH_STOP_WORDS,
        "es": _a.SPANISH_STOP_WORDS,
        "fi": _a.FINNISH_STOP_WORDS,
        "fr": _a.FRENCH_STOP_WORDS,
        "it": _a.ITALIAN_STOP_WORDS,
        "nl": _a.DUTCH_STOP_WORDS,
        "no": _a.NORWEGIAN_STOP_WORDS,
        "pt": _a.PORTUGUESE_STOP_WORDS,
        "ru": _a.RUSSIAN_STOP_WORDS,
        "sv": _a.SWEDISH_STOP_WORDS,
    }


def language_id_multi(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_hits: int = 2,
) -> DataFrame:
    """Multilingual language-ID over the 12 shipped stopword profiles.

    Score per language = number of DISTINCT profile words present in
    the doc (set semantics — SQL twin is
    ``len(list_intersect(list_distinct(toks), profile))``).  Prediction
    = highest score, ties to the lexicographically GREATEST language
    code (the deterministic ``array_max`` struct ordering), ``und``
    when the best score is below ``min_hits``.  One shuffle-free
    columnar pass: 12 ``array_intersect`` expressions over one token
    array, no UDF, no join — the shape that holds at corpus scale.
    """
    profiles = _langid_profiles()
    d = df.select(
        F.col(id_col), F.array_distinct(tokens_col(text_col)).alias("_u")
    )
    scored = F.array_max(
        F.array(
            *[
                F.struct(
                    F.size(
                        F.array_intersect(
                            "_u", F.array(*[F.lit(w) for w in sorted(ws)])
                        )
                    ).alias("hits"),
                    F.lit(lang).alias("lang"),
                )
                for lang, ws in sorted(profiles.items())
            ]
        )
    )
    return d.select(id_col, scored.alias("_best")).select(
        id_col,
        F.col("_best.hits").cast("int").alias("lang_hits"),
        F.when(F.col("_best.hits") >= int(min_hits), F.col("_best.lang"))
        .otherwise(F.lit("und"))
        .alias("pred_lang_multi"),
    )


def fingerprints(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """OpenRefine-style fingerprint key: md5 of the sorted distinct
    token set — a normalization-robust dedup key (token order,
    repetition and whitespace insensitive)."""
    d = df.select(F.col(id_col), tokens_col(text_col).alias("_t"))
    key = F.md5(
        F.array_join(F.array_sort(F.array_distinct("_t")), " ").cast("binary")
    )
    return d.select(id_col, key.alias("fingerprint"))


def text_profile(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """All four text-analysis profiles in ONE pass — token statistics,
    quality scoring, language-ID, fingerprint — from a single tokenizer
    evaluation (the Arrow-batched UDF output is materialized once per
    row, every downstream column is JVM-side arithmetic over it).  At
    100 TB this is one corpus scan instead of four scans and three
    id-joins; the per-op functions above remain for à-la-carte use and
    produce column-identical results (pinned by text_suite's oracle)."""
    d = df.select(
        F.col(id_col), F.col(text_col).alias("_raw"), tokens_col(text_col).alias("_t")
    )
    n = F.size("_t")
    n_d = n.cast("double")
    uniq = F.size(F.array_distinct("_t"))
    stop_arr = F.array(*[F.lit(w) for w in QUALITY_STOPWORDS])
    n_stop = F.size(F.filter("_t", lambda t: F.array_contains(stop_arr, t))).cast("double")
    stop_ratio = F.when(n_d > 0, n_stop / n_d).otherwise(F.lit(0.0))
    ttr = F.when(n_d > 0, uniq.cast("double") / n_d).otherwise(F.lit(0.0))
    len_score = F.least(n_d / F.lit(64.0), F.lit(1.0))
    score = F.lit(0.4) * len_score + F.lit(0.3) * ttr + F.lit(0.3) * (
        F.lit(1.0) - F.abs(stop_ratio - F.lit(0.4))
    )
    return d.select(
        id_col,
        n.cast("int").alias("n_tokens"),
        uniq.cast("int").alias("n_distinct"),
        F.round(
            F.when(
                n > 0,
                F.aggregate("_t", F.lit(0.0), lambda acc, t: acc + F.length(t))
                / n_d,
            ).otherwise(F.lit(0.0)),
            4,
        ).alias("mean_token_len"),
        F.size(F.regexp_extract_all(F.lower(F.col("_raw")), F.lit(BPE_CHUNK_RE), 0))
        .cast("int")
        .alias("n_subtokens"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(ttr, 6).alias("type_token_ratio"),
        F.round(len_score, 6).alias("length_score"),
        F.round(score, 6).alias("quality"),
        F.round(stop_ratio, 6).alias("en_rate"),
        F.when(stop_ratio >= 0.2, F.lit("en")).otherwise(F.lit("und")).alias("pred_lang"),
        F.md5(
            F.array_join(F.array_sort(F.array_distinct("_t")), " ").cast("binary")
        ).alias("fingerprint"),
    )


def repetition_signals(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_ns: tuple = (2, 3, 4),
    dup_ns: tuple = (5,),
) -> DataFrame:
    """Gopher-style within-document repetition signals (Rae et al.
    2021, "Scaling Language Models", Table A1 — the published
    training-data repetition filters):

    - ``topN_frac`` for each n in ``top_ns``: characters claimed by
      the single heaviest word n-gram — ``max over grams of
      count(gram) * char_len(gram) / total_token_chars`` (the max is
      taken over the product, which makes ties deterministic without
      an arbitrary gram pick).
    - ``dupN_frac`` for each n in ``dup_ns``: characters in REPEATED
      occurrences of duplicated n-grams — ``sum over grams with
      count > 1 of (count - 1) * char_len(gram) / total_token_chars``
      (documented deviation: Gopher counts characters *covered* by
      duplicate n-grams once; the excess-occurrence form is
      overlap-free, deterministic, and exactly SQL-replicable).
    - ``adj_rep_frac``: fraction of tokens equal to their predecessor
      (catches "batch batch batch" runs below any n-gram horizon).

    Whitespace tokens (the oracle-pinned split), pure JVM: one
    explode + groupBy(doc, n, gram) shuffle with map-side partial
    aggregation, then one per-doc rollup — no Python in the path, so
    the plan whole-stage-codegens and scales with token volume.
    ``char_len(gram)`` = ``length(gram) - (n - 1)`` (single-space
    joins over space-free tokens)."""
    toks = F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
    d = df.select(
        F.col(id_col),
        toks.alias("_t"),
        F.aggregate(
            toks, F.lit(0), lambda acc, x: acc + F.length(x)
        ).cast("double").alias("_chars"),
    )
    grams = None
    for n in sorted(set(top_ns) | set(dup_ns)):
        g = d.select(
            id_col,
            F.lit(n).alias("_n"),
            F.explode(
                F.expr(
                    f"CASE WHEN size(_t) >= {n} THEN"
                    f" transform(sequence(1, size(_t) - {n - 1}),"
                    f" i -> array_join(slice(_t, i, {n}), ' '))"
                    " ELSE array() END"
                )
            ).alias("_g"),
        )
        grams = g if grams is None else grams.unionByName(g)
    counts = grams.groupBy(id_col, "_n", "_g").agg(F.count("*").alias("_c"))
    glen = F.length("_g") - F.col("_n") + 1
    sig = counts.groupBy(id_col).agg(
        *[
            F.max(F.when(F.col("_n") == n, F.col("_c") * glen)).alias(f"_top{n}")
            for n in sorted(top_ns)
        ],
        *[
            F.sum(
                F.when(
                    (F.col("_n") == n) & (F.col("_c") > 1),
                    (F.col("_c") - 1) * glen,
                )
            ).alias(f"_dup{n}")
            for n in sorted(dup_ns)
        ],
    )
    adj = d.select(
        id_col,
        F.col("_chars"),
        F.size("_t").alias("_nt"),
        F.when(
            F.size("_t") >= 2,
            F.expr(
                "size(filter(sequence(2, size(_t)),"
                " i -> element_at(_t, i) = element_at(_t, i - 1)))"
            ),
        ).otherwise(F.lit(0)).cast("double").alias("_adj"),
    )
    out = adj.join(sig, id_col, "left")
    safe = F.when(F.col("_chars") > 0, F.col("_chars")).otherwise(F.lit(1.0))
    cols = [F.col(id_col)]
    for n in sorted(top_ns):
        cols.append(
            F.round(
                F.coalesce(F.col(f"_top{n}"), F.lit(0)).cast("double") / safe, 6
            ).alias(f"top{n}_frac")
        )
    for n in sorted(dup_ns):
        cols.append(
            F.round(
                F.coalesce(F.col(f"_dup{n}"), F.lit(0)).cast("double") / safe, 6
            ).alias(f"dup{n}_frac")
        )
    cols.append(
        F.round(
            F.when(F.col("_nt") > 1, F.col("_adj") / (F.col("_nt") - 1))
            .otherwise(F.lit(0.0)),
            6,
        ).alias("adj_rep_frac")
    )
    return out.select(*cols)


# PII patterns shared with the SQL oracle: Java-regex / RE2 common
# subset (no lookaround, no backrefs).  Order matters — SSN before
# phone (an SSN body also parses as a phone), and replacements emit
# digit-free tags so later patterns cannot re-match them.
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"),
    ("phone", r"\b\+?\d[\d\- ]{8,14}\d\b"),
)


def pii_scrub(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """PII redaction over raw text — the standard pre-training scrub
    pass: emails, SSN-shaped ids, IPv4 addresses and phone-shaped
    number runs are replaced by ``<KIND>`` tags, with a per-kind match
    count.  Sequential ``regexp_replace`` chain (JVM regex, one
    projection, no shuffle); the pattern list is the Java/RE2 common
    subset so a SQL oracle replays it byte-identically.

    Returns ``(id, scrubbed, n_email, n_ssn, n_ipv4, n_phone)``."""
    scrubbed = F.col(text_col)
    counts = []
    for name, pat in PII_PATTERNS:
        counts.append(
            F.regexp_count(scrubbed, F.lit(pat)).cast("int").alias(f"n_{name}")
        )
        scrubbed = F.regexp_replace(scrubbed, pat, f"<{name.upper()}>")
    return df.select(F.col(id_col), scrubbed.alias("scrubbed"), *counts)


def pack_shards(
    df: DataFrame,
    token_budget: int,
    id_col: str = "doc_id",
    tokens_col_name: str = "n_tokens",
    n_stripes: int = 8,
) -> DataFrame:
    """Training-shard document packing (concat-then-chunk): documents
    are laid head-to-tail on a token tape in a deterministic order and
    the tape is cut every ``token_budget`` tokens — the standard
    LLM-pretraining packing step.  Appends three columns:
    ``shard_id`` (which shard the doc STARTS in), ``shard_pos``
    (token offset inside that shard), ``spills`` (1 when the doc
    crosses a shard boundary and its tail flows into the next shard).

    Scale design: tape order is ``(stripe, id)`` with
    ``stripe = id mod n_stripes`` — a deterministic interleave that
    needs NO global sort and NO sampled range boundaries (training
    pipelines shuffle documents before packing anyway, so any fixed
    deterministic order is valid).  The prefix sum is two-phase like
    the builder's docID assignment: a per-stripe window cumsum (hash
    shuffle on the stripe key) plus ``n_stripes`` driver-side offsets
    collected from a tiny aggregate and inlined as CASE literals — no
    single-partition global window at any size.
    """
    if token_budget <= 0:
        raise ValueError(f"token_budget must be positive, got {token_budget}")
    from pyspark.sql import Window

    b = F.pmod(F.col(id_col).cast("long"), F.lit(int(n_stripes)))
    tagged = df.withColumn("_stripe", b)
    totals = {
        int(r["_stripe"]): int(r["t"])
        for r in tagged.groupBy("_stripe")
        .agg(F.sum(F.col(tokens_col_name).cast("long")).alias("t"))
        .collect()
    }
    acc = 0
    off = {}
    for s in sorted(totals):
        off[s] = acc
        acc += totals[s]
    off_expr = F.lit(0).cast("long")
    for s, v in off.items():
        off_expr = F.when(F.col("_stripe") == s, F.lit(v).cast("long")).otherwise(
            off_expr
        )
    w = (
        Window.partitionBy("_stripe")
        .orderBy(F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = (
        F.coalesce(F.sum(F.col(tokens_col_name).cast("long")).over(w), F.lit(0))
        + off_expr
    ).alias("_cum")
    out = tagged.withColumn("_cum", cum)
    B = int(token_budget)
    return (
        out.withColumn("shard_id", F.expr(f"_cum div {B}"))
        .withColumn("shard_pos", F.pmod(F.col("_cum"), F.lit(B)).cast("long"))
        .withColumn(
            "spills",
            F.when(
                (F.col(tokens_col_name) > 0)
                & F.expr(
                    f"(_cum + cast({tokens_col_name} as long) - 1) div {B}"
                    f" > _cum div {B}"
                ),
                F.lit(1),
            )
            .otherwise(F.lit(0))
            .cast("int"),
        )
        .drop("_stripe", "_cum")
    )
