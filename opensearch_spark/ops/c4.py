"""C4-style corpus cleaning operators (Raffel et al. 2020, §2.2 —
the "Colossal Clean Crawled Corpus" heuristics), Spark-first.

Two operator families, both pure JVM column expressions / relational
plans (no Python in any executed plan):

- :func:`line_filters` — the C4 LINE- and PAGE-level keep rules over a
  pre-split array-of-lines column: a line survives iff it ends in
  terminal punctuation, has >= ``min_words`` words, and does not
  mention "javascript"; the page survives iff >= ``min_kept`` lines
  survive and the raw page contains neither a curly brace nor the
  phrase "lorem ipsum".
- :func:`span_dedup` — C4's corpus-level THREE-SENTENCE-SPAN
  deduplication: any span of ``span_sents`` consecutive sentences that
  occurs more than once in the whole corpus is removed from every
  occurrence except the first (first = smallest ``(doc_id, position)``).
  This is the one dedup granularity the repo's family (exact doc /
  MinHash / SimHash / n-gram Jaccard / embedding — ``ops/dedup.py``)
  did not yet cover: sub-document, corpus-global.

Reference parity note: the reference engine has no training-data
cleaning surface — these are the published pipeline additions the
task brief makes first-class (alongside Gopher repetition signals and
PII scrubbing in ``ops/textstats.py``).

100 TB shape: ``line_filters`` is embarrassingly parallel (zero
shuffles — per-row array expressions only).  ``span_dedup`` shuffles
(1) span-hash -> first-occurrence groupBy, (2) the duplicate-coverage
distinct, (3) the coverage join back to sentences, (4) the final
per-doc rollup — every key is either a span hash (uniform by
construction, md5) or ``(doc_id, sent_idx)`` (unique), so no skew;
shuffle volume is linear in sentence count and the span->first map
could be broadcast below ~100M duplicate spans.  No window over the
whole corpus, no driver collect.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# C4's terminal punctuation set (Raffel et al. §2.2 "ending in a
# terminal punctuation mark (i.e. a period, exclamation mark, question
# mark, or end quotation mark)").
TERMINAL_PUNCT = (".", "!", "?", '"')

_LINE_BAD_TOKEN = "javascript"
_PAGE_BAD_SUBSTRINGS = ("{", "lorem ipsum")


def _line_keep(line: Column, min_words: int) -> Column:
    """C4 line-keep predicate as one JVM boolean expression."""
    trimmed = F.trim(line)
    last = F.substring(trimmed, -1, 1)
    ends_ok = last.isin(*TERMINAL_PUNCT)
    n_words = F.size(F.filter(F.split(trimmed, r"\s+"), lambda t: t != F.lit("")))
    no_js = ~F.lower(trimmed).contains(_LINE_BAD_TOKEN)
    return ends_ok & (n_words >= F.lit(min_words)) & no_js


def line_filters(
    df: DataFrame,
    id_col: str = "doc_id",
    lines_col: str = "lines",
    min_words: int = 5,
    min_kept: int = 3,
) -> DataFrame:
    """Apply the C4 line+page keep rules to an array-of-lines column.

    Returns one row per input row:
    ``(id_col, n_lines, n_kept, kept_frac, page_kept, c4_fp)`` where
    ``c4_fp`` is ``md5`` of the kept lines joined by ``'\\n'`` (the
    cleaned-page fingerprint — cheap to oracle, stable to compare).

    Zero shuffles: every output column is a per-row expression over the
    lines array, so the plan is a single whole-stage-codegen project.
    """
    lines = F.col(lines_col)
    kept = F.filter(lines, lambda ln: _line_keep(ln, min_words))
    raw = F.lower(F.concat_ws("\n", lines))
    page_bad = F.lit(False)
    for sub in _PAGE_BAD_SUBSTRINGS:
        page_bad = page_bad | raw.contains(sub)
    n_lines = F.size(lines)
    n_kept = F.size(kept)
    return df.select(
        F.col(id_col),
        n_lines.cast("int").alias("n_lines"),
        n_kept.cast("int").alias("n_kept"),
        F.round(
            F.when(n_lines > 0, n_kept.cast("double") / n_lines).otherwise(F.lit(0.0)),
            6,
        ).alias("kept_frac"),
        ((n_kept >= F.lit(min_kept)) & ~page_bad).cast("int").alias("page_kept"),
        F.md5(F.concat_ws("\n", kept)).alias("c4_fp"),
    )


def span_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    sents_col: str = "sents",
    span_sents: int = 3,
) -> DataFrame:
    """C4 three-sentence-span corpus deduplication over an
    array-of-sentences column.

    Every window of ``span_sents`` consecutive sentences is hashed; a
    hash occurring more than once corpus-wide keeps only its FIRST
    occurrence (ordered by ``(doc_id, span_position)``) — the
    sentences under every other occurrence are removed.  A sentence
    covered by any duplicate window is removed exactly once (coverage
    union).

    Returns one row per doc:
    ``(id_col, n_sents, n_removed, span_kept_frac, span_fp)`` with
    ``span_fp`` = md5 of the SURVIVING sentences in original order
    joined by ``'\\n'``.

    Plan shape (scale notes in the module docstring): spans explode ->
    groupBy(hash) for (count, first-occurrence) -> duplicates join
    back -> coverage explode+distinct -> anti-ish join to sentences ->
    per-doc rollup.  All keys uniform or unique; no Python.
    """
    k = span_sents
    base = df.select(F.col(id_col).alias("__id"), F.col(sents_col).alias("__sents"))
    # Span hashes; docs shorter than k sentences contribute none.  The
    # span key joins sentences with '\x01' so adjacent-sentence
    # boundaries cannot alias under concatenation.
    spans = F.when(
        F.size("__sents") >= F.lit(k),
        F.transform(
            F.sequence(F.lit(0), F.size("__sents") - F.lit(k)),
            lambda i: F.md5(F.concat_ws("\x01", F.slice("__sents", i + 1, k))),
        ),
    ).otherwise(F.array().cast("array<string>"))
    occ = base.select("__id", F.posexplode(spans).alias("__i", "__h"))
    firsts = occ.groupBy("__h").agg(
        F.count(F.lit(1)).alias("__cnt"),
        F.min(F.struct("__id", "__i")).alias("__first"),
    )
    dup_occ = (
        occ.join(firsts.filter(F.col("__cnt") > 1), "__h")
        .filter(
            ~(
                (F.col("__id") == F.col("__first.__id"))
                & (F.col("__i") == F.col("__first.__i"))
            )
        )
        .select(
            "__id",
            F.explode(F.sequence(F.col("__i"), F.col("__i") + F.lit(k - 1))).alias(
                "__si"
            ),
        )
        .distinct()
    )
    sent_rows = base.select(
        "__id", F.posexplode("__sents").alias("__si", "__sent")
    )
    kept = (
        sent_rows.join(
            dup_occ.withColumn("__rm", F.lit(1)), ["__id", "__si"], "left"
        )
        .groupBy("__id")
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum(F.when(F.col("__rm").isNotNull(), 1).otherwise(0)).alias(
                "__removed"
            ),
            F.concat_ws(
                "\n",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("__rm").isNull(),
                                F.struct("__si", "__sent"),
                            )
                        )
                    ),
                    lambda s: s.getField("__sent"),
                ),
            ).alias("__kepttext"),
        )
    )
    # docs with zero sentences never reach sent_rows; restore them
    out = (
        base.select("__id", F.size("__sents").alias("n_sents"))
        .join(kept, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            F.col("n_sents").cast("int").alias("n_sents"),
            F.coalesce(F.col("__removed"), F.lit(0)).cast("int").alias("n_removed"),
            F.round(
                F.when(
                    F.col("n_sents") > 0,
                    (F.col("n_sents") - F.coalesce(F.col("__removed"), F.lit(0)))
                    .cast("double")
                    / F.col("n_sents"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("span_kept_frac"),
            F.md5(F.coalesce(F.col("__kepttext"), F.lit(""))).alias("span_fp"),
        )
    )
    return out


def sentences_from_tokens(
    toks: Column, sent_tokens: int = 8, pad_token: str = "pad"
) -> Column:
    """Deterministic sentence segmentation for punctuation-free corpora
    (the synthetic fixtures): pad the token array to a multiple of
    ``sent_tokens`` with ``pad_token``, then chunk.  Used by the driver
    entry and tests so Spark and the DuckDB oracle segment identically.
    """
    n = F.size(toks)
    pad_n = (F.lit(sent_tokens) - n % sent_tokens) % sent_tokens
    padded = F.concat(toks, F.array_repeat(F.lit(pad_token), pad_n.cast("int")))
    m = F.size(padded) / F.lit(sent_tokens)
    return F.when(
        n > 0,
        F.transform(
            F.sequence(F.lit(0), m.cast("int") - 1),
            lambda i: F.concat_ws(
                " ", F.slice(padded, i * sent_tokens + 1, sent_tokens)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
