"""Suggesters (registry ``SearchModule.java:863-893``).

- **term suggester** (``TermSuggestionBuilder``): per input token,
  dictionary terms within edit distance, ranked by (frequency desc,
  term asc) — the reference's default ``missing`` mode suggests only
  for tokens absent from the index.
- **completion suggester** (``CompletionSuggester``; FST-backed in
  Lucene): prefix lookup over the term dictionary ranked by frequency.
  The dictionary is term-range partitioned + sorted, so the prefix
  filter prunes Parquet row groups — the FST analog.
- **phrase suggester** (simplified): per-token corrections recombined,
  ranked by the product of candidate frequencies (the reference uses an
  n-gram language model; documented deviation).
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def term_suggest(
    index,
    text: str,
    max_edits: int = 2,
    size: int = 5,
    mode: str = "missing",
) -> DataFrame:
    """(token, suggestion, freq, distance) rows per misspelled token."""
    tokens = index.analyze(text)
    known = set(index.term_stats(tokens)["term"]) if tokens else set()
    targets = [t for t in tokens if mode != "missing" or t not in known]
    if not targets:
        return index.spark.createDataFrame(
            [], "token string, suggestion string, freq long, distance int"
        )
    d = index.dictionary()
    parts = []
    for tok in dict.fromkeys(targets):
        cand = (
            d.withColumn("distance", F.levenshtein(F.col("term"), F.lit(tok)))
            .filter(
                (F.col("distance") <= max_edits) & (F.col("distance") > 0)
            )
            .orderBy(F.asc("distance"), F.desc("df"), F.asc("term"))
            .limit(size)
            .select(
                F.lit(tok).alias("token"),
                F.col("term").alias("suggestion"),
                F.col("df").alias("freq"),
                F.col("distance").cast("int"),
            )
        )
        parts.append(cand)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def completion_suggest(index, prefix: str, size: int = 10) -> DataFrame:
    """(suggestion, freq) prefix completions ranked by frequency."""
    return (
        index.dictionary()
        .filter(F.col("term").startswith(prefix.lower()))
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(size)
        .select(F.col("term").alias("suggestion"), F.col("df").alias("freq"))
    )


def phrase_suggest(
    index, text: str, max_edits: int = 1, size: int = 3
) -> List[str]:
    """Simple phrase correction: best per-token candidates recombined
    (frequency-product ranking)."""
    tokens = index.analyze(text)
    out_tokens: List[List[str]] = []
    for tok in tokens:
        stats = index.term_stats([tok])
        if not stats.empty:
            out_tokens.append([tok])
            continue
        rows = (
            index.dictionary()
            .withColumn("distance", F.levenshtein(F.col("term"), F.lit(tok)))
            .filter(F.col("distance") <= max_edits)
            .orderBy(F.desc("df"), F.asc("term"))
            .limit(size)
            .collect()
        )
        out_tokens.append([r["term"] for r in rows] or [tok])
    # best combination = first candidates (each list is frequency-ranked)
    suggestions = []
    for i in range(size):
        parts = [cands[min(i, len(cands) - 1)] for cands in out_tokens]
        s = " ".join(parts)
        if s not in suggestions:
            suggestions.append(s)
    return suggestions
