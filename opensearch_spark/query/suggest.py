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


def build_completion_index(
    docs: DataFrame,
    input_col: str,
    weight_col: Optional[str] = None,
    context_cols: Optional[dict] = None,
) -> DataFrame:
    """Completion-field table (``CompletionFieldMapper``: per-doc
    ``input`` strings + optional ``weight`` + named ``contexts``):
    one row per suggestion input with columns ``suggestion`` (string,
    lowercased whole-input key — the mapper's keyword-ish analysis),
    ``weight`` (long, default 1) and one ``ctx_<name>`` array<string>
    per category context (``CategoryContextMapping``).

    ``input_col`` may hold a string or array<string> (multi-input);
    ``context_cols`` maps context name -> source column (string or
    array<string>).

    Scale: persist this table sorted by ``suggestion`` — the prefix
    filter in :func:`completion_suggest_field` then pushes down as a
    ``StringStartsWith`` parquet predicate over row-group min/max, the
    FST-prefix-walk analog."""
    col = F.col(input_col)
    dt = dict(docs.dtypes)[input_col]
    inputs = col if dt.startswith("array") else F.array(col)
    out = docs.select(
        F.explode(inputs).alias("_sg_in"),
        (
            F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
        ).alias("weight"),
        *[
            (
                F.col(c)
                if dict(docs.dtypes)[c].startswith("array")
                else F.array(F.col(c))
            ).alias(f"ctx_{name}")
            for name, c in (context_cols or {}).items()
        ],
    )
    return out.select(
        F.lower(F.trim(F.col("_sg_in"))).alias("suggestion"),
        *[c for c in out.columns if c != "_sg_in"],
    ).filter(F.col("suggestion") != "")


def completion_suggest_field(
    sugg: DataFrame,
    prefix: Optional[str] = None,
    regex: Optional[str] = None,
    size: int = 10,
    fuzzy: Optional[dict] = None,
    contexts: Optional[dict] = None,
    skip_duplicates: bool = False,
) -> DataFrame:
    """Completion suggester over a :func:`build_completion_index` table
    (``CompletionSuggestionBuilder`` — prefix / regex / fuzzy /
    contexts; Lucene ``PrefixCompletionQuery`` /
    ``RegexCompletionQuery`` / ``FuzzyCompletionQuery`` /
    ``ContextQuery``).  Returns ``(suggestion, score double,
    edits int)`` ordered ``(edits asc, score desc, suggestion asc)``,
    limited to ``size``.

    - ``prefix``: suggestions starting with the typed key, edits = 0,
      score = weight (× context boost).
    - ``regex``: anchored match against a PREFIX of the suggestion
      (RegexCompletionQuery matches the automaton against completion
      prefixes, not the whole key).
    - ``fuzzy`` (``FuzzyOptions``; defaults = the reference's:
      fuzziness 1, prefix_length 1, min_length 3, transpositions
      true): also admits suggestions whose same-length prefix
      (±fuzziness for boundary insertions/deletions) is within
      ``fuzziness`` edits of the typed key, provided the first
      ``prefix_length`` chars match exactly and the key is at least
      ``min_length`` chars.  ``transpositions`` admits adjacent-swap
      variants of the typed key at edit distance 1 (exact OSA
      behavior at fuzziness 1; at fuzziness 2 a swap+edit combination
      may count 3 under plain levenshtein — documented deviation).
      Documented deviation from Lucene's exact score blend: Lucene
      adds an exactly-matched-prefix-length boost into the score; we
      rank fuzzy matches by (edits asc, weight·boost desc), which
      preserves the dominant exact-before-fuzzy ordering.
    - ``contexts``: ``{name: [value | {"context": v, "boost": b,
      "prefix": bool}]}`` — a suggestion must match EVERY named
      context (OR within one name's values; prefix values match by
      startswith); score multiplies by the product over names of the
      max matched boost (``CategoryQueryContext`` boost, default 1).
    - ``skip_duplicates``: collapse equal surface forms keeping the
      best (min edits, max score) entry.

    The plan is fully columnar: prefix/regex/fuzzy prefilters are JVM
    predicates (``startswith`` pushes down on a suggestion-sorted
    table; the fuzzy path still prefilters on the exact
    ``prefix_length`` head before any levenshtein)."""
    if (prefix is None) == (regex is None):
        raise ValueError("completion suggester needs exactly one of prefix / regex")
    base = sugg
    boost_expr = F.lit(1.0)
    for name, vals in (contexts or {}).items():
        ccol = f"ctx_{name}"
        if ccol not in base.columns:
            raise ValueError(f"unknown completion context: {name!r}")
        conds, boosts = [], []
        for v in vals:
            spec = v if isinstance(v, dict) else {"context": v}
            val = str(spec["context"]).lower()
            b = float(spec.get("boost", 1))
            if spec.get("prefix"):
                m = F.exists(F.col(ccol), lambda x: F.lower(x).startswith(val))
            else:
                m = F.array_contains(F.transform(F.col(ccol), F.lower), val)
            conds.append(m)
            boosts.append(F.when(m, F.lit(b)).otherwise(F.lit(None)))
        any_match = conds[0]
        for c in conds[1:]:
            any_match = any_match | c
        base = base.filter(any_match)
        boost_expr = boost_expr * F.greatest(*boosts) if len(boosts) > 1 else (
            boost_expr * boosts[0]
        )
    score = (F.col("weight").cast("double") * boost_expr).alias("score")

    if regex is not None:
        # anchored prefix-match: the regex must consume a PREFIX of the
        # suggestion — model as ^(pattern) RLIKE on the full key
        pat = regex if regex.startswith("^") else "^(" + regex + ")"
        out = base.filter(F.col("suggestion").rlike(pat)).select(
            "suggestion", score, F.lit(0).alias("edits")
        )
    else:
        key = prefix.lower()
        exact = base.filter(F.col("suggestion").startswith(key)).select(
            "suggestion", score, F.lit(0).alias("edits")
        )
        out = exact
        f = dict(fuzzy) if fuzzy else None
        if (
            f is not None
            and len(key) >= int(f.get("min_length", 3))
            and int(f.get("fuzziness", 1)) >= 1  # fuzziness 0 == pure prefix
        ):
            edits_max = int(f.get("fuzziness", 1))
            plen = int(f.get("prefix_length", 1))
            head = key[:plen]
            # candidate prefilter: exact head chars (the non-fuzzy
            # prefix) — this is the pushdown-able pruning predicate
            cand = base.filter(F.col("suggestion").startswith(head)) if head else base
            n = len(key)
            lens = [m for m in range(n - edits_max, n + edits_max + 1) if m > 0]
            ed = F.least(
                *[
                    F.levenshtein(F.substring("suggestion", 1, m), F.lit(key))
                    for m in lens
                ]
            )
            if f.get("transpositions", True) and edits_max >= 1:
                swaps = [
                    key[:i] + key[i + 1] + key[i] + key[i + 2 :]
                    for i in range(max(plen - 1, 0), n - 1)
                    if key[i] != key[i + 1]
                ]
                if swaps:
                    swap_cond = F.col("suggestion").startswith(swaps[0])
                    for s in swaps[1:]:
                        swap_cond = swap_cond | F.col("suggestion").startswith(s)
                    ed = F.when(swap_cond, F.least(ed, F.lit(1))).otherwise(ed)
            fz = (
                cand.withColumn("edits", ed.cast("int"))
                .filter(
                    (F.col("edits") > 0) & (F.col("edits") <= edits_max)
                    & ~F.col("suggestion").startswith(key)
                )
                .select("suggestion", score, "edits")
            )
            out = exact.unionByName(fz)
    if skip_duplicates:
        out = out.groupBy("suggestion").agg(
            F.min("edits").alias("edits"), F.max("score").alias("score")
        ).select("suggestion", "score", "edits")
    return out.orderBy(
        F.asc("edits"), F.desc("score"), F.asc("suggestion")
    ).limit(size)


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
