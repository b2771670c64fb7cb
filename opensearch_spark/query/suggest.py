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
            # tlen band first: |len(term)-len(tok)| <= max_edits is a
            # necessary condition for the edit distance, and it's a
            # pushable int comparison (parquet row-group pruning before
            # any levenshtein evaluates)
            d.filter(
                F.col("tlen").between(len(tok) - max_edits, len(tok) + max_edits)
            )
            .withColumn("distance", F.levenshtein(F.col("term"), F.lit(tok)))
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


class CompletionPrefixIndex:
    """``index_prefixes`` accelerator (``CompletionFieldMapper`` /
    ``PrefixFieldMapper``: an edge-ngram ``._index_prefix`` subfield
    turns prefix queries of length ``min_chars..max_chars`` into TERM
    matches).  Spark analog: the completion table exploded over its
    edge prefixes, hash-repartitioned on ``prefix`` — a typed key then
    probes with an EQUALITY predicate, so parquet dictionary/min-max
    stats prune to the one matching value and, bucketed, exactly one
    hash partition is touched.  At 10^12-entry scale the sorted-scan
    ``startswith`` path must read every file footer in the range; the
    equality probe is the FST-arc-jump analog.  Trade: ~(max_chars -
    min_chars + 1)x index rows, the same trade the reference documents
    for ``index_prefixes``.

    Keys longer than ``max_chars`` probe with their ``max_chars`` head
    plus a residual ``startswith`` re-check (exactly Lucene's behavior:
    the prefix automaton takes over past the indexed lengths); keys
    shorter than ``min_chars`` fall back to the range scan."""

    def __init__(self, df: DataFrame, min_chars: int = 1,
                 max_chars: int = 5):
        self.df = df
        self.min_chars = int(min_chars)
        self.max_chars = int(max_chars)

    @classmethod
    def build(cls, sugg: DataFrame, min_chars: int = 1, max_chars: int = 5,
              buckets: int = 0) -> "CompletionPrefixIndex":
        """Explode a :func:`build_completion_index` table over its edge
        prefixes.  ``buckets > 0`` hash-repartitions on ``prefix`` (the
        write-side layout a cluster deployment would persist)."""
        lens = F.sequence(
            F.lit(int(min_chars)),
            F.least(F.lit(int(max_chars)), F.length("suggestion")),
        )
        out = sugg.withColumn(
            "prefix",
            F.explode(
                F.transform(lens, lambda n: F.col("suggestion").substr(F.lit(1), n))
            ),
        )
        if buckets:
            out = out.repartition(int(buckets), "prefix")
        return cls(out, min_chars, max_chars)

    def lookup(self, key: str) -> Optional[DataFrame]:
        """Completion rows whose suggestion starts with ``key``, via the
        equality probe; ``None`` when the key is shorter than the
        indexed minimum (caller falls back to the range scan)."""
        key = key.lower()
        if len(key) < self.min_chars:
            return None
        head = key[: self.max_chars]
        df = self.df.filter(F.col("prefix") == head)
        if len(key) > self.max_chars:
            df = df.filter(F.col("suggestion").startswith(key))
        return df.drop("prefix")


def completion_suggest_field(
    sugg: DataFrame,
    prefix: Optional[str] = None,
    regex: Optional[str] = None,
    size: int = 10,
    fuzzy: Optional[dict] = None,
    contexts: Optional[dict] = None,
    skip_duplicates: bool = False,
    prefix_index: Optional[CompletionPrefixIndex] = None,
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
    ctx_filters = []  # unbound exprs, reusable on the prefix-index probe
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
        ctx_filters.append(any_match)
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
        probe = prefix_index.lookup(key) if prefix_index is not None else None
        if probe is not None:
            # index_prefixes accelerator: the equality probe already
            # narrowed to the prefix; re-apply the context mask on the
            # narrowed frame (the probe carries the same ctx_ columns)
            for flt in ctx_filters:
                probe = probe.filter(flt)
            exact = probe.select("suggestion", score, F.lit(0).alias("edits"))
        else:
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


def geo_context(
    lat: float,
    lon: float,
    precision: int = 6,
    boost: float = 1.0,
) -> dict:
    """GeoQueryContext (``GeoContextMapping`` / ``GeoQueryContext``):
    a completion-suggester context value matching documents whose
    stored geohash context starts with the query point's
    ``precision``-char geohash.  Store side: build the completion
    index with ``context_cols={"<name>": <geohash column>}`` where the
    column is ``aggs.geohash_key(store_precision, lat, lon)`` — the
    mapper's indexed geohash (default precision 6 in the reference's
    GeoContextMapping).  Query side: this helper encodes the point at
    the (usually coarser) query precision and returns a
    prefix-matching category value — exactly how the reference
    resolves geo contexts to geohash prefix automata."""
    from opensearch_spark.aggs import geohash_encode

    return {
        "context": geohash_encode(float(lat), float(lon), int(precision)),
        "prefix": True,
        "boost": float(boost),
    }


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
            .filter(
                F.col("tlen").between(len(tok) - max_edits, len(tok) + max_edits)
            )
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


# ===================================================================
# Noisy-channel phrase suggester
# (PhraseSuggester.java + NoisyChannelSpellChecker.java +
#  CandidateScorer.java + DirectCandidateGenerator.java + the
#  WordScorer family StupidBackoffScorer/LaplaceScorer/
#  LinearInterpolatingScorer — the reference's full "did you mean"
#  pipeline, re-expressed Spark-first.)
# ===================================================================

import math
from dataclasses import dataclass


@dataclass(frozen=True)
class _Cand:
    """DirectCandidateGenerator.Candidate: term + stats + channel score.

    ``dist`` is the string-distance score in [0,1] (1.0 for the user's
    original token); ``WordScorer.channelScore`` maps dist==1.0 to
    ``real_word_error_likelihood`` and uses dist itself otherwise."""

    term: str
    df: int
    ttf: int
    dist: float
    original: bool


class _WordScorer:
    """WordScorer.java semantics over collected stats.

    ``vocab_size`` = sumTotalTermFreq of the suggest field,
    ``num_terms`` = distinct terms.  Scores are combined by the caller
    as ``sum(log10(channel * lm))`` then ``exp(sum)`` — the reference
    mixes log10 accumulation with Math.exp (CandidateScorer.updateTop
    ``score = Math.exp(score)``); we reproduce that exactly rather than
    "fixing" it, so absolute scores match.

    Documented deviation: the reference scores gram_size>=2 against a
    shingle SUBFIELD whose sumTotalTermFreq/size include the shingle
    terms themselves; we read bigram frequencies from the positional
    postings of the unigram field (count of adjacent occurrences — the
    same number a shingle field stores as totalTermFreq) and use
    unigram-only vocab_size/num_terms in the smoothing denominators."""

    def __init__(self, vocab_size, num_terms, rwl, pair_counts, smoothing):
        self.vocab = float(vocab_size)
        self.n_terms = float(num_terms)
        self.rwl = float(rwl)
        self.pairs = pair_counts  # {(w1, w2): adjacent-occurrence count}
        self.sm = smoothing  # dict: model + params

    def channel(self, cand: _Cand) -> float:
        return self.rwl if cand.dist == 1.0 else cand.dist

    def unigram(self, w: _Cand) -> float:
        if self.sm["model"] == "laplace":
            a = self.sm["alpha"]
            return (a + w.ttf) / (self.vocab + a * self.n_terms)
        return (1.0 + w.ttf) / (self.vocab + self.n_terms)

    def bigram(self, w: _Cand, w_1: _Cand) -> float:
        count = self.pairs.get((w_1.term, w.term), 0)
        m = self.sm["model"]
        if m == "laplace":
            a = self.sm["alpha"]
            return (a + count) / (w_1.ttf + a * self.n_terms)
        if m == "linear_interpolation":
            # LinearInterpolatingScorer.scoreBigram: denominator is
            # 0.5 + ttf(w_1) (not the SB epsilon form)
            bl, ul = self.sm["bigram_lambda"], self.sm["unigram_lambda"]
            if count < 1:
                return ul * self.unigram(w)
            return bl * (count / (0.5 + w_1.ttf)) + ul * self.unigram(w)
        # stupid_backoff (default, discount 0.4)
        if count < 1:
            return self.sm["discount"] * self.unigram(w)
        return count / (w_1.ttf + 1e-11)

    def trigram(self, w: _Cand, w_1: _Cand, w_2: _Cand) -> float:
        tri = self.pairs.get((w_2.term, w_1.term, w.term), 0)
        big = self.pairs.get((w_1.term, w.term), 0)
        m = self.sm["model"]
        if m == "laplace":
            # LaplaceScorer.scoreTrigram: (a + tri) / (freq(w_1·w) + a*T)
            a = self.sm["alpha"]
            return (a + tri) / (big + a * self.n_terms)
        if m == "linear_interpolation":
            # LinearInterpolatingScorer.scoreTrigram reproduced exactly,
            # INCLUDING its reversed join order: it looks up the shingle
            # "w w_1 w_2" (and "w w_1") — the reverse of the stored
            # sequence — so on real corpora the trigram lookup is
            # usually 0 and the score backs off to scoreBigram
            tl = self.sm.get("trigram_lambda", 0.0)
            rev_tri = self.pairs.get((w.term, w_1.term, w_2.term), 0)
            if rev_tri < 1:
                return self.bigram(w, w_1)
            rev_big = self.pairs.get((w.term, w_1.term), 0)
            return tl * (rev_tri / (1.0 + rev_big)) + self.bigram(w, w_1)
        # StupidBackoffScorer.scoreTrigram: bigram gate first, then
        # trigram/bigram ratio, discounting each back-off level
        if big < 1:
            return self.sm["discount"] * self.unigram(w)
        if tri < 1:
            return self.sm["discount"] * (big / (w_1.ttf + 1e-11))
        return tri / (big + 1e-11)

    def log_score(self, path, at: int, gram_size: int) -> float:
        cand = path[at]
        if at == 0 or gram_size == 1:
            lm = self.unigram(cand)
        elif at == 1 or gram_size == 2:
            lm = self.bigram(cand, path[at - 1])
        else:
            lm = self.trigram(cand, path[at - 1], path[at - 2])
        return math.log10(self.channel(cand) * max(lm, 1e-300))


def _java_round(x: float) -> int:
    return int(math.floor(x + 0.5))


def _draw_candidates(
    index,
    tokens,
    *,
    suggest_mode="missing",
    accuracy=0.5,
    max_edits=2,
    prefix_length=1,
    min_word_length=4,
    max_term_freq=0.01,
    min_doc_freq=0.0,
    num_candidates=5,
):
    """Per-token candidate sets via ONE dictionary-scan job
    (DirectCandidateGenerator.drawCandidates / Lucene
    DirectSpellChecker.suggestSimilar semantics; defaults are
    DirectSpellcheckerSettings.java:52-62).

    String distance is ``1 - levenshtein/min(len)`` — classic
    Levenshtein on BOTH the engine and oracle sides (documented
    deviation: Lucene's INTERNAL_LEVENSHTEIN counts a transposition as
    one edit; Spark/DuckDB ``levenshtein`` count two, so a
    transposition-only candidate ranks with distance 2).

    Scale shape: the per-token prefix equality prunes the dictionary
    scan (term-sorted parquet -> row-group pruning), the slot table is
    broadcast, and ranking is a per-slot window over the pruned
    candidates — no driver loop over the dictionary."""
    from pyspark.sql import Window

    spark = index.spark
    stats = index.stats
    n_docs = int(stats.get("doc_count") or stats.get("n_docs") or 0)
    tok_stats = index.term_stats(list(dict.fromkeys(tokens)))
    tok_df = dict(zip(tok_stats["term"], tok_stats["df"]))
    tok_ttf = dict(zip(tok_stats["term"], tok_stats["total_tf"]))

    max_tf_abs = (
        max_term_freq if max_term_freq >= 1.0 else max_term_freq * n_docs
    )
    min_df_abs = (
        min_doc_freq if min_doc_freq >= 1.0 or min_doc_freq == 0.0
        else min_doc_freq * n_docs
    )
    gen_slots = []
    for slot, tok in enumerate(tokens):
        df = int(tok_df.get(tok, 0))
        if len(tok) < min_word_length:
            continue
        if suggest_mode == "missing" and df > 0:
            continue
        if df > max_tf_abs:
            continue
        gen_slots.append((slot, tok, df))

    sets = [
        [_Cand(t, int(tok_df.get(t, 0)), int(tok_ttf.get(t, 0)), 1.0, True)]
        for t in tokens
    ]
    if not gen_slots:
        return sets

    slots_df = spark.createDataFrame(
        [(s, t, len(t), t[:prefix_length], d) for s, t, d in gen_slots],
        "slot int, tok string, tok_len int, pfx string, tok_df long",
    )
    d = index.dictionary()
    lev = F.levenshtein(F.col("term"), F.col("tok"))
    cand = (
        d.crossJoin(F.broadcast(slots_df))
        .filter(
            (F.substring("term", 1, prefix_length) == F.col("pfx"))
            & (F.col("term") != F.col("tok"))
            # length band: necessary for lev <= max_edits, evaluated
            # before the levenshtein on the broadcast-joined candidates
            & (F.abs(F.col("tlen") - F.col("tok_len")) <= F.lit(max_edits))
        )
        .withColumn("lev", lev)
        .filter((F.col("lev") > 0) & (F.col("lev") <= max_edits))
        .withColumn(
            "dist",
            F.lit(1.0)
            - F.col("lev") / F.least(F.length("term"), F.col("tok_len")),
        )
        .filter(F.col("dist") >= F.lit(float(accuracy)))
    )
    if suggest_mode == "popular":
        cand = cand.filter(F.col("df") > F.col("tok_df"))
    if min_df_abs > 0:
        cand = cand.filter(F.col("df") >= F.lit(float(min_df_abs)))
    w = Window.partitionBy("slot").orderBy(
        F.desc("dist"), F.desc("df"), F.asc("term")
    )
    rows = (
        cand.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= num_candidates)
        .select("slot", "term", "df", "total_tf", "dist")
        .collect()
    )
    for r in rows:
        sets[r["slot"]].append(
            _Cand(r["term"], int(r["df"]), int(r["total_tf"]), float(r["dist"]), False)
        )
    return sets


def _pair_counts(index, pairs, triples=()):
    """Adjacent-occurrence counts for the needed (w1, w2) bigram set —
    and, for gram_size=3, the (w1, w2, w3) trigram set — via ONE
    positional-postings job: decode only the involved terms' postings,
    self-join on (doc, pos+1) (and pos+2 for triples).  These are the
    numbers a shingle field would store as the gram's totalTermFreq
    (WordScorer.frequency).  The needed set is bounded by
    (num_candidates+1)^k per adjacent token window, so the join input
    stays tiny even on a huge index."""
    if not pairs and not triples:
        return {}
    terms = sorted(
        {w for p in pairs for w in p} | {w for t in triples for w in t}
    )
    posts = index.postings_for_terms(terms, with_positions=True)
    pos = posts.select(
        "term", F.col("_docid").alias("doc"), F.explode("positions").alias("p")
    )
    out = {}
    if pairs:
        firsts = {a for a, _ in pairs}
        seconds = {b for _, b in pairs}
        left = pos.filter(F.col("term").isin(sorted(firsts))).alias("l")
        right = pos.filter(F.col("term").isin(sorted(seconds))).alias("r")
        keys = [a + "\x1f" + b for a, b in pairs]
        counted = (
            left.join(
                right,
                (F.col("l.doc") == F.col("r.doc"))
                & (F.col("r.p") == F.col("l.p") + F.lit(1)),
            )
            .select(F.concat_ws("\x1f", "l.term", "r.term").alias("pair"))
            .filter(F.col("pair").isin(keys))
            .groupBy("pair")
            .count()
            .collect()
        )
        for r in counted:
            a, b = r["pair"].split("\x1f")
            out[(a, b)] = int(r["count"])
    if triples:
        t1 = pos.filter(F.col("term").isin(sorted({a for a, _, _ in triples}))).alias("a")
        t2 = pos.filter(F.col("term").isin(sorted({b for _, b, _ in triples}))).alias("b")
        t3 = pos.filter(F.col("term").isin(sorted({c for _, _, c in triples}))).alias("c")
        keys3 = [a + "\x1f" + b + "\x1f" + c for a, b, c in triples]
        counted3 = (
            t1.join(
                t2,
                (F.col("a.doc") == F.col("b.doc"))
                & (F.col("b.p") == F.col("a.p") + F.lit(1)),
            )
            .join(
                t3,
                (F.col("b.doc") == F.col("c.doc"))
                & (F.col("c.p") == F.col("b.p") + F.lit(1)),
            )
            .select(F.concat_ws("\x1f", "a.term", "b.term", "c.term").alias("tri"))
            .filter(F.col("tri").isin(keys3))
            .groupBy("tri")
            .count()
            .collect()
        )
        for r in counted3:
            a, b, c = r["tri"].split("\x1f")
            out[(a, b, c)] = int(r["count"])
    return out


def phrase_suggest_noisy(
    index,
    text: str,
    *,
    size: int = 5,
    gram_size: int = 2,
    smoothing: Optional[dict] = None,
    real_word_error_likelihood: float = 0.95,
    confidence: float = 1.0,
    max_errors: float = 0.5,
    token_limit: int = 10,
    generator: Optional[dict] = None,
    pre_tag: Optional[str] = None,
    post_tag: Optional[str] = None,
    collate: Optional[object] = None,
    collate_prune: bool = False,
) -> DataFrame:
    """Noisy-channel phrase suggester (PhraseSuggester.java;
    NoisyChannelSpellChecker.java:66-144; CandidateScorer.java;
    defaults PhraseSuggestionContext.java:54-62).

    Returns (suggestion, score float, n_subs int, collate_match
    boolean, highlighted string) rows, best first.

    Semantics reproduced from the reference:

    - per-token candidate sets from the direct generator
      (``generator`` dict overrides DirectSpellcheckerSettings
      defaults: suggest_mode/accuracy/max_edits/prefix_length/
      min_word_length/max_term_freq/min_doc_freq/num_candidates);
    - DFS path enumeration with a misspelling budget: ``max_errors``
      >= 1 is an absolute count, < 1 a fraction of the token count
      (Java ``Math.round``), floor 1 (CandidateScorer:66-71);
    - path score ``exp(sum(log10(channel * lm)))`` — the reference's
      exact log10/exp mix (CandidateScorer.updateTop);
    - smoothing models: ``{"model": "stupid_backoff", "discount":
      0.4}`` (default), ``{"model": "laplace", "alpha": 0.5}``,
      ``{"model": "linear_interpolation", "trigram_lambda": ...,
      "bigram_lambda": ..., "unigram_lambda": ...}`` (lambdas
      normalized by their sum as LinearInterpolatingScorer does);
      gram_size up to 3 — trigram frequencies come from the same
      positional-postings job (pos+1, pos+2 joins), and the three
      scorers reproduce their Lucene trigram forms exactly, including
      LinearInterpolatingScorer's reversed-shingle lookup quirk;
    - ``confidence`` > 0 sets the cutoff to input-phrase-score *
      confidence and keeps only STRICTLY greater scores, so at the
      default 1.0 the input itself is never suggested
      (NoisyChannelSpellChecker:133-140); confidence == 0 keeps every
      enumerated path including the input;
    - collate (PhraseSuggester.java:150-174): ``collate`` is a
      callable suggestion_text -> bool (the analog of the user's
      collate query template — wire it to ``engine.search(...).count()
      > 0``).  With ``collate_prune=False`` non-matching suggestions
      are DROPPED; with True they are kept and tagged
      ``collate_match=false`` — the reference's exact (quirky)
      contract;
    - ``pre_tag``/``post_tag`` wrap substituted tokens in the
      ``highlighted`` column (Correction.join with tags).

    Scale: two bounded Spark jobs (dictionary candidate scan +
    positional bigram counts for the needed pairs only); the path DFS
    runs on the driver over <= (num_candidates+1)^tokens paths —
    the same coordinator-side reduce the reference does per shard
    response.  Collate adds one engine query per surviving suggestion.
    """
    if gram_size not in (1, 2, 3):
        raise ValueError("gram_size must be 1, 2 or 3")
    sm = {"model": "stupid_backoff", "discount": 0.4}
    if smoothing:
        sm.update(smoothing)
    if sm["model"] == "laplace":
        sm.setdefault("alpha", 0.5)
    if sm["model"] == "linear_interpolation":
        tl = float(sm.get("trigram_lambda", 0.0))
        bl = float(sm["bigram_lambda"])
        ul = float(sm["unigram_lambda"])
        s = tl + bl + ul
        sm["trigram_lambda"] = tl / s
        sm["bigram_lambda"], sm["unigram_lambda"] = bl / s, ul / s

    out_schema = (
        "suggestion string, score double, n_subs int, "
        "collate_match boolean, highlighted string"
    )
    tokens = index.analyze(text)
    if not tokens or len(tokens) >= token_limit:
        return index.spark.createDataFrame([], out_schema)

    sets = _draw_candidates(index, tokens, **(generator or {}))

    stats = index.stats
    vocab_size = int(stats["sum_dl"])
    num_terms = int(index.dictionary().count())

    needed = set()
    needed3 = set()
    if gram_size >= 2:
        for i in range(1, len(sets)):
            for a in sets[i - 1]:
                for b in sets[i]:
                    needed.add((a.term, b.term))
    if gram_size >= 3:
        linear = sm["model"] == "linear_interpolation"
        for i in range(2, len(sets)):
            for a in sets[i - 2]:
                for b in sets[i - 1]:
                    for c in sets[i]:
                        needed3.add((a.term, b.term, c.term))
                        if linear:
                            # LinearInterpolatingScorer's reversed joins
                            needed3.add((c.term, b.term, a.term))
            if linear:
                for b in sets[i - 1]:
                    for c in sets[i]:
                        needed.add((c.term, b.term))
    pair_counts = _pair_counts(index, needed, needed3)

    scorer = _WordScorer(
        vocab_size, num_terms, real_word_error_likelihood, pair_counts, sm
    )

    budget = (
        int(max_errors)
        if max_errors >= 1.0
        else _java_round(max_errors * len(sets))
    )
    budget = max(1, budget)

    results = []  # (score, n_subs, tuple-of-_Cand)

    def rec(at, path, left, logscore):
        cur = sets[at]
        last = at == len(sets) - 1
        choices = [cur[0]] + (cur[1:] if left > 0 else [])
        for cand in choices:
            path.append(cand)
            s = logscore + scorer.log_score(path, at, gram_size)
            if last:
                n_subs = sum(1 for c in path if not c.original)
                results.append((math.exp(s), n_subs, tuple(path)))
            else:
                rec(at + 1, path, left - (0 if cand.original else 1), s)
            path.pop()

    rec(0, [], budget, 0.0)

    cutoff = float("-inf")
    if confidence > 0.0:
        orig = [s[0] for s in sets]
        input_log = sum(
            scorer.log_score(orig[: i + 1], i, gram_size)
            for i in range(len(orig))
        )
        cutoff = math.exp(input_log) * confidence

    kept = [r for r in results if r[0] > cutoff]
    kept.sort(key=lambda r: (-r[0], " ".join(c.term for c in r[2])))
    kept = kept[:size]

    rows = []
    for score, n_subs, path in kept:
        phrase = " ".join(c.term for c in path)
        collate_match = None
        if collate is not None:
            collate_match = bool(collate(phrase))
            if not collate_match and not collate_prune:
                continue
        highlighted = None
        if pre_tag is not None:
            highlighted = " ".join(
                c.term if c.original else f"{pre_tag}{c.term}{post_tag or ''}"
                for c in path
            )
        rows.append((phrase, float(score), int(n_subs), collate_match, highlighted))
    return index.spark.createDataFrame(rows, out_schema)
