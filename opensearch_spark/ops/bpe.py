"""Byte-pair-encoding tokenizer training + encoding as distributed ops.

Published algorithm: Sennrich, Haddow & Birch (2016), *Neural Machine
Translation of Rare Words with Subword Units* — the learn_bpe /
apply_bpe semantics of the reference subword-nmt implementation:

- a word enters training as its character sequence with the end-of-word
  marker ``</w>`` FUSED onto the final character (``low`` ->
  ``l o w</w>``);
- training repeatedly merges the most frequent adjacent symbol pair,
  breaking count ties by the lexicographically GREATEST pair (the
  ``max(stats, key=lambda x: (stats[x], x))`` rule of the published
  script, which is what makes the merge table deterministic);
- encoding applies learned merges greedily by rank: repeatedly merge
  the lowest-ranked pair present until none applies.

Scale shape (100 TB corpus): the ONLY full-corpus pass is the
word-count aggregation — one map-side-combined ``groupBy`` shuffle.
The merge learner runs on the driver over a count-capped vocabulary
(``max_words`` most frequent words; Zipf makes the tail irrelevant to
pair statistics, and the cap bounds driver memory regardless of corpus
size — the standard practice for corpus-scale tokenizer training).
Encoding ships the merge-rank dict inside an Arrow-batched pandas UDF
with a per-executor word cache, so each distinct word in a batch is
encoded once.

The engine side has only a BPE-*rate proxy* (``textstats.BPE_CHUNK_RE``
subword estimate); this module is the real trainable tokenizer a
training-data pipeline needs for token accounting and packing.
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Optional, Sequence, Tuple

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import ArrayType, StringType

EOW = "</w>"

# pre-tokenizer: lowercased alphanumeric runs (the corpus-side twin of
# the whitespace/punct split every op in ops/textstats.py uses)
PRETOKEN_RE = "[a-z0-9]+"


def pretokenize(col) -> Column:
    return F.regexp_extract_all(F.lower(col), F.lit(PRETOKEN_RE), 0)


def word_counts(df: DataFrame, col: str = "text") -> DataFrame:
    """Distributed (word, count) table — the single full-corpus pass.

    ``explode`` + ``groupBy`` compiles to a partial/final hash
    aggregate: counts combine map-side before the one shuffle on the
    word key, so the shuffled volume is the distinct-word set per
    partition, not the token stream.
    """
    return (
        df.select(F.explode(pretokenize(F.col(col))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("count"))
    )


def _word_symbols(word: str) -> Tuple[str, ...]:
    """subword-nmt vocab entry: chars with EOW fused onto the last."""
    if not word:
        return ()
    return tuple(word[:-1]) + (word[-1] + EOW,)


def _merge_symbols(
    syms: Sequence[str], pair: Tuple[str, str]
) -> Tuple[str, ...]:
    a, b = pair
    out: List[str] = []
    i = 0
    n = len(syms)
    while i < n:
        if i < n - 1 and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def learn_bpe(
    items: Iterable[Tuple[str, int]], num_merges: int
) -> List[Tuple[str, str]]:
    """Driver-side merge learning over a (word, count) vocabulary.

    Pure Sennrich loop: pair counts weighted by word frequency; ties
    broken by the lexicographically greatest pair.  O(vocab x merges)
    with the recount-per-iteration formulation — fine because callers
    cap the vocab (see :func:`train_bpe`).
    """
    vocab: Dict[Tuple[str, ...], int] = {}
    for word, count in items:
        syms = _word_symbols(str(word))
        if len(syms) > 1:
            vocab[syms] = vocab.get(syms, 0) + int(count)
    merges: List[Tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: Dict[Tuple[str, str], int] = {}
        for syms, count in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pairs[p] = pairs.get(p, 0) + count
        if not pairs:
            break
        best = max(pairs, key=lambda p: (pairs[p], p))
        merges.append(best)
        vocab = {
            _merge_symbols(syms, best) if best[0] in syms else syms: count
            for syms, count in vocab.items()
        }
        # drop fully-merged single-symbol words: no pairs left to offer
        vocab = {s: c for s, c in vocab.items() if len(s) > 1}
        if not vocab:
            break
    return merges


def train_bpe(
    df: DataFrame,
    col: str = "text",
    num_merges: int = 100,
    max_words: int = 50_000,
) -> List[Tuple[str, str]]:
    """Corpus -> merge table.  One shuffle (word counts), then a
    bounded ``orderBy count DESC, word ASC LIMIT max_words`` collect —
    the deterministic frequency cap that keeps the driver stage O(cap)
    at any corpus size."""
    top = (
        word_counts(df, col)
        .orderBy(F.desc("count"), F.asc("word"))
        .limit(int(max_words))
        .collect()
    )
    return learn_bpe(((r["word"], r["count"]) for r in top), num_merges)


def encode_word(
    word: str, ranks: Dict[Tuple[str, str], int]
) -> List[str]:
    """Greedy rank-order merge application (apply_bpe semantics)."""
    syms: Sequence[str] = _word_symbols(word)
    while len(syms) > 1:
        best_rank = None
        best_pair = None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
                best_pair = (syms[i], syms[i + 1])
        if best_pair is None:
            break
        syms = _merge_symbols(syms, best_pair)
    return list(syms)


def merge_ranks(
    merges: Sequence[Tuple[str, str]]
) -> Dict[Tuple[str, str], int]:
    return {tuple(p): i for i, p in enumerate(merges)}


def bpe_encode(
    df: DataFrame,
    merges: Sequence[Tuple[str, str]],
    col: str = "text",
    out: str = "bpe_tokens",
) -> DataFrame:
    """Add an ``array<string>`` subword column.

    The merge table travels in the UDF closure (<= max_words pairs, a
    few MB at most — broadcast-sized by construction); the per-batch
    word cache turns the Zipf head into dict hits so the merge walk
    runs only once per distinct word per batch.
    """
    ranks = merge_ranks(merges)

    @F.pandas_udf(ArrayType(StringType()))
    def _enc(s: pd.Series) -> pd.Series:
        import re

        cache: Dict[str, List[str]] = {}
        rx = re.compile(PRETOKEN_RE)

        def enc_text(text) -> List[str]:
            toks: List[str] = []
            for w in rx.findall(str(text or "").lower()):
                got = cache.get(w)
                if got is None:
                    got = cache[w] = encode_word(w, ranks)
                toks.extend(got)
            return toks

        return s.map(enc_text)

    return df.withColumn(out, _enc(F.col(col)))


def decode_tokens(tokens: Iterable[str]) -> str:
    """Inverse of :func:`encode_word` over one word's subwords (the
    roundtrip invariant pinned in tests)."""
    return "".join(tokens).replace(EOW, "")
