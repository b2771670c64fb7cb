"""The "standard" analyzer: UAX#29-style word-break + lowercase + stop filter.

Reference semantics (SURVEY.md §2.8):

- default analyzer for text fields is ``standard``
  (``index/analysis/AnalysisRegistry.java:683``), which is Lucene's
  StandardAnalyzer = StandardTokenizer (Unicode UAX#29 word boundaries)
  + LowerCaseFilter + StopFilter with an EMPTY default stop set and
  ``max_token_length`` 255 (``StandardAnalyzerProvider.java:50-57``);
  over-long tokens are *split* at 255 chars, not dropped.
- the opt-in ``_english_`` stop set is Lucene's public EnglishAnalyzer
  default stop set (``modules/analysis-common/.../EnglishAnalyzerProvider.java:49-50``).

This module implements those semantics with a pure-Python core (shared by
the pytest oracle, so engine and oracle cannot drift) and a vectorized
Arrow/pandas UDF wrapper for the Spark hot path — no row-at-a-time Python
UDFs are registered anywhere.

UAX#29 conformance notes (pinned by tests/fixtures/analyzer cases):
- word = runs of letters/digits/underscore (ExtendNumLet joins, so
  ``snake_case`` and ``x86_64`` are single tokens),
- WB6/WB7: letters join across Single_Quote/MidLetter/MidNumLet — i.e.
  ``'``, ``’``, ``·`` and ``.`` between letters (``can't``, ``foo.bar``
  is ONE token per the spec; FIXTURES.md left this case open and we
  resolve it per UAX#29),
- WB11/WB12: digits join across MidNum/MidNumLet/Single_Quote — ``.``,
  ``,``, ``'`` between digits (``3.14``),
- hyphens always break (``state-of-the-art`` -> 4 tokens),
- Han and Hiragana ideographs are emitted one token per character
  (Lucene's IDEOGRAPHIC/HIRAGANA token types); Katakana runs stay whole,
- lowercase matches Java's per-code-point ``Character.toLowerCase``
  (Lucene LowerCaseFilter semantics): ``java_lower`` pre-translates the
  only two code points where Python's full case mapping diverges from
  the simple 1:1 mapping — U+0130 (Python expands to "i" + combining
  dot; Java gives plain "i") and U+03A3 (Python applies the
  context-sensitive final sigma; Java always gives U+03C3) — then
  applies the C-speed ``str.lower()``.  The former "handful of code
  points" deviation is closed (late r3).
"""

from __future__ import annotations

import re
from typing import Iterable, List, Optional, Sequence

import pandas as pd

MAX_TOKEN_LENGTH = 255

# Java Character.toLowerCase is the UNCONDITIONAL simple 1:1 mapping;
# Python str.lower() is the full mapping.  They differ on exactly two
# code points (verified by scanning all of Unicode): U+0130 (1:many
# expansion) and U+03A3 (context-sensitive final sigma).  Translating
# those two first makes str.lower() == Java semantics everywhere.
_JAVA_LOWER_FIXUPS = str.maketrans({0x0130: "i", 0x03A3: "σ"})


def java_lower(s: str) -> str:
    """Lowercase with Java ``Character.toLowerCase`` per-code-point
    semantics (Lucene LowerCaseFilter)."""
    return s.translate(_JAVA_LOWER_FIXUPS).lower()

# Lucene EnglishAnalyzer default stop set (public constant list).
ENGLISH_STOP_WORDS = frozenset(
    """a an and are as at be but by for if in into is it no not of on or such
    that the their then there these they this to was will with""".split()
)

# One "word" candidate: \w runs joined by (letter ' letter) or (digit [.,] digit).
# \w includes underscore (ExtendNumLet) and unicode letters/digits.
_TOKEN_RE = re.compile(
    r"\w+(?:(?:(?<=[^\W\d_])['’·.](?=[^\W\d_]))\w+|(?:(?<=\d)['’.,](?=\d))\w+)*",
    re.UNICODE,
)

# Characters that tokenize one-per-char (Han + Hiragana), vs Katakana runs.
_CJK_SPLIT_RE = re.compile(
    r"([一-鿿㐀-䶿豈-﫿぀-ゟ])"
)
_HAS_ALNUM_RE = re.compile(r"[^\W_]", re.UNICODE)


def _split_cjk(token: str) -> Iterable[str]:
    """Split Han/Hiragana chars into single-char tokens, keep the rest."""
    parts = _CJK_SPLIT_RE.split(token)
    for p in parts:
        if p:
            yield p


def tokenize(
    text: Optional[str],
    stopwords: Optional[frozenset] = None,
    max_token_length: int = MAX_TOKEN_LENGTH,
) -> List[str]:
    """Analyze one string -> list of tokens (the semantic contract).

    Field length (the BM25 ``dl``) is len() of this list — stopword-removed
    tokens do not count, matching the reference (SURVEY.md §4.6).
    """
    if not text:
        return []
    out: List[str] = []
    for raw in _TOKEN_RE.findall(text):
        if not _HAS_ALNUM_RE.search(raw):
            continue  # pure-underscore runs are not words
        for tok in _split_cjk(raw):
            # max_token_length splits (not drops) over-long tokens
            for i in range(0, len(tok), max_token_length):
                piece = java_lower(tok[i : i + max_token_length])
                if stopwords is not None and piece in stopwords:
                    continue
                out.append(piece)
    return out


def tokenize_with_positions(
    text: Optional[str],
    stopwords: Optional[frozenset] = None,
    max_token_length: int = MAX_TOKEN_LENGTH,
):
    """Analyze one string -> (tokens, positions).

    Positions count every token the tokenizer emits *before* stop-filtering,
    matching Lucene's StopFilter position-increment behavior: removing "the"
    from "the quick fox" leaves quick@1, fox@2 — a phrase query for
    "quick fox" with slop 0 does NOT match across the gap.
    """
    if not text:
        return [], []
    toks: List[str] = []
    poss: List[int] = []
    pos = 0
    for raw in _TOKEN_RE.findall(text):
        if not _HAS_ALNUM_RE.search(raw):
            continue
        for tok in _split_cjk(raw):
            for i in range(0, len(tok), max_token_length):
                piece = java_lower(tok[i : i + max_token_length])
                if stopwords is None or piece not in stopwords:
                    toks.append(piece)
                    poss.append(pos)
                pos += 1
    return toks, poss


def tokenize_series(
    texts: pd.Series,
    stopwords: Optional[frozenset] = None,
    max_token_length: int = MAX_TOKEN_LENGTH,
) -> pd.Series:
    """Arrow-batched analysis of a pandas Series of strings."""
    return texts.map(lambda t: tokenize(t, stopwords, max_token_length))


def make_tokenize_udf(stopwords: Optional[Sequence[str]] = None):
    """Build the Spark pandas UDF ``string -> array<string>`` for this config.

    Imported lazily so the pure-Python oracle can use this module without a
    Spark installation.
    """
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, StringType

    stop = frozenset(stopwords) if stopwords is not None else None

    @pandas_udf(ArrayType(StringType()))
    def tokenize_udf(texts: pd.Series) -> pd.Series:
        return tokenize_series(texts, stop)

    return tokenize_udf


def resolve_stopwords(name_or_list) -> Optional[frozenset]:
    """Resolve a stopword config like the reference: None/[] -> empty set
    (default standard analyzer removes nothing), "_english_" -> Lucene's
    English set, else an explicit word list."""
    if name_or_list is None:
        return None
    if name_or_list == "_english_":
        return ENGLISH_STOP_WORDS
    return frozenset(name_or_list)
