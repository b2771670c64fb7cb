"""Composable analysis chain: char filters -> tokenizer -> token filters.

The reference's analysis registry assembles named analyzers from three
stages (``index/analysis/AnalysisRegistry.java``; the common zoo lives in
``modules/analysis-common/.../CommonAnalysisModulePlugin.java:318-620``,
one factory class per component).  This module implements the
most-used subset as plain Python callables composed by :class:`Analyzer`,
plus a vectorized pandas-UDF wrapper for the Spark hot path.  The default
``standard`` chain is defined to be *bit-identical* to the fast path in
:mod:`opensearch_spark.analysis.analyzer` (pinned by
``tests/test_analysis_chain.py``), so the index builder can keep its
single-pass fast path when the configured chain is the default.

Implemented components (reference citation per entry):

Char filters (``CharFilter`` = ``str -> str``; offsets are not tracked
through char filters, matching our ``_analyze`` contract which reports
positions, not offsets, for filtered chains):

- ``html_strip``       HtmlStripCharFilterFactory.java
- ``mapping``          MappingCharFilterFactory.java  (literal pairs "a=>b")
- ``pattern_replace``  PatternReplaceCharFilterFactory.java

Tokenizers (``str -> (tokens, positions)``):

- ``standard``         StandardTokenizerFactory.java (UAX#29; the shared core)
- ``whitespace``       WhitespaceTokenizerFactory.java (split on \\s+)
- ``letter``           LetterTokenizerFactory.java (runs of letters)
- ``lowercase``        LowerCaseTokenizerFactory.java (letter + lowercase)
- ``keyword``          KeywordTokenizerFactory.java (whole input, one token)
- ``pattern``          PatternTokenizerFactory.java (regex split, or group=G)
- ``char_group``       CharGroupTokenizerFactory.java (split on char set)
- ``ngram``            NGramTokenizerFactory.java (default min=1 max=2)
- ``edge_ngram``       EdgeNGramTokenizerFactory.java (anchored prefix grams)
- ``path_hierarchy``   PathHierarchyTokenizerFactory.java (delimiter "/")
- ``simple_pattern`` / ``simple_pattern_split``
                       SimplePattern(Split)TokenizerFactory.java (matches
                       are tokens / separators; Python `re` superset of
                       the Lucene automaton subset, documented)
- ``uax_url_email``    UAX29URLEmailTokenizerFactory.java (URL/EMAIL
                       carved out whole, remainder standard)
- ``classic``          ClassicTokenizerFactory.java (acronym/apostrophe/
                       NUM-with-digit/company/host token classes)
- ``thai``             ThaiTokenizerFactory.java (no Thai dictionary in
                       this environment: Thai runs kept whole, rest
                       standard — documented deviation)

Every tokenizer registered in CommonAnalysisModulePlugin.java now has
an implementation (thai/classic carry documented deviations).

Token filters (``(tokens, positions) -> (tokens, positions)``):

- ``lowercase`` / ``uppercase``  LowerCase/UpperCaseTokenFilterFactory.java
- ``stop``             StopTokenFilterFactory.java (position gaps preserved)
- ``asciifolding``     ASCIIFoldingTokenFilterFactory.java (NFKD strip marks)
- ``porter_stem``      PorterStemTokenFilterFactory.java (Porter 1980, below)
- ``stemmer``          StemmerTokenFilterFactory.java:152 (language=porter/english)
- ``ngram``            NGramTokenFilterFactory.java (grams share the position)
- ``edge_ngram``       EdgeNGramTokenFilterFactory.java
- ``shingle``          ShingleTokenFilterFactory.java (word n-grams, " " sep;
                       unigrams kept by default — output_unigrams=true)
- ``synonym``          SynonymTokenFilterFactory.java ("a,b => c" and
                       equivalence "a,b,c" rules; same-position injection)
- ``truncate``         TruncateTokenFilterFactory.java (length=10 default)
- ``length``           LengthTokenFilterFactory.java (min/max, drops others)
- ``unique``           UniqueTokenFilterFactory.java (first occurrence wins)
- ``reverse``          ReverseTokenFilterFactory.java
- ``trim``             TrimTokenFilterFactory.java
- ``apostrophe``       ApostropheFilterFactory.java (drop ' and suffix)
- ``word_delimiter`` / ``word_delimiter_graph``
                       WordDelimiter(Graph)TokenFilterFactory.java
                       (case/numeric/delimiter splits, catenations,
                       possessives, protected words)
- ``keyword_marker``   KeywordMarkerTokenFilterFactory.java (protects
                       tokens from LATER stemmers via the chain ctx)
- ``stemmer_override`` StemmerOverrideTokenFilterFactory.java
- ``common_grams``     CommonGramsTokenFilterFactory.java (+query_mode)
- ``keep`` / ``keep_types`` / ``limit``  Keep/KeepTypes/LimitTokenCount
- ``decimal_digit``    DecimalDigitFilterFactory.java
- ``fingerprint``      FingerprintTokenFilterFactory.java
- ``remove_duplicates`` RemoveDuplicatesTokenFilterFactory.java
- ``pattern_capture``  PatternCaptureGroupTokenFilterFactory.java
- ``classic``          ClassicFilterFactory.java (acronym dots, 's)
- ``scandinavian_normalization`` / ``scandinavian_folding``
- ``delimited_payload`` (token kept, payload dropped — no payload attr)
- ``concatenate_graph`` / ``flatten_graph`` / ``synonym_graph``
- ``dictionary_decompounder`` DictionaryCompoundWordTokenFilterFactory
- ``pattern_replace``  PatternReplaceTokenFilterFactory.java (token side)
- ``multiplexer``      MultiplexerTokenFilterFactory.java
- ``arabic_normalization`` / ``persian_normalization`` /
  ``german_normalization``  the Lucene normalizer char maps / state machine
- ``arabic_stem``      ArabicStemTokenFilterFactory.java (Light-10)
- ``french_stem`` / ``russian_stem`` / ``dutch_stem``  exact aliases of
  the snowball ports (the reference pre-configures SnowballFilter,
  CommonAnalysisModulePlugin.java:522,533,563)
- ``german_stem``      GermanStemFilter — Caumanns 1999 (see helper note)
- ``czech_stem``       CzechStemFilter — Dolamic & Savoy light stemmer
- ``brazilian_stem``   snowball Portuguese served with a documented
                       deviation (Lucene's RSLP-family tables not ported)
- ``serbian_normalization`` / ``sorani_normalization`` /
  ``hindi_normalization`` / ``bengali_normalization`` /
  ``indic_normalization``  normalizer char maps (sorani/hindi/bengali are
  best-effort ports of the published rules; indic is served as stdlib
  NFC composition — each deviation documented at the helper)
- ``delimited_term_freq``  "tok|3" -> token repeated tf times at one
                       position (tf-statistics analog, no tf attribute)
- ``min_hash``         MinHashFilterFactory semantics (bucketed Broder
                       signatures; hex tokens + sha1-derived 64-bit
                       hashes instead of raw murmur3-128 bytes —
                       documented; the dedup ops implement MinHash at
                       the DataFrame level for actual 100 TB dedup)
- ``hyphenation_decompounder``  dictionary-gated (offo grammar files do
                       not exist here; every offset treated as a
                       hyphenation point — documented deviation)

With those, every token filter registered in
CommonAnalysisModulePlugin.java ships an implementation; the
environment-bound ones carry documented deviations instead of gaps.

analysis-icu plugin analogs (stdlib ``unicodedata``; no ICU data files):

- ``icu_normalizer``  char filter + token filter, name=nfc/nfkc/nfkc_cf
  (IcuNormalizer(CharFilter|TokenFilter)Factory.java; nfc/nfkc exact,
  nfkc_cf = NFKC + default casefold)
- ``icu_folding``     utr30 analog: NFKD -> strip marks -> casefold ->
  NFKC (+ non-decomposable table); unicodeSetFilter bracket-list subset
- ``icu_transform``   structural steps only (case, normalization forms,
  nonspacing-mark removal); script transliteration raises (no ICU data)
- ``icu_tokenizer``   UAX#29 = our standard tokenizer (no Thai/Khmer/Lao
  dictionary segmentation — documented)
- ``icu_collation``   primary/secondary-strength fold as sort key
  (documented analog of ICUCollationKeyFilter binary keys)
- ``icu_analyzer``    named analyzer wired per IcuAnalyzerProvider.java

kuromoji (Japanese) and nori (Korean) remain out of scope: their
morphological dictionaries (MeCab/IPADIC, mecab-ko-dic) are data files
this environment does not ship, and a dictionary-less reimplementation
would be fake parity.  The standard tokenizer's per-codepoint CJK
handling keeps those scripts searchable via unigrams/cjk_bigram.

Named analyzers (AnalysisRegistry defaults + analysis-common providers):
``standard``, ``simple``, ``whitespace``, ``keyword``, ``stop``.
Everything else is assembled via ``{"tokenizer": ..., "char_filter": [...],
"filter": [...]}`` custom specs, exactly like the reference's
``analysis.analyzer.<name>`` index settings.
"""

from __future__ import annotations

import re
import unicodedata
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import pandas as pd

from opensearch_spark.analysis import analyzer as std

TokenStream = Tuple[List[str], List[int]]


# --------------------------------------------------------------------------
# Porter stemmer (Porter, "An algorithm for suffix stripping", 1980) — the
# classic published algorithm, as wrapped by Lucene's PorterStemFilter.
# --------------------------------------------------------------------------

_VOWELS = set("aeiou")


def _is_cons(word: str, i: int) -> bool:
    c = word[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return i == 0 or not _is_cons(word, i - 1)
    return True


def _measure(stem: str) -> int:
    """The 'm' of the paper: number of VC sequences in C?(VC)^m V?."""
    m = 0
    prev_vowel = False
    for i in range(len(stem)):
        cons = _is_cons(stem, i)
        if cons and prev_vowel:
            m += 1
        prev_vowel = not cons
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(word: str) -> bool:
    return (
        len(word) >= 2
        and word[-1] == word[-2]
        and _is_cons(word, len(word) - 1)
    )


def _ends_cvc(word: str) -> bool:
    if len(word) < 3:
        return False
    if not (
        _is_cons(word, len(word) - 3)
        and not _is_cons(word, len(word) - 2)
        and _is_cons(word, len(word) - 1)
    ):
        return False
    return word[-1] not in "wxy"


def english_possessive(t: str) -> str:
    """EnglishPossessiveFilter: strip a trailing 's (ASCII, right
    single quote, or fullwidth apostrophe)."""
    if len(t) >= 2 and t[-2] in ("'", "’", "＇") and t[-1] in "sS":
        return t[:-2]
    return t


def english_minimal_stem(t: str) -> str:
    """EnglishMinimalStemFilter (the S-stemmer): drop a final s unless
    the word is short or ends in -ss / -us."""
    if len(t) < 3 or t[-1] != "s" or t[-2] in "us":
        return t
    return t[:-1]


# Words ending in oes / ches that keep the e when plural-stemmed
# (EnglishPluralStemFilter.java:90-101; the Java exception check
# compares tails, so one string being a suffix of the other matches)
_EN_OES_EXC = ("shoes", "canoes", "oboes")
_EN_CHES_EXC = ("cliches", "avalanches", "mustaches", "moustaches",
                "quiches", "headaches", "heartaches", "porsches",
                "tranches", "caches")


def _suffix_exception(t: str, rules) -> bool:
    for rule in rules:
        m = min(len(t), len(rule))
        if t[-m:] == rule[-m:]:
            return True
    return False


def english_plural_stem(t: str) -> str:
    """``plural_english`` (EnglishPluralStemFilter.java:105-158): the
    S-stemmer plus dangling-e rules — xes/oes/sses/shes/ches drop the
    es (with oes/ches exception lists), ies->y only on words longer
    than 4 (spies->spy but ties->tie), ees->ee."""
    n = len(t)
    if n < 3 or t[-1] != "s":
        return t
    c = t[-2]
    if c in "us":
        return t
    if c == "e":
        if n > 4 and t[-3] == "i":
            return t[:-3] + "y"
        if n > 3:
            if n > 4 and t[-3] == "x":
                return t[:-2]
            if t[-3] == "o":
                return t[:-1] if _suffix_exception(t, _EN_OES_EXC) else t[:-2]
            if n > 4:
                if t[-4] == "s" and t[-3] in "hs":
                    return t[:-2]
                if t[-4] == "c" and t[-3] == "h":
                    return (t[:-1] if _suffix_exception(t, _EN_CHES_EXC)
                            else t[:-2])
    return t[:-1]


def french_minimal_stem(t: str) -> str:
    """``minimal_french`` (Savoy's minimal French stemmer, Lucene
    FrenchMinimalStemFilter): -aux -> -al (unless -eaux), then strip
    s / r / e / é in order, then reduce a final double letter."""
    if len(t) < 6:
        return t
    if t[-1] == "x":
        if t[-3] == "a" and t[-2] == "u" and t[-4] != "e":
            return t[:-2] + "l"
        return t[:-1]
    if t[-1] == "s":
        t = t[:-1]
    if t[-1] == "r":
        t = t[:-1]
    if t[-1] == "e":
        t = t[:-1]
    if t[-1] == "é":
        t = t[:-1]
    if len(t) >= 2 and t[-1] == t[-2] and t[-1].isalpha():
        t = t[:-1]
    return t


def porter_stem(word: str) -> str:
    """Stem one lowercase word per the published Porter (1980) rules."""
    if len(word) <= 2:
        return word
    w = word

    # Step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]

    # Step 1b
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    else:
        flag = False
        if w.endswith("ed") and _has_vowel(w[:-2]):
            w, flag = w[:-2], True
        elif w.endswith("ing") and _has_vowel(w[:-3]):
            w, flag = w[:-3], True
        if flag:
            if w.endswith(("at", "bl", "iz")):
                w += "e"
            elif _ends_double_cons(w) and w[-1] not in "lsz":
                w = w[:-1]
            elif _measure(w) == 1 and _ends_cvc(w):
                w += "e"

    # Step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"

    # Step 2 (m > 0 suffix mappings)
    for suf, rep in (
        ("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
        ("anci", "ance"), ("izer", "ize"), ("abli", "able"),
        ("alli", "al"), ("entli", "ent"), ("eli", "e"), ("ousli", "ous"),
        ("ization", "ize"), ("ation", "ate"), ("ator", "ate"),
        ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
        ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"),
        ("biliti", "ble"),
    ):
        if w.endswith(suf):
            if _measure(w[: -len(suf)]) > 0:
                w = w[: -len(suf)] + rep
            break

    # Step 3
    for suf, rep in (
        ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
        ("ical", "ic"), ("ful", ""), ("ness", ""),
    ):
        if w.endswith(suf):
            if _measure(w[: -len(suf)]) > 0:
                w = w[: -len(suf)] + rep
            break

    # Step 4 (m > 1 deletions)
    for suf in (
        "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
        "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive",
        "ize",
    ):
        if w.endswith(suf):
            stem_part = w[: -len(suf)]
            if suf == "ion" and not stem_part.endswith(("s", "t")):
                continue
            if _measure(stem_part) > 1:
                w = stem_part
            break

    # Step 5a
    if w.endswith("e"):
        m = _measure(w[:-1])
        if m > 1 or (m == 1 and not _ends_cvc(w[:-1])):
            w = w[:-1]
    # Step 5b
    if _measure(w) > 1 and _ends_double_cons(w) and w.endswith("l"):
        w = w[:-1]
    return w


# --------------------------------------------------------------------------
# Char filters
# --------------------------------------------------------------------------

_HTML_TAG_RE = re.compile(r"<[^>]*>")


def make_char_filter(spec) -> Callable[[str], str]:
    if isinstance(spec, str):
        spec = {"type": spec}
    typ = spec["type"]
    if typ == "html_strip":
        # Lucene's HTMLStripCharFilter deletes tags inline
        # ("java<b>script</b>" -> "javascript"); same contract as the
        # ingest html_strip processor (ingest.py _proc_html_strip)
        return lambda s: _HTML_TAG_RE.sub("", s)
    if typ == "mapping":
        pairs = [tuple(m.split("=>", 1)) for m in spec["mappings"]]
        pairs = [(a.strip(), b.strip()) for a, b in pairs]
        # single pass, longest match first (MappingCharFilter is an FST
        # over the ORIGINAL text — one rule's output is never re-matched
        # by another rule)
        lut = dict(pairs)
        pat = re.compile(
            "|".join(
                re.escape(a)
                for a, _ in sorted(pairs, key=lambda p: -len(p[0]))
            )
        )

        def _map(s: str) -> str:
            return pat.sub(lambda m: lut[m.group(0)], s)

        return _map
    if typ == "pattern_replace":
        pat = re.compile(spec["pattern"])
        rep = spec.get("replacement", "")
        return lambda s: pat.sub(rep, s)
    if typ == "icu_normalizer":
        # analysis-icu IcuNormalizerCharFilterFactory.java — same
        # normalization forms as the token-filter variant (below).
        return _icu_normalizer_fn(spec.get("name", "nfkc_cf"))
    raise ValueError(f"unknown char_filter: {typ}")


def _icu_normalizer_fn(method: str) -> Callable[[str], str]:
    """ICU Normalizer2 analog via stdlib unicodedata: ``nfc``/``nfkc``
    are exact (same Unicode algorithm); ``nfkc_cf`` is NFKC + the
    Unicode default case fold (str.casefold), which is ICU's
    definition of the composed case-fold form."""
    method = str(method).lower()
    if method == "nfc":
        return lambda s: unicodedata.normalize("NFC", s or "")
    if method == "nfkc":
        return lambda s: unicodedata.normalize("NFKC", s or "")
    if method == "nfkc_cf":
        return lambda s: unicodedata.normalize(
            "NFKC", unicodedata.normalize("NFKC", s or "").casefold()
        )
    raise ValueError(f"icu_normalizer name not supported: {method}")


# --------------------------------------------------------------------------
# Tokenizers
# --------------------------------------------------------------------------

def _seq_positions(tokens: List[str]) -> TokenStream:
    return tokens, list(range(len(tokens)))


def make_tokenizer(spec) -> Callable[[str], TokenStream]:
    if isinstance(spec, str):
        spec = {"type": spec}
    typ = spec["type"]
    if typ == "standard":
        max_len = int(spec.get("max_token_length", std.MAX_TOKEN_LENGTH))
        # raw UAX#29 tokens, no lowercase/stop (those are filters)
        def _standard(s: str) -> TokenStream:
            toks: List[str] = []
            for raw in std._TOKEN_RE.findall(s or ""):
                if not std._HAS_ALNUM_RE.search(raw):
                    continue
                for tok in std._split_cjk(raw):
                    for i in range(0, len(tok), max_len):
                        toks.append(tok[i : i + max_len])
            return _seq_positions(toks)

        return _standard
    if typ == "annotated_text":
        # plugins/mapper-annotated-text AnnotatedTextFieldMapper.java:
        # markdownPattern "\[([^]\[]*)]\(([^)(]*)\)" (:200), plain text =
        # markup replaced by group(1), annotation values = '&'-split and
        # URL-decoded (:216-236; key=value pairs rejected), each injected
        # as an extra token at the position of the first plain-text token
        # its character span intersects (the AnnotationsInjector
        # position-increment-0 behavior).  Deviation (documented): the
        # injected value flows through the downstream filter chain like
        # any token, while the reference keeps annotation tokens verbatim.
        from urllib.parse import unquote

        md = re.compile(r"\[([^\]\[]*)\]\(([^)(]*)\)")
        max_len = int(spec.get("max_token_length", std.MAX_TOKEN_LENGTH))

        def _annotated(s: str) -> TokenStream:
            s = s or ""
            sb: List[str] = []
            plen = 0
            last = 0
            annos: List[tuple] = []
            for m in md.finditer(s):
                sb.append(s[last : m.start()])
                plen += m.start() - last
                start = plen
                sb.append(m.group(1))
                plen += len(m.group(1))
                last = m.end()
                for pair in m.group(2).split("&"):
                    if "=" in pair:
                        raise ValueError(
                            "key=value pairs are not supported in annotations"
                        )
                    v = unquote(pair)
                    if v:
                        annos.append((start, plen, v))
            sb.append(s[last:])
            plain = "".join(sb)
            toks: List[str] = []
            spans: List[tuple] = []
            for m2 in std._TOKEN_RE.finditer(plain):
                raw = m2.group(0)
                if not std._HAS_ALNUM_RE.search(raw):
                    continue
                o = m2.start()
                # _split_cjk uses a capturing split: parts concatenate
                # back to raw, so offsets accumulate exactly
                for part in std._split_cjk(raw):
                    for i in range(0, len(part), max_len):
                        chunk = part[i : i + max_len]
                        toks.append(chunk)
                        spans.append((o, o + len(chunk)))
                        o += len(chunk)
            out_t = list(toks)
            out_p = list(range(len(toks)))
            for a0, a1, v in annos:
                hi = max(a1, a0 + 1)  # empty-text annotation anchors right
                anchor = next(
                    (p for p, (s0, s1) in enumerate(spans) if s0 < hi and s1 > a0),
                    None,
                )
                if anchor is None:
                    continue  # annotation over text with no tokens
                out_t.append(v)
                out_p.append(anchor)
            order = sorted(range(len(out_t)), key=lambda i: out_p[i])
            return [out_t[i] for i in order], [out_p[i] for i in order]

        return _annotated
    if typ == "whitespace":
        return lambda s: _seq_positions((s or "").split())
    if typ == "letter":
        pat = re.compile(r"[^\W\d_]+", re.UNICODE)
        return lambda s: _seq_positions(pat.findall(s or ""))
    if typ == "lowercase":
        pat = re.compile(r"[^\W\d_]+", re.UNICODE)
        return lambda s: _seq_positions([std.java_lower(t) for t in pat.findall(s or "")])
    if typ == "keyword":
        return lambda s: _seq_positions([s] if s else [])
    if typ == "pattern":
        pat = re.compile(spec.get("pattern", r"\W+"))
        group = int(spec.get("group", -1))
        if group >= 0:
            return lambda s: _seq_positions(
                [m.group(group) for m in pat.finditer(s or "") if m.group(group)]
            )
        return lambda s: _seq_positions([t for t in pat.split(s or "") if t])
    if typ == "char_group":
        chars = spec.get("tokenize_on_chars", ["whitespace"])
        alts = []
        for c in chars:
            alts.append(
                {
                    "whitespace": r"\s",
                    "letter": r"[^\W\d_]",
                    "digit": r"\d",
                    "punctuation": "[" + re.escape(
                        r"""!"#$%&'()*+,-./:;<=>?@[\]^_`{|}~"""
                    ) + "]",
                    "symbol": "[" + re.escape("$+<=>^`|~") + "]",
                }.get(c, re.escape(c))
            )
        pat = re.compile("(?:" + "|".join(alts) + ")+")
        return lambda s: _seq_positions([t for t in pat.split(s or "") if t])
    if typ == "ngram":
        mn = int(spec.get("min_gram", 1))
        mx = int(spec.get("max_gram", 2))

        def _ngram_tok(s: str) -> TokenStream:
            s = s or ""
            toks = []
            for i in range(len(s)):
                for n in range(mn, mx + 1):
                    if i + n <= len(s):
                        toks.append(s[i : i + n])
            return _seq_positions(toks)

        return _ngram_tok
    if typ == "edge_ngram":
        mn = int(spec.get("min_gram", 1))
        mx = int(spec.get("max_gram", 2))

        def _edge_tok(s: str) -> TokenStream:
            s = s or ""
            toks = [s[:n] for n in range(mn, min(mx, len(s)) + 1)]
            return _seq_positions(toks)

        return _edge_tok
    if typ == "simple_pattern":
        # SimplePatternTokenizerFactory.java: tokens are the MATCHES of
        # the pattern (Lucene restricts to a deterministic-automaton
        # regex subset for speed; Python `re` is a documented superset).
        pat = re.compile(spec.get("pattern", ""))
        return lambda s: _seq_positions([m for m in pat.findall(s or "") if m])
    if typ == "simple_pattern_split":
        # SimplePatternSplitTokenizerFactory.java: pattern matches are
        # the SEPARATORS (same automaton-subset note as simple_pattern).
        pat = re.compile(spec.get("pattern", ""))
        return lambda s: _seq_positions([t for t in pat.split(s or "") if t])
    if typ == "uax_url_email":
        # UAX29URLEmailTokenizerFactory.java: the standard UAX#29
        # tokenizer plus URL and EMAIL as single tokens.  Emails and
        # URLs are carved out first, the remainder tokenizes standard.
        max_len = int(spec.get("max_token_length", std.MAX_TOKEN_LENGTH))
        carve = re.compile(
            r"""(?:[A-Za-z][A-Za-z0-9+.-]*://[^\s<>"']+)"""     # scheme URL
            r"""|(?:www\.[^\s<>"']+)"""                          # bare www.
            r"""|(?:[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,})"""
        )
        inner = make_tokenizer({"type": "standard", "max_token_length": max_len})

        def _uax(s: str) -> TokenStream:
            s = s or ""
            toks: List[str] = []
            last = 0
            for m in carve.finditer(s):
                toks.extend(inner(s[last : m.start()])[0])
                toks.append(m.group(0)[:max_len])
                last = m.end()
            toks.extend(inner(s[last:])[0])
            return _seq_positions(toks)

        return _uax
    if typ == "classic":
        # ClassicTokenizerFactory.java (the pre-UAX#29 English grammar):
        # keeps dotted acronyms (I.B.M. minus the final dot), words with
        # interior apostrophes (O'Neil), emails, and hostname/number
        # tokens with interior ./- as single tokens.  Approximated with
        # ordered regex alternatives over the JFlex grammar's token
        # classes (documented deviation: no trailing-acronym ambiguity
        # state).
        max_len = int(spec.get("max_token_length", std.MAX_TOKEN_LENGTH))
        tok = re.compile(
            r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"    # EMAIL
            r"|(?:[^\W\d_]\.){2,}"                                # ACRONYM
            r"|[^\W\d_]+(?:'[^\W\d_]+)+"                          # APOSTROPHE
            r"|(?=[\w.,/_-]*\d)\w+(?:[-_/,.]\w+)+"               # NUM (digit required)
            r"|[^\W\d_]+(?:[&@][^\W\d_]+)+"                      # COMPANY
            r"|\w+(?:\.\w+)+"                                     # HOST
            r"|\w+",
            re.UNICODE,
        )

        def _classic(s: str) -> TokenStream:
            toks = []
            for raw in tok.findall(s or ""):
                # ACRONYM drops its final dot, like the reference grammar
                if re.fullmatch(r"(?:[^\W\d_]\.){2,}", raw):
                    raw = raw[:-1]
                toks.append(raw[:max_len])
            return _seq_positions(toks)

        return _classic
    if typ == "thai":
        # ThaiTokenizerFactory.java uses the JDK Thai BreakIterator
        # (dictionary-driven word segmentation).  No Thai dictionary is
        # available in this environment, so Thai character runs are kept
        # whole and everything else tokenizes standard (documented
        # deviation — a run may span several Thai words).
        inner = make_tokenizer({"type": "standard"})
        runs = re.compile(r"[฀-๿]+|[^฀-๿]+")

        def _thai(s: str) -> TokenStream:
            toks: List[str] = []
            for seg in runs.findall(s or ""):
                if "฀" <= seg[0] <= "๿":
                    toks.append(seg)
                else:
                    toks.extend(inner(seg)[0])
            return _seq_positions(toks)

        return _thai
    if typ == "icu_tokenizer":
        # analysis-icu IcuTokenizerFactory.java: UAX#29 word-break with
        # per-script dictionary segmentation.  Our standard tokenizer IS
        # UAX#29 (with per-char Han splits); dictionary segmentation for
        # Thai/Khmer/Lao is unavailable without ICU data (documented
        # deviation — those runs fall out of the word-character classes).
        return make_tokenizer({**spec, "type": "standard"})
    if typ == "path_hierarchy":
        delim = spec.get("delimiter", "/")

        def _path(s: str) -> TokenStream:
            s = s or ""
            parts = [p for p in s.split(delim) if p != ""]
            toks = [delim.join(parts[: i + 1]) for i in range(len(parts))]
            if s.startswith(delim):
                toks = [delim + t for t in toks]
            # all path prefixes share position 0 (Lucene emits posInc 0)
            return toks, [0] * len(toks)

        return _path
    raise ValueError(f"unknown tokenizer: {typ}")


# --------------------------------------------------------------------------
# Token filters
# --------------------------------------------------------------------------

#: non-decomposable Latin letters from ASCIIFoldingFilter's table —
#: NFKD cannot strip these (they have no combining-mark decomposition),
#: so they are mapped explicitly first (r4, VERDICT #3 "icu_folding-
#: equivalent asciifolding extension")
_FOLD_EXTRA = str.maketrans({
    "ß": "ss", "ẞ": "SS", "æ": "ae", "Æ": "AE", "œ": "oe", "Œ": "OE",
    "ø": "o", "Ø": "O", "đ": "d", "Đ": "D", "ð": "d", "Ð": "D",
    "þ": "th", "Þ": "TH", "ł": "l", "Ł": "L", "ħ": "h", "Ħ": "H",
    "ŋ": "n", "Ŋ": "N", "ı": "i", "ĸ": "k", "ſ": "s",
    "ĳ": "ij", "Ĳ": "IJ",
})


def _fold_ascii(tok: str) -> str:
    # Explicit table for non-decomposables (ß, æ, ø, đ, þ, ł, ...) then
    # NFKD decompose and drop combining marks — together covering the
    # Latin blocks of Lucene's ASCIIFoldingFilter (NFKD also handles
    # compat ligatures, e.g. ﬁ -> fi).
    tok = tok.translate(_FOLD_EXTRA)
    return "".join(
        c for c in unicodedata.normalize("NFKD", tok)
        if not unicodedata.combining(c)
    )


def _cjk_width(tok: str) -> str:
    # CJKWidthFilterFactory.java / Lucene CJKWidthFilter: fold fullwidth
    # ASCII variants to halfwidth, and halfwidth katakana variants to
    # fullwidth (composing halfwidth voiced/semi-voiced marks into the
    # preceding kana, e.g. ﾊ + ﾞ -> バ)
    out = []
    for c in tok:
        o = ord(c)
        if 0xFF01 <= o <= 0xFF5E:
            out.append(chr(o - 0xFEE0))
        elif o == 0xFF9E:  # halfwidth voiced mark -> combining
            out.append("゙")
        elif o == 0xFF9F:  # halfwidth semi-voiced mark -> combining
            out.append("゚")
        elif 0xFF61 <= o <= 0xFF9D:
            out.append(unicodedata.normalize("NFKC", c))
        else:
            out.append(c)
    return unicodedata.normalize("NFC", "".join(out))


def _cjk_script(ch: str) -> Optional[str]:
    o = ord(ch)
    if 0x4E00 <= o <= 0x9FFF or 0x3400 <= o <= 0x4DBF or 0xF900 <= o <= 0xFAFF:
        return "han"
    if 0x3040 <= o <= 0x309F:
        return "hiragana"
    if 0x30A0 <= o <= 0x30FF or 0x31F0 <= o <= 0x31FF:
        return "katakana"
    if 0xAC00 <= o <= 0xD7AF or 0x1100 <= o <= 0x11FF or 0x3130 <= o <= 0x318F:
        return "hangul"
    return None


def _wd_split(token: str, split_case: bool, split_num: bool,
              possessive: bool) -> List[Tuple[str, str]]:
    """WordDelimiterFilter subword split: parts are (text, kind) with
    kind 'w' (letters) or 'n' (digits).  Boundaries: non-alphanumeric
    delimiters, letter<->digit transitions (split_on_numerics),
    lower->Upper transitions and acronym tails
    ("XMLFile" -> XML + File) (split_on_case_change); trailing 's
    possessives stripped first (stem_english_possessive)."""
    if (
        possessive
        and len(token) >= 2
        and token[-1] in "sS"
        and token[-2] in "'’"
    ):
        token = token[:-2]
    parts: List[Tuple[str, str]] = []
    cur = ""
    kind = ""
    prev_c = ""
    for c in token:
        k = "w" if c.isalpha() else ("n" if c.isdigit() else "")
        if not k:
            if cur:
                parts.append((cur, kind))
                cur, kind = "", ""
            prev_c = c
            continue
        if cur and (
            (split_num and k != kind)
            or (
                split_case and k == kind == "w"
                and c.isupper() and prev_c.islower()
            )
        ):
            parts.append((cur, kind))
            cur = ""
        elif (
            cur and split_case and k == kind == "w"
            and c.islower() and prev_c.isupper() and len(cur) >= 2
        ):
            # acronym boundary: the last upper belongs to the new part
            parts.append((cur[:-1], kind))
            cur = cur[-1]
        cur += c
        kind = k
        prev_c = c
    if cur:
        parts.append((cur, kind))
    return parts


def _wd_runs(parts: List[Tuple[str, str]], kind: str) -> List[str]:
    """Maximal runs of >= 2 adjacent same-kind subwords, concatenated
    (catenate_words/catenate_numbers)."""
    runs: List[str] = []
    cur: List[str] = []
    for txt, k in parts:
        if k == kind:
            cur.append(txt)
        else:
            if len(cur) >= 2:
                runs.append("".join(cur))
            cur = []
    if len(cur) >= 2:
        runs.append("".join(cur))
    return runs


def _scandinavian_normalize(t: str) -> str:
    """ScandinavianNormalizationFilter: interchangeable spellings
    normalize toward åÅæÆøØ (ä->æ, ö->ø, aa->å, ae->æ, ao->å, oe->ø,
    oo->ø)."""
    for a, b in (("aa", "å"), ("Aa", "Å"), ("AA", "Å"),
                 ("ao", "å"), ("Ao", "Å"), ("AO", "Å"),
                 ("ae", "æ"), ("Ae", "Æ"), ("AE", "Æ"),
                 ("oe", "ø"), ("Oe", "Ø"), ("OE", "Ø"),
                 ("oo", "ø"), ("Oo", "Ø"), ("OO", "Ø")):
        t = t.replace(a, b)
    return t.translate(_SCAND_NORM_MAP)


_SCAND_NORM_MAP = str.maketrans("äÄöÖ", "æÆøØ")
_SCAND_FOLD_MAP = str.maketrans("åÅäÄæÆöÖøØ", "aAaAaAoOoO")


def _scandinavian_fold(t: str) -> str:
    """ScandinavianFoldingFilter: å/ä/æ -> a, ö/ø -> o, and the double
    vowels aa/ao/ae/oe/oo collapse to their first letter."""
    for d in ("aa", "ao", "ae", "oe", "oo"):
        t = t.replace(d, d[0]).replace(d.capitalize(), d[0].upper()).replace(
            d.upper(), d[0].upper()
        )
    return t.translate(_SCAND_FOLD_MAP)


_AR_NORM_MAP = str.maketrans(
    {"آ": "ا", "أ": "ا", "إ": "ا",  # alefs
     "ى": "ي",   # alef maksura -> yeh
     "ة": "ه",   # teh marbuta -> heh
     "ـ": None,       # tatweel
     # harakat (tashkeel)
     "ً": None, "ٌ": None, "ٍ": None, "َ": None,
     "ُ": None, "ِ": None, "ّ": None, "ْ": None}
)


def _arabic_normalize(t: str) -> str:
    return t.translate(_AR_NORM_MAP)


_FA_NORM_MAP = str.maketrans(
    {"ي": "ی", "ے": "ی",  # yeh / yeh barree -> farsi yeh
     "ك": "ک",                       # kaf -> keheh
     "ۀ": "ه", "ہ": "ه",   # heh-ye / heh goal -> heh
     "ٔ": None}                           # hamza above
)


def _persian_normalize(t: str) -> str:
    return t.translate(_FA_NORM_MAP)


def _german_normalize(t: str) -> str:
    """GermanNormalizationFilter's state machine: fold ä/ö/ü -> a/o/u
    and ß -> ss; drop the 'e' of ae/oe/ue except after q or another
    vowel ('quelle', 'baue' keep it)."""
    N, V, U = 0, 1, 2
    state = N
    out: List[str] = []
    for c in t:
        if c in "ao":
            out.append(c)
            state = U
        elif c == "u":
            out.append(c)
            state = U if state == N else V
        elif c == "e":
            if state == U:
                state = V
                continue  # fold ae/oe/ue
            out.append(c)
            state = V
        elif c in "iqy":
            out.append(c)
            state = V
        elif c == "ä":
            out.append("a")
            state = V
        elif c == "ö":
            out.append("o")
            state = V
        elif c == "ü":
            out.append("u")
            state = V
        elif c == "ß":
            out.append("ss")
            state = N
        else:
            out.append(c)
            state = N
    return "".join(out)


_AR_PREFIXES = ("ال", "وال",
                "بال", "كال",
                "فال", "لل", "و")
_AR_SUFFIXES = ("ها", "ان", "ات",
                "ون", "ين", "يه",
                "ية", "ه", "ة", "ي")


def _arabic_light10_stem(t: str) -> str:
    """Light-10 Arabic stemmer (Larkey, Ballesteros & Connell 2002 —
    Lucene's ArabicStemmer): ONE prefix strip (waw needs >= 3 chars
    left, articles >= 2), then every matching suffix in table order
    (each leaves >= 2 chars)."""
    for p in _AR_PREFIXES:
        if t.startswith(p):
            if len(p) == 1:
                if len(t) < 4:
                    continue
            elif len(t) < len(p) + 2:
                continue
            t = t[len(p):]
            break
    for s in _AR_SUFFIXES:
        if t.endswith(s) and len(t) >= len(s) + 2:
            t = t[: -len(s)]
    return t


def _caumanns_german_stem(term: str) -> str:
    """GermanStemFilter's stemmer (Joerg Caumanns, *A Fast and Simple
    Stemming Algorithm for German Words*, 1999 — the algorithm
    ``german_stem`` pre-configures in
    ``CommonAnalysisModulePlugin.java:535``, distinct from the snowball
    ``german`` stemmer): lowercase; mask multi-char sequences with
    sentinels (sch/ch/ei/ie/ig/st, doubled chars, umlaut folds,
    ss-for-eszett); recursively strip the declension suffixes nd/em/er
    then e/s/n/t; the ``erin*`` and trailing-z optimizations; unmask;
    and drop the first ``ge`` of a ``gege`` particle.  Deviation note:
    where the historical Lucene source resets the substitution count on
    an ``sch`` mask (the ``substCount =+ 2`` typo) we accumulate it, as
    the paper intends — differs only when umlaut/ss masks precede an
    ``sch`` in the same token."""
    term = term.lower()
    if not term.isalpha():
        return term
    buf = list(term)
    subst = 0
    # -- substitute --------------------------------------------------
    c = 0
    while c < len(buf):
        if c > 0 and buf[c] == buf[c - 1]:
            buf[c] = "*"
        elif buf[c] == "ä":
            buf[c] = "a"
        elif buf[c] == "ö":
            buf[c] = "o"
        elif buf[c] == "ü":
            buf[c] = "u"
        elif buf[c] == "ß":
            buf[c] = "s"
            buf.insert(c + 1, "s")
            subst += 1
        if c < len(buf) - 1:
            if (
                c < len(buf) - 2
                and buf[c] == "s"
                and buf[c + 1] == "c"
                and buf[c + 2] == "h"
            ):
                buf[c] = "$"
                del buf[c + 1 : c + 3]
                subst += 2
            elif buf[c] == "c" and buf[c + 1] == "h":
                buf[c] = "§"
                del buf[c + 1]
                subst += 1
            elif buf[c] == "e" and buf[c + 1] == "i":
                buf[c] = "%"
                del buf[c + 1]
                subst += 1
            elif buf[c] == "i" and buf[c + 1] == "e":
                buf[c] = "&"
                del buf[c + 1]
                subst += 1
            elif buf[c] == "i" and buf[c + 1] == "g":
                buf[c] = "#"
                del buf[c + 1]
                subst += 1
            elif buf[c] == "s" and buf[c + 1] == "t":
                buf[c] = "!"
                del buf[c + 1]
                subst += 1
        c += 1

    def _strip() -> None:
        while len(buf) > 3:
            tail2 = "".join(buf[-2:])
            if len(buf) + subst > 5 and tail2 == "nd":
                del buf[-2:]
            elif len(buf) + subst > 4 and tail2 in ("em", "er"):
                del buf[-2:]
            elif buf[-1] in "esnt":
                del buf[-1]
            else:
                break

    _strip()
    # -- optimize ----------------------------------------------------
    if len(buf) > 5 and "".join(buf[-5:]) == "erin*":
        del buf[-1]
        _strip()
    if buf and buf[-1] == "z":
        buf[-1] = "x"
    # -- resubstitute ------------------------------------------------
    out: List[str] = []
    for ch in buf:
        if ch == "*":
            out.append(out[-1] if out else "*")
        elif ch == "$":
            out.append("sch")
        elif ch == "§":
            out.append("ch")
        elif ch == "%":
            out.append("ei")
        elif ch == "&":
            out.append("ie")
        elif ch == "#":
            out.append("ig")
        elif ch == "!":
            out.append("st")
        else:
            out.append(ch)
    res = "".join(out)
    # -- remove particle denotion ("gege.." -> "ge..") ---------------
    if len(res) > 4:
        i = res.find("gege")
        if i >= 0:
            res = res[:i] + res[i + 2 :]
    return res


_CZ_CASE_5 = ("ech", "ich", "ích", "ého", "ěmi", "emi", "ému",
              "ěte", "ete", "ěti", "eti", "ího", "iho", "ími",
              "ímu", "imu", "ách", "ata", "aty", "ých", "ama",
              "ami", "ové", "ovi", "ými")
_CZ_CASE_4 = ("em", "es", "ém", "ím", "ům", "at", "ám",
              "os", "us", "ým", "mi", "ou")
_CZ_VOWEL_TAIL = frozenset("aeiouůyáéíýě")


def _czech_stem(t: str) -> str:
    """Czech light stemmer (Ljiljana Dolamic & Jacques Savoy,
    *Indexing and stemming approaches for the Czech language*, 2009 —
    ``czech_stem`` / Lucene ``CzechStemFilter``): remove the longest
    case ending (length-guarded), then possessive ov/in/ův, then
    palatalization normalize (čt->ck, št->sk, c/č->k, z/ž->h, drop a
    penultimate e, ů->o).  Expects lowercase input like the reference
    (CzechAnalyzer lowercases first)."""
    n = len(t)
    if n > 7 and t.endswith("atech"):
        t = t[:-5]
    elif n > 6 and t.endswith(("ětem", "etem", "atům")):
        t = t[:-4]
    elif n > 5 and t.endswith(_CZ_CASE_5):
        t = t[:-3]
    elif n > 4 and t.endswith(_CZ_CASE_4):
        t = t[:-2]
    elif n > 3 and t[-1] in _CZ_VOWEL_TAIL:
        t = t[:-1]
    if len(t) > 5 and t.endswith(("ov", "in", "ův")):
        t = t[:-2]
    if not t:
        return t
    if t.endswith("čt"):
        return t[:-2] + "ck"
    if t.endswith("št"):
        return t[:-2] + "sk"
    if t[-1] in "cč":
        return t[:-1] + "k"
    if t[-1] in "zž":
        return t[:-1] + "h"
    if len(t) > 1 and t[-2] == "e":
        return t[:-2] + t[-1]
    if len(t) > 2 and t[-2] == "ů":
        return t[:-2] + "o" + t[-1]
    return t


#: SerbianNormalizationFilter's "bald" latin map: Cyrillic letters to
#: their Latin digraph/letter, and Latin diacritics folded to ASCII.
_SR_MULTI = (("љ", "lj"), ("Љ", "lj"), ("њ", "nj"), ("Њ", "nj"),
             ("џ", "dz"), ("Џ", "dz"), ("ђ", "dj"), ("Ђ", "dj"),
             ("dž", "dz"), ("Dž", "dz"), ("DŽ", "dz"), ("đ", "dj"), ("Đ", "dj"))
_SR_MAP = str.maketrans(
    {"а": "a", "б": "b", "в": "v", "г": "g", "д": "d", "е": "e",
     "ж": "z", "з": "z", "и": "i", "ј": "j", "к": "k", "л": "l",
     "м": "m", "н": "n", "о": "o", "п": "p", "р": "r", "с": "s",
     "т": "t", "ћ": "c", "у": "u", "ф": "f", "х": "h", "ц": "c",
     "ч": "c", "ш": "s",
     "А": "a", "Б": "b", "В": "v", "Г": "g", "Д": "d", "Е": "e",
     "Ж": "z", "З": "z", "И": "i", "Ј": "j", "К": "k", "Л": "l",
     "М": "m", "Н": "n", "О": "o", "П": "p", "Р": "r", "С": "s",
     "Т": "t", "Ћ": "c", "У": "u", "Ф": "f", "Х": "h", "Ц": "c",
     "Ч": "c", "Ш": "s",
     "č": "c", "Č": "c", "ć": "c", "Ć": "c",
     "ž": "z", "Ž": "z", "š": "s", "Š": "s"}
)


def _serbian_normalize(t: str) -> str:
    """SerbianNormalizationFilter (``serbian_normalization``,
    CommonAnalysisModulePlugin.java:330): Cyrillic -> bald Latin and
    Latin diacritics folded (č/ć->c, ž->z, š->s, đ->dj, dž->dz)."""
    for a, b in _SR_MULTI:
        if a in t:
            t = t.replace(a, b)
    return t.translate(_SR_MAP)


#: SoraniNormalizer (analysis-common ``sorani_normalization``; rules
#: from Esmaili et al., *Building a Test Collection for Sorani Kurdish*):
#: Arabic yeh/alef-maksura -> Farsi yeh, kaf -> keheh, heh-doachashmee
#: -> heh, final heh (or heh+ZWNJ anywhere) -> ae, word-initial reh ->
#: rreh, tatweel/harakat/ZWNJ removed.  Best-effort port — the exact
#: Lucene table is not reproducible here; deviations documented.
_CKB_MAP = str.maketrans(
    {"ي": "ی", "ى": "ی",  # yeh, alef maksura -> farsi yeh
     "ك": "ک",                      # kaf -> keheh
     "ھ": "ه",                      # heh doachashmee -> heh
     "ـ": None,                          # tatweel
     "ً": None, "ٌ": None, "ٍ": None, "َ": None,
     "ُ": None, "ِ": None, "ّ": None, "ْ": None}
)


def _sorani_normalize(t: str) -> str:
    t = t.replace("ه‌", "ە")   # heh+ZWNJ -> ae
    t = t.replace("‌", "")
    t = t.translate(_CKB_MAP)
    if t.endswith("ه"):                   # final heh -> ae
        t = t[:-1] + "ە"
    if t.startswith("ر"):                 # initial reh -> rreh
        t = "ڕ" + t[1:]
    return t


#: HindiNormalizer (``hindi_normalization``; Dolamic & Savoy, *UniNE at
#: FIRE 2010* normalizations): chandrabindu -> anusvara, nukta
#: consonants decomposed to their base letter, long vowels/matras
#: shortened, candra e/o folded, ZWJ/ZWNJ removed.  Best-effort port.
_HI_MAP = str.maketrans(
    {"ँ": "ं",                      # chandrabindu -> anusvara
     # nukta consonants -> base
     "ऩ": "न", "ऱ": "र", "ऴ": "ळ",
     "क़": "क", "ख़": "ख", "ग़": "ग",
     "ज़": "ज", "ड़": "ड", "ढ़": "ढ",
     "फ़": "फ", "य़": "य",
     "़": None,                          # standalone nukta
     # long independent vowels -> short
     "आ": "अ", "ई": "इ", "ऊ": "उ",
     "ऐ": "ए", "औ": "ओ",
     # candra forms
     "ऑ": "ओ", "ऒ": "ओ", "ॲ": "अ",
     # long matras -> short
     "ी": "ि", "ू": "ु",
     "ै": "े", "ौ": "ो",
     "ॅ": "े", "ॉ": "ो",
     "‌": None, "‍": None}          # ZWNJ / ZWJ
)


def _hindi_normalize(t: str) -> str:
    import unicodedata

    # NFD exposes composed nukta forms, the map folds them, NFC recombines
    t = unicodedata.normalize("NFD", t).translate(_HI_MAP)
    return unicodedata.normalize("NFC", t)


#: BengaliNormalizer (``bengali_normalization``; normalizations from
#: *A Double Metaphone Encoding for Bangla*, UzZaman & Khan 2005):
#: nukta consonants decomposed, khanda-ta -> ta+hasant, chandrabindu
#: -> anusvara, assamese ra/va -> bengali ra/va.  Best-effort port.
_BN_MAP = str.maketrans(
    {"ঁ": "ং",                       # candrabindu -> anusvara
     "ড়": "ড", "ঢ়": "ঢ", "য়": "য",
     "়": None,                           # standalone nukta
     "ৰ": "র", "ৱ": "ব"}   # assamese ra/va
)


def _bengali_normalize(t: str) -> str:
    import unicodedata

    t = t.replace("ৎ", "ত্")    # khanda ta -> ta + hasant
    t = unicodedata.normalize("NFD", t).translate(_BN_MAP)
    return unicodedata.normalize("NFC", t)


#: base+nukta pairs excluded from Unicode NFC composition (Devanagari,
#: Bengali, Gurmukhi, Oriya) — IndicNormalizer composes these to the
#: precomposed codepoint, so the analog must map them explicitly.
_INDIC_NUKTA = {
    unicodedata.normalize("NFD", chr(cp)): chr(cp)
    for cp in (
        # Devanagari 0958-095F + 0929/0931/0934
        *range(0x0958, 0x0960), 0x0929, 0x0931, 0x0934,
        # Bengali 09DC/09DD/09DF
        0x09DC, 0x09DD, 0x09DF,
        # Gurmukhi 0A59-0A5B/0A5E, Oriya 0B5C/0B5D
        0x0A59, 0x0A5A, 0x0A5B, 0x0A5E, 0x0B5C, 0x0B5D,
    )
}


def _indic_normalize(t: str) -> str:
    """IndicNormalizer (``indic_normalization``): compose split/legacy
    Indic code sequences to canonical form.  The Lucene table is
    script-data-driven; the analog is stdlib NFC composition plus the
    base+nukta pairs NFC excludes (documented analog — the reference's
    additional two-part-vowel matra tables for southern scripts are
    covered by NFC where canonical)."""
    import unicodedata

    t = unicodedata.normalize("NFC", t)
    for seq, comp in _INDIC_NUKTA.items():
        if seq in t:
            t = t.replace(seq, comp)
    return t


def make_token_filter(spec, ctx: Optional[dict] = None) -> Callable[[TokenStream], TokenStream]:
    """Resolve one token-filter spec.

    ``ctx`` is the per-chain build context the :class:`Analyzer`
    threads through its filter list IN ORDER: ``keyword_marker`` /
    ``stemmer_override`` add protected vocabulary to it at build time,
    and every stemmer factory built LATER snapshots the set — the
    keyword-attribute contract of Lucene's KeywordMarkerFilter without
    per-token flags (a marker placed after the stemmer correctly has
    no effect)."""
    if isinstance(spec, str):
        spec = {"type": spec}
    typ = spec["type"]

    def _map1(fn):
        def _apply(ts: TokenStream) -> TokenStream:
            toks, pos = ts
            return [fn(t) for t in toks], list(pos)

        return _apply

    def _stem(fn):
        """A stemmer body honoring the protected vocabulary
        accumulated so far (keyword_marker / stemmer_override)."""
        if ctx is None or not (
            ctx.get("protected") or ctx.get("protected_ci")
            or ctx.get("patterns")
        ):
            return _map1(fn)
        words = frozenset(ctx.get("protected", ()))
        words_ci = frozenset(ctx.get("protected_ci", ()))
        pats = tuple(ctx.get("patterns", ()))

        def guarded(t: str) -> str:
            if (
                t in words
                or t.lower() in words_ci
                or any(p.fullmatch(t) for p in pats)
            ):
                return t
            return fn(t)

        return _map1(guarded)

    if typ == "lowercase":
        return _map1(std.java_lower)
    if typ == "uppercase":
        return _map1(str.upper)
    if typ == "asciifolding":
        return _map1(_fold_ascii)
    if typ in ("porter_stem", "kstem"):
        return _stem(porter_stem)
    if typ in ("stemmer", "snowball"):
        # StemmerTokenFilterFactory.java language table; the `snowball`
        # filter (SnowballTokenFilterFactory.java) takes capitalized
        # names and defaults to English
        lang = spec.get("language", spec.get("name", "porter" if typ == "stemmer" else "English"))
        lang = str(lang).lower()
        from opensearch_spark.analysis import snowball as _sb

        if lang in ("porter", "english"):
            # deviation note: `snowball` English in the reference is
            # Porter2 (EnglishStemmer); we serve Porter 1980 for both
            return _stem(porter_stem)
        if lang == "french":
            return _stem(_sb.french_stem)
        if lang in ("german", "german2"):
            return _stem(_sb.german_stem)
        if lang == "spanish":
            return _stem(_sb.spanish_stem)
        if lang == "russian":
            return _stem(_sb.russian_stem)
        if lang == "italian":
            return _stem(_sb.italian_stem)
        if lang == "dutch":
            return _stem(_sb.dutch_stem)
        if lang == "danish":
            return _stem(_sb.danish_stem)
        if lang == "norwegian":
            return _stem(_sb.norwegian_stem)
        if lang == "swedish":
            return _stem(_sb.swedish_stem)
        if lang == "portuguese":
            return _stem(_sb.portuguese_stem)
        if lang == "romanian":
            return _stem(_sb.romanian_stem)
        if lang == "finnish":
            return _stem(_sb.finnish_stem)
        # the Lucene light/minimal family registered in
        # StemmerTokenFilterFactory.java:146-181
        if lang in ("minimal_english", "minimalenglish"):
            return _stem(english_minimal_stem)
        if lang in ("plural_english", "pluralenglish"):
            return _stem(english_plural_stem)
        if lang in ("possessive_english", "possessiveenglish"):
            return _stem(english_possessive)
        if lang in ("minimal_french", "minimalfrench"):
            return _stem(french_minimal_stem)
        raise ValueError(f"stemmer language not implemented: {lang}")
    if typ == "elision":
        # ElisionTokenFilterFactory.java — strip l'/d'/qu'... article
        # prefixes; default article set = FrenchAnalyzer.DEFAULT_ARTICLES
        # (a case-INSENSITIVE CharArraySet).  Custom `articles` default
        # to case-SENSITIVE matching: Analysis.parseArticles reads
        # articles_case with default FALSE (ignoreCase=false).
        custom = "articles" in spec
        articles = tuple(
            spec.get(
                "articles",
                ("l", "m", "t", "qu", "n", "s", "j", "d", "c",
                 "jusqu", "quoiqu", "lorsqu", "puisqu"),
            )
        )
        ci = bool(spec.get("articles_case", not custom))

        def _elide(t: str) -> str:
            low = t.lower() if ci else t
            for a in articles:
                for apo in ("'", "’"):
                    p = a + apo
                    if low.startswith(p) and len(t) > len(p):
                        return t[len(p):]
            return t

        return _map1(_elide)
    if typ == "cjk_width":
        return _map1(_cjk_width)
    if typ == "cjk_bigram":
        # CJKBigramFilterFactory.java: form character bigrams across
        # adjacent CJK tokens (standard tokenizer emits han/hiragana as
        # single-char tokens and katakana/hangul as runs; adjacency =
        # consecutive positions).  A lone CJK char stays a unigram;
        # output_unigrams=true emits both (bigram shares the position of
        # its first char).  Output positions are renumbered sequentially
        # (each emitted token advances one position), matching the
        # filter's one-increment-per-token stream shape.
        ignored = set(spec.get("ignored_scripts", ()))
        enabled = {"han", "hiragana", "katakana", "hangul"} - ignored
        out_uni = bool(spec.get("output_unigrams", False))

        def _cjk_bigram(ts: TokenStream) -> TokenStream:
            toks, pos = ts
            groups: List[List] = []
            prev_p = None
            for t, p in zip(toks, pos):
                s = _cjk_script(t[0]) if t else None
                is_run = (
                    s in enabled
                    and all(_cjk_script(c) == s for c in t)
                )
                if (
                    is_run
                    and groups
                    and groups[-1][0] == "cjk"
                    and prev_p is not None
                    and p == prev_p + 1
                ):
                    groups[-1][1] += t
                else:
                    groups.append(["cjk" if is_run else "plain", t])
                prev_p = p
            out_t: List[str] = []
            out_p: List[int] = []
            np_ = 0
            for kind, s in groups:
                if kind == "plain" or len(s) == 1:
                    out_t.append(s)
                    out_p.append(np_)
                    np_ += 1
                    continue
                for i in range(len(s)):
                    if out_uni:
                        out_t.append(s[i])
                        out_p.append(np_)
                        if i < len(s) - 1:
                            out_t.append(s[i : i + 2])
                            out_p.append(np_)
                        np_ += 1
                    elif i < len(s) - 1:
                        out_t.append(s[i : i + 2])
                        out_p.append(np_)
                        np_ += 1
            return out_t, out_p

        return _cjk_bigram
    if typ == "reverse":
        return _map1(lambda t: t[::-1])
    if typ == "trim":
        return _map1(str.strip)
    if typ == "truncate":
        n = int(spec.get("length", 10))
        return _map1(lambda t: t[:n])
    if typ == "apostrophe":
        return _map1(lambda t: t.split("'", 1)[0].split("’", 1)[0])
    if typ == "stop":
        stop = std.resolve_stopwords(spec.get("stopwords", "_english_"))
        stop = stop if stop is not None else frozenset()

        def _stop(ts: TokenStream) -> TokenStream:
            toks, pos = ts
            keep = [(t, p) for t, p in zip(toks, pos) if t not in stop]
            return [t for t, _ in keep], [p for _, p in keep]

        return _stop
    if typ == "length":
        mn = int(spec.get("min", 0))
        mx = int(spec.get("max", 2**31 - 1))

        def _length(ts: TokenStream) -> TokenStream:
            toks, pos = ts
            keep = [(t, p) for t, p in zip(toks, pos) if mn <= len(t) <= mx]
            return [t for t, _ in keep], [p for _, p in keep]

        return _length
    if typ == "unique":
        def _unique(ts: TokenStream) -> TokenStream:
            toks, pos = ts
            seen = set()
            out_t, out_p = [], []
            for t, p in zip(toks, pos):
                if t not in seen:
                    seen.add(t)
                    out_t.append(t)
                    out_p.append(p)
            return out_t, out_p

        return _unique
    if typ == "ngram":
        mn = int(spec.get("min_gram", 1))
        mx = int(spec.get("max_gram", 2))

        def _ngram(ts: TokenStream) -> TokenStream:
            toks, pos = ts
            out_t, out_p = [], []
            for t, p in zip(toks, pos):
                for i in range(len(t)):
                    for n in range(mn, mx + 1):
                        if i + n <= len(t):
                            out_t.append(t[i : i + n])
                            out_p.append(p)
            return out_t, out_p

        return _ngram
    if typ == "edge_ngram":
        mn = int(spec.get("min_gram", 1))
        mx = int(spec.get("max_gram", 2))

        def _edge(ts: TokenStream) -> TokenStream:
            toks, pos = ts
            out_t, out_p = [], []
            for t, p in zip(toks, pos):
                for n in range(mn, min(mx, len(t)) + 1):
                    out_t.append(t[:n])
                    out_p.append(p)
            return out_t, out_p

        return _edge
    if typ == "shingle":
        mn = int(spec.get("min_shingle_size", 2))
        mx = int(spec.get("max_shingle_size", 2))
        sep = spec.get("token_separator", " ")
        unigrams = bool(spec.get("output_unigrams", True))

        def _shingle(ts: TokenStream) -> TokenStream:
            toks, pos = ts
            out_t, out_p = [], []
            for i, (t, p) in enumerate(zip(toks, pos)):
                if unigrams:
                    out_t.append(t)
                    out_p.append(p)
                for n in range(mn, mx + 1):
                    if i + n <= len(toks):
                        out_t.append(sep.join(toks[i : i + n]))
                        out_p.append(p)
            return out_t, out_p

        return _shingle
    if typ == "synonym":
        # "a, b => c" (explicit mapping) and "a, b, c" (equivalence class)
        mapping: Dict[str, List[str]] = {}
        for rule in spec.get("synonyms", []):
            if "=>" in rule:
                lhs, rhs = rule.split("=>", 1)
                targets = [t.strip() for t in rhs.split(",") if t.strip()]
                for src in lhs.split(","):
                    mapping[src.strip()] = targets
            else:
                group = [t.strip() for t in rule.split(",") if t.strip()]
                for src in group:
                    # equivalence: each term expands to the whole group
                    mapping[src] = group

        def _synonym(ts: TokenStream) -> TokenStream:
            # both rule kinds expand to their target list at the source
            # position: "a => c" replaces (a not in targets), "a, b"
            # equivalence injects the group (a in targets)
            toks, pos = ts
            out_t, out_p = [], []
            for t, p in zip(toks, pos):
                for s in mapping.get(t, (t,)):
                    out_t.append(s)
                    out_p.append(p)
            return out_t, out_p

        return _synonym
    if typ == "phonetic":
        # analysis-phonetic plugin (PhoneticTokenFilterFactory.java):
        # encoder selects the code (metaphone default); replace=true
        # swaps the token for its code, replace=false injects the
        # code(s) beside the original at the same position (Lucene
        # PhoneticFilter / DoubleMetaphoneFilter inject semantics).
        # Tokens whose code is empty pass through unchanged.
        from opensearch_spark.analysis import phonetic as _ph

        enc = _ph.encode_token(spec)
        replace = bool(spec.get("replace", True))

        def _phonetic(ts: TokenStream) -> TokenStream:
            toks, pos = ts
            out_t, out_p = [], []
            for t, p in zip(toks, pos):
                codes = enc(t)
                if replace:
                    if codes:
                        for c in codes:
                            out_t.append(c)
                            out_p.append(p)
                    else:
                        out_t.append(t)
                        out_p.append(p)
                else:
                    out_t.append(t)
                    out_p.append(p)
                    for c in codes:
                        if c != t:
                            out_t.append(c)
                            out_p.append(p)
            return out_t, out_p

        return _phonetic
    if typ == "synonym_graph":
        # SynonymGraphFilterFactory.java — our streams are positional
        # (already flat), so the graph filter resolves to the same
        # expansion the `synonym` filter produces (the flatten_graph
        # step is implicit)
        return make_token_filter({**spec, "type": "synonym"}, ctx)
    if typ == "flatten_graph":
        # FlattenGraphTokenFilterFactory.java — our token streams carry
        # plain positions (no posLength graphs), so flattening is the
        # identity
        return lambda ts: ts
    if typ == "keyword_marker":
        # KeywordMarkerTokenFilterFactory.java: protect tokens from the
        # stemmers that FOLLOW this filter in the chain (see the ctx
        # note on make_token_filter)
        if ctx is not None:
            kws = spec.get("keywords", [])
            if bool(spec.get("ignore_case", False)):
                ctx["protected_ci"].update(str(w).lower() for w in kws)
            else:
                ctx["protected"].update(str(w) for w in kws)
            if spec.get("keywords_pattern"):
                ctx["patterns"].append(re.compile(spec["keywords_pattern"]))
        return lambda ts: ts
    if typ == "stemmer_override":
        # StemmerOverrideTokenFilterFactory.java: "token => stem" rules
        # applied here; rule OUTPUTS are protected from later stemmers.
        # Deviation: protection is by VALUE, so a surface token equal
        # to a rule output is also protected (Lucene flags the
        # instance).
        rules: Dict[str, str] = {}
        for rule in spec.get("rules", []):
            if "=>" not in rule:
                raise ValueError(
                    f"stemmer_override rule needs 'a => b': {rule!r}"
                )
            lhs, rhs = rule.split("=>", 1)
            for src in lhs.split(","):
                rules[src.strip()] = rhs.strip()
        if ctx is not None:
            ctx["protected"].update(rules.values())
        return _map1(lambda t: rules.get(t, t))
    if typ in ("word_delimiter", "word_delimiter_graph"):
        # WordDelimiterTokenFilterFactory.java /
        # WordDelimiterGraphTokenFilterFactory.java (identical output
        # here: flat positional streams).  Output positions are
        # renumbered sequentially — each emitted subword advances one
        # position; preserved originals and catenations share the
        # FIRST subword's position (the same one-increment-per-token
        # stream shape cjk_bigram uses).
        gen_w = bool(spec.get("generate_word_parts", True))
        gen_n = bool(spec.get("generate_number_parts", True))
        cat_w = bool(spec.get("catenate_words", False))
        cat_n = bool(spec.get("catenate_numbers", False))
        cat_all = bool(spec.get("catenate_all", False))
        split_case = bool(spec.get("split_on_case_change", True))
        split_num = bool(spec.get("split_on_numerics", True))
        preserve = bool(spec.get("preserve_original", False))
        possessive = bool(spec.get("stem_english_possessive", True))
        protected_words = frozenset(spec.get("protected_words", ()))

        def _word_delimiter(ts: TokenStream) -> TokenStream:
            toks, _pos = ts
            out_t: List[str] = []
            out_p: List[int] = []
            nxt = 0
            for t in toks:
                if t in protected_words:
                    out_t.append(t)
                    out_p.append(nxt)
                    nxt += 1
                    continue
                parts = _wd_split(t, split_case, split_num, possessive)
                emit = [
                    (txt, k) for txt, k in parts
                    if (k == "w" and gen_w) or (k == "n" and gen_n)
                ]
                base = nxt
                overlays: List[str] = []
                if preserve:
                    overlays.append(t)
                if cat_all and len(parts) >= 2:
                    overlays.append("".join(x for x, _ in parts))
                if cat_w:
                    overlays.extend(_wd_runs(parts, "w"))
                if cat_n:
                    overlays.extend(_wd_runs(parts, "n"))
                for o in overlays:
                    out_t.append(o)
                    out_p.append(base)
                for txt, _k in emit:
                    out_t.append(txt)
                    out_p.append(nxt)
                    nxt += 1
                if not emit and overlays:
                    nxt = base + 1
            return out_t, out_p

        return _word_delimiter
    if typ == "common_grams":
        # CommonGramsTokenFilterFactory.java: bigrams joining a common
        # word with its neighbor ("the_quick"), sharing the first
        # word's position.  query_mode (CommonGramsQueryFilter): the
        # unigrams a gram covers are dropped.
        ci = bool(spec.get("ignore_case", False))
        common = frozenset(
            (w.lower() if ci else w) for w in spec.get("common_words", ())
        )

        def _is_common(t: str) -> bool:
            return (t.lower() if ci else t) in common

        qmode = bool(spec.get("query_mode", False))

        def _common_grams(ts: TokenStream) -> TokenStream:
            toks, pos = ts
            out_t: List[str] = []
            out_p: List[int] = []
            covered = [False] * len(toks)
            grams: List[Optional[str]] = [None] * len(toks)
            for i in range(len(toks) - 1):
                # grams join POSITIONALLY adjacent tokens only (a stop
                # gap breaks the pair, like the reference's posInc check)
                if pos[i + 1] == pos[i] + 1 and (
                    _is_common(toks[i]) or _is_common(toks[i + 1])
                ):
                    grams[i] = f"{toks[i]}_{toks[i + 1]}"
                    covered[i] = covered[i + 1] = True
            for i, (t, p) in enumerate(zip(toks, pos)):
                if not qmode or not covered[i]:
                    out_t.append(t)
                    out_p.append(p)
                if grams[i] is not None:
                    out_t.append(grams[i])
                    out_p.append(p)
            return out_t, out_p

        return _common_grams
    if typ == "keep":
        # KeepWordFilterFactory.java (keep_words_case lowercases)
        ci = bool(spec.get("keep_words_case", False))
        kept = frozenset(
            (str(w).lower() if ci else str(w))
            for w in spec.get("keep_words", ())
        )

        def _keep(ts: TokenStream) -> TokenStream:
            toks, pos = ts
            z = [
                (t, p) for t, p in zip(toks, pos)
                if (t.lower() if ci else t) in kept
            ]
            return [t for t, _ in z], [p for _, p in z]

        return _keep
    if typ == "keep_types":
        # KeepTypesFilterFactory.java.  Deviation: our streams carry no
        # tokenizer type attribute, so types are re-derived lexically —
        # all-digits -> <NUM>, else <ALPHANUM> (the two types the
        # standard tokenizer emits for this corpus alphabet).
        types = frozenset(spec.get("types", ()))
        include = spec.get("mode", "include") == "include"

        def _ttype(t: str) -> str:
            return "<NUM>" if t and all(c.isdigit() for c in t) else "<ALPHANUM>"

        def _keep_types(ts: TokenStream) -> TokenStream:
            toks, pos = ts
            z = [
                (t, p) for t, p in zip(toks, pos)
                if (_ttype(t) in types) == include
            ]
            return [t for t, _ in z], [p for _, p in z]

        return _keep_types
    if typ == "limit":
        # LimitTokenCountFilterFactory.java (max_token_count default 1)
        mx = int(spec.get("max_token_count", 1))

        def _limit(ts: TokenStream) -> TokenStream:
            toks, pos = ts
            return list(toks[:mx]), list(pos[:mx])

        return _limit
    if typ == "decimal_digit":
        # DecimalDigitFilterFactory.java: any Unicode decimal digit
        # folds to 0-9
        def _dec(t: str) -> str:
            return "".join(
                str(unicodedata.digit(c))
                if unicodedata.category(c) == "Nd" else c
                for c in t
            )

        return _map1(_dec)
    if typ == "fingerprint":
        # FingerprintTokenFilterFactory.java: sort unique tokens, join
        # with the separator, ONE output token (capped)
        sep = spec.get("separator", " ")
        mx = int(spec.get("max_output_size", 255))

        def _fingerprint(ts: TokenStream) -> TokenStream:
            toks, _pos = ts
            if not toks:
                return [], []
            joined = sep.join(sorted(set(toks)))
            if len(joined) > mx:
                return [], []
            return [joined], [0]

        return _fingerprint
    if typ == "remove_duplicates":
        # RemoveDuplicatesTokenFilterFactory.java: drop repeats of the
        # same term at the same position
        def _rmdup(ts: TokenStream) -> TokenStream:
            toks, pos = ts
            seen = set()
            out_t, out_p = [], []
            for t, p in zip(toks, pos):
                if (t, p) not in seen:
                    seen.add((t, p))
                    out_t.append(t)
                    out_p.append(p)
            return out_t, out_p

        return _rmdup
    if typ == "pattern_capture":
        # PatternCaptureGroupTokenFilterFactory.java: emit every capture
        # group of every pattern (whole match when a pattern has no
        # groups); preserve_original defaults true; emissions share the
        # source token's position
        pats = [re.compile(p) for p in spec.get("patterns", [])]
        preserve = bool(spec.get("preserve_original", True))

        def _pcapture(ts: TokenStream) -> TokenStream:
            toks, pos = ts
            out_t, out_p = [], []
            for t, p in zip(toks, pos):
                emitted = []
                for pat in pats:
                    for m in pat.finditer(t):
                        gs = m.groups() or (m.group(0),)
                        emitted.extend(g for g in gs if g)
                if preserve or not emitted:
                    out_t.append(t)
                    out_p.append(p)
                for g in emitted:
                    if g != t or not preserve:
                        out_t.append(g)
                        out_p.append(p)
            return out_t, out_p

        return _pcapture
    if typ == "classic":
        # ClassicFilterFactory.java: strip trailing 's and the dots of
        # acronym tokens (U.S.A. -> USA).  Deviation: acronyms are
        # detected lexically (letter-dot alternation) — our streams
        # carry no ClassicTokenizer <ACRONYM> type attribute.
        _acro = re.compile(r"^(?:\w\.)+\w?\.?$")

        def _classic(t: str) -> str:
            if len(t) >= 2 and t[-1] in "sS" and t[-2] in "'’":
                t = t[:-2]
            if _acro.match(t):
                t = t.replace(".", "")
            return t

        return _map1(_classic)
    if typ == "scandinavian_normalization":
        return _map1(_scandinavian_normalize)
    if typ == "scandinavian_folding":
        return _map1(_scandinavian_fold)
    if typ == "pattern_replace":
        # PatternReplaceTokenFilterFactory.java (the TOKEN-filter
        # variant; the char filter of the same name rewrites the raw
        # text).  `all` (default true) replaces every occurrence.
        pat = re.compile(spec["pattern"])
        repl = spec.get("replacement", "")
        count = 0 if bool(spec.get("all", True)) else 1
        return _map1(lambda t: pat.sub(repl, t, count=count))
    if typ == "multiplexer":
        # MultiplexerTokenFilterFactory.java: each token runs through
        # every listed sub-chain (comma-joined filter names) and all
        # distinct outputs emit at the SAME position;
        # preserve_original (default true) keeps the input token first.
        chains = []
        for entry in spec.get("filters", ()):
            names = [n.strip() for n in str(entry).split(",") if n.strip()]
            chains.append([make_token_filter(n, ctx) for n in names])
        preserve = bool(spec.get("preserve_original", True))

        def _multiplex(ts: TokenStream) -> TokenStream:
            toks, pos = ts
            out_t, out_p = [], []
            for t, p in zip(toks, pos):
                seen = set()
                if preserve:
                    seen.add(t)
                    out_t.append(t)
                    out_p.append(p)
                for chain_fns in chains:
                    sub: TokenStream = ([t], [p])
                    for fn in chain_fns:
                        sub = fn(sub)
                    for st, sp in zip(*sub):
                        if st not in seen:
                            seen.add(st)
                            out_t.append(st)
                            out_p.append(sp)
            return out_t, out_p

        return _multiplex
    if typ == "arabic_normalization":
        # ArabicNormalizationFilterFactory.java (ArabicNormalizer):
        # alef variants -> bare alef, alef maksura -> yeh, teh marbuta
        # -> heh, tatweel and harakat (tashkeel) removed
        return _map1(_arabic_normalize)
    if typ == "persian_normalization":
        # PersianNormalizationFilterFactory.java (PersianNormalizer):
        # Arabic yeh/kaf -> Farsi forms, heh hamza/heh-ye -> heh,
        # zero-width non-joiner -> space
        return _map1(_persian_normalize)
    if typ == "german_normalization":
        # GermanNormalizationFilterFactory.java (GermanNormalizer
        # state machine): ä/ö/ü fold to a/o/u, ß -> ss, and the 'e' of
        # ae/oe/ue is dropped UNLESS the u follows q or another vowel
        # ("quelle", "baue" keep their e)
        return _map1(_german_normalize)
    if typ == "arabic_stem":
        # ArabicStemTokenFilterFactory.java (ArabicStemmer = the
        # published Light-10 stemmer, Larkey/Ballesteros/Connell 2002):
        # strip waw + definite-article prefixes, then the longest of
        # the 10 suffixes, with the stemmer's minimum-length guards
        return _map1(_arabic_light10_stem)
    if typ in ("french_stem", "russian_stem", "dutch_stem"):
        # Legacy per-language stem filters: the reference pre-configures
        # each as SnowballFilter(French/Russian/Dutch)
        # (CommonAnalysisModulePlugin.java:522,533,563) — exact aliases
        # of our snowball ports.
        from opensearch_spark.analysis import snowball as _sb

        return _stem(
            {"french_stem": _sb.french_stem,
             "russian_stem": _sb.russian_stem,
             "dutch_stem": _sb.dutch_stem}[typ]
        )
    if typ == "german_stem":
        # GermanStemFilter (CommonAnalysisModulePlugin.java:535) — the
        # Caumanns 1999 algorithm, NOT the snowball german stemmer.
        return _stem(_caumanns_german_stem)
    if typ == "brazilian_stem":
        # BrazilianStemFilter (CommonAnalysisModulePlugin.java:495).
        # Documented deviation: we serve the snowball Portuguese
        # stemmer; the reference's BrazilianStemmer is a distinct
        # RSLP-family ruleset whose full exception tables are not
        # reproduced here (same precedent as kstem -> porter).
        from opensearch_spark.analysis import snowball as _sb

        return _stem(_sb.portuguese_stem)
    if typ == "czech_stem":
        # CzechStemFilter (CommonAnalysisModulePlugin.java:502) —
        # Dolamic & Savoy light stemmer.
        return _stem(_czech_stem)
    if typ == "icu_normalizer":
        # analysis-icu IcuNormalizerTokenFilterFactory.java (default
        # form nfkc_cf) — stdlib-unicodedata analog, see helper.
        return _map1(_icu_normalizer_fn(spec.get("name", "nfkc_cf")))
    if typ == "icu_folding":
        # IcuFoldingTokenFilterFactory.java: ICU's utr30 foldings =
        # case fold + accent/compatibility fold across all scripts.
        # Analog: NFKD -> strip combining marks -> casefold -> NFKC,
        # with the non-decomposable Latin table applied first
        # (documented analog; unicodeSetFilter restriction supported).
        keep = spec.get("unicode_set_filter") or spec.get("unicodeSetFilter")
        keep_set = None
        if keep:
            # only the bracket-list subset "[^åäöÅÄÖ]" / "[abc]"
            inner = str(keep).strip()
            neg = inner.startswith("[^")
            chars = set(inner.lstrip("[^").rstrip("]"))
            keep_set = (neg, chars)

        def _icu_fold(t: str) -> str:
            out = []
            for ch in t:
                if keep_set is not None:
                    neg, chars = keep_set
                    excluded = (ch in chars) if neg else (ch not in chars)
                    if excluded:
                        out.append(ch)
                        continue
                d = unicodedata.normalize("NFKD", ch.translate(_FOLD_EXTRA))
                d = "".join(c for c in d if not unicodedata.combining(c))
                out.append(d.casefold())
            return unicodedata.normalize("NFKC", "".join(out))

        return _map1(_icu_fold)
    if typ == "icu_transform":
        # IcuTransformTokenFilterFactory.java: transliteration by
        # compound ICU id.  Without ICU data only the structural steps
        # are servable: case, normalization forms, and
        # "[:Nonspacing Mark:] Remove"; script transliterations like
        # Any-Latin raise (honest scope guard).
        steps = [s.strip() for s in str(spec.get("id", "Null")).split(";") if s.strip()]
        fns: List[Callable[[str], str]] = []
        for s in steps:
            low = s.lower()
            if low in ("null",):
                continue
            elif low in ("any-lower", "lower"):
                fns.append(str.lower)
            elif low in ("any-upper", "upper"):
                fns.append(str.upper)
            elif low in ("any-nfc", "nfc"):
                fns.append(lambda t: unicodedata.normalize("NFC", t))
            elif low in ("any-nfd", "nfd"):
                fns.append(lambda t: unicodedata.normalize("NFD", t))
            elif low in ("any-nfkc", "nfkc"):
                fns.append(lambda t: unicodedata.normalize("NFKC", t))
            elif low in ("any-nfkd", "nfkd"):
                fns.append(lambda t: unicodedata.normalize("NFKD", t))
            elif low == "[:nonspacing mark:] remove":
                fns.append(
                    lambda t: "".join(
                        c for c in t if unicodedata.category(c) != "Mn"
                    )
                )
            else:
                raise ValueError(
                    f"icu_transform step not available without ICU data: {s}"
                )

        def _transform(t: str) -> str:
            for fn in fns:
                t = fn(t)
            return t

        return _map1(_transform)
    if typ == "icu_collation":
        # ICUCollationKeyFilter analog: a deterministic
        # accent-and-case-insensitive sort key (primary strength) —
        # NFKD, marks stripped, casefold.  Deviation (documented): not
        # ICU binary collation keys; locale tailorings beyond primary
        # strength are not modeled.
        strength = str(spec.get("strength", "tertiary")).lower()
        if strength in ("primary", "secondary"):
            def _key(t: str) -> str:
                d = unicodedata.normalize("NFKD", t)
                if strength == "primary":
                    d = "".join(c for c in d if not unicodedata.combining(c))
                return d.casefold()

            return _map1(_key)
        return _map1(lambda t: t)
    if typ == "serbian_normalization":
        return _map1(_serbian_normalize)
    if typ == "sorani_normalization":
        return _map1(_sorani_normalize)
    if typ == "hindi_normalization":
        return _map1(_hindi_normalize)
    if typ == "bengali_normalization":
        return _map1(_bengali_normalize)
    if typ == "indic_normalization":
        return _map1(_indic_normalize)
    if typ == "min_hash":
        # MinHashTokenFilterFactory.java (Lucene MinHashFilter): hash
        # every token, bucket the hash space into bucket_count buckets,
        # keep the hash_set_size smallest hashes per (hash, bucket), and
        # emit them as the document's LSH signature at the end of the
        # stream; with_rotation fills empty buckets from the next
        # non-empty one.  Deviations (documented): tokens are emitted as
        # hex strings "b<bucket>_h<hash>" rather than Lucene's raw
        # 128-bit bytes, and the hash is Python's sha1-derived 64-bit
        # value per hash function rather than murmur3-128 — the LSH
        # bucketing semantics (Broder min-wise signatures) are
        # preserved; exact token bytes are not.
        import hashlib

        n_hash = int(spec.get("hash_count", 1))
        n_bucket = int(spec.get("bucket_count", 512))
        set_size = int(spec.get("hash_set_size", 1))
        rotate = bool(spec.get("with_rotation", n_bucket > 1))
        span = (1 << 64) // n_bucket + (1 if (1 << 64) % n_bucket else 0)

        def _minhash(ts: TokenStream) -> TokenStream:
            toks, _pos = ts
            if not toks:
                return [], []
            # buckets[h][b] = sorted smallest hashes
            buckets: List[List[List[int]]] = [
                [[] for _ in range(n_bucket)] for _ in range(n_hash)
            ]
            for t in toks:
                for h in range(n_hash):
                    d = hashlib.sha1(
                        (f"{h}:" + t).encode("utf-8")
                    ).digest()
                    v = int.from_bytes(d[:8], "big")
                    cell = buckets[h][min(v // span, n_bucket - 1)]
                    if len(cell) < set_size:
                        cell.append(v)
                        cell.sort()
                    elif v < cell[-1] and v not in cell:
                        cell[-1] = v
                        cell.sort()
            out_t: List[str] = []
            for h in range(n_hash):
                row = buckets[h]
                for b in range(n_bucket):
                    cell = row[b]
                    if not cell and rotate:
                        # borrow the next non-empty bucket's minimum
                        for k in range(1, n_bucket):
                            nxt = row[(b + k) % n_bucket]
                            if nxt:
                                cell = [nxt[0]]
                                break
                    for v in cell:
                        out_t.append(f"b{b}_h{h}_{v:016x}")
            return out_t, list(range(len(out_t)))

        return _minhash
    if typ == "hyphenation_decompounder":
        # HyphenationCompoundWordTokenFilterFactory.java: dictionary
        # subwords aligned to hyphenation points of an offo XML grammar.
        # Deviation (documented): no hyphenation grammar files exist in
        # this environment, so every character offset is treated as a
        # hyphenation point — with a dictionary configured (required
        # here, as without one the grammar would be the only constraint)
        # the output equals dictionary_decompounder semantics.
        if not spec.get("word_list"):
            raise ValueError(
                "hyphenation_decompounder requires word_list (no "
                "hyphenation grammar files available in this build)"
            )
        return make_token_filter(
            {**spec, "type": "dictionary_decompounder"}, ctx
        )
    if typ == "delimited_term_freq":
        # DelimitedTermFrequencyTokenFilterFactory.java: "token|3" sets
        # the term-frequency attribute to 3.  Our postings derive tf by
        # counting stream occurrences, so the analog repeats the token
        # tf times at ONE position — identical tf statistics; phrase
        # positions unaffected (documented analog).
        delim = str(spec.get("delimiter", "|"))

        def _delim_tf(ts: TokenStream) -> TokenStream:
            toks, pos = ts
            out_t, out_p = [], []
            for t, p in zip(toks, pos):
                tf = 1
                if delim in t:
                    body, _, freq = t.rpartition(delim)
                    if freq.isdigit():
                        t, tf = body, int(freq)
                out_t.extend([t] * tf)
                out_p.extend([p] * tf)
            return out_t, out_p

        return _delim_tf
    if typ in ("delimited_payload", "delimited_payload_filter"):
        # DelimitedPayloadTokenFilterFactory.java.  Our postings carry
        # no payload attribute, so the token part is kept and the
        # payload value is dropped (documented deviation — the
        # reference stores it per-posting).
        delim = spec.get("delimiter", "|")
        return _map1(lambda t: t.split(delim, 1)[0])
    if typ == "concatenate_graph":
        # ConcatenateGraphTokenFilterFactory.java: the whole stream
        # joins into ONE token (token_separator default " ")
        sep = spec.get("token_separator", " ")

        def _concat(ts: TokenStream) -> TokenStream:
            toks, _pos = ts
            return ([sep.join(toks)], [0]) if toks else ([], [])

        return _concat
    if typ == "dictionary_decompounder":
        # DictionaryCompoundWordTokenFilterFactory.java: dictionary
        # subwords found inside a compound emit at the compound's
        # position (original kept); min_word_size/min_subword_size/
        # max_subword_size/only_longest_match per the factory defaults
        words = [str(w).lower() for w in spec.get("word_list", ())]
        mn_word = int(spec.get("min_word_size", 5))
        mn_sub = int(spec.get("min_subword_size", 2))
        mx_sub = int(spec.get("max_subword_size", 15))
        longest = bool(spec.get("only_longest_match", False))

        def _decompound(ts: TokenStream) -> TokenStream:
            toks, pos = ts
            out_t, out_p = [], []
            for t, p in zip(toks, pos):
                out_t.append(t)
                out_p.append(p)
                if len(t) < mn_word:
                    continue
                low = t.lower()
                for i in range(len(low)):
                    matches = [
                        w for w in words
                        if mn_sub <= len(w) <= mx_sub
                        and low.startswith(w, i)
                    ]
                    if not matches:
                        continue
                    if longest:
                        matches = [max(matches, key=len)]
                    for w in sorted(set(matches)):
                        out_t.append(t[i : i + len(w)])
                        out_p.append(p)
            return out_t, out_p

        return _decompound
    raise ValueError(f"unknown token filter: {typ}")


# --------------------------------------------------------------------------
# Analyzer assembly
# --------------------------------------------------------------------------

#: named analyzers as (char_filters, tokenizer, filters) specs — the
#: reference's pre-configured providers (AnalysisRegistry.java defaults).
NAMED_ANALYZERS: Dict[str, dict] = {
    "standard": {"tokenizer": "standard", "filter": ["lowercase"]},
    "simple": {"tokenizer": "lowercase", "filter": []},
    "whitespace": {"tokenizer": "whitespace", "filter": []},
    "keyword": {"tokenizer": "keyword", "filter": []},
    "stop": {"tokenizer": "lowercase", "filter": ["stop"]},
    # r4 language analyzers (analysis-common LanguageAnalyzerProviders;
    # Lucene FrenchAnalyzer/GermanAnalyzer/SpanishAnalyzer/
    # RussianAnalyzer/CJKAnalyzer component order).  Deviations: no
    # per-language keyword-marker exclusion set (none configured by
    # default anyway) and German skips GermanNormalizationFilter (our
    # snowball german stemmer already folds umlauts/ß at the end).
    "french": {
        "tokenizer": "standard",
        "filter": [
            {"type": "elision"},
            "lowercase",
            {"type": "stop", "stopwords": "_french_"},
            {"type": "stemmer", "language": "french"},
        ],
    },
    "german": {
        "tokenizer": "standard",
        "filter": [
            "lowercase",
            {"type": "stop", "stopwords": "_german_"},
            {"type": "stemmer", "language": "german"},
        ],
    },
    "spanish": {
        "tokenizer": "standard",
        "filter": [
            "lowercase",
            {"type": "stop", "stopwords": "_spanish_"},
            {"type": "stemmer", "language": "spanish"},
        ],
    },
    "russian": {
        "tokenizer": "standard",
        "filter": [
            "lowercase",
            {"type": "stop", "stopwords": "_russian_"},
            {"type": "stemmer", "language": "russian"},
        ],
    },
    "cjk": {
        "tokenizer": "standard",
        "filter": [
            "cjk_width",
            "lowercase",
            {"type": "cjk_bigram"},
            {"type": "stop", "stopwords": "_english_"},
        ],
    },
    # r4 late.  Deviations: Lucene's ItalianAnalyzer stems with
    # ItalianLightStemFilter (we serve the snowball stemmer the
    # `stemmer`/`snowball` filters use — the StemmerTokenFilterFactory
    # `italian` table entry); DutchAnalyzer adds a 4-word
    # StemmerOverrideFilter table (fiets/bromfiets/ei/kind) we omit.
    "italian": {
        "tokenizer": "standard",
        "filter": [
            {"type": "elision", "articles": [
                "c", "l", "all", "dall", "dell", "nell", "sull", "coll",
                "pell", "gl", "agl", "dagl", "degl", "negl", "sugl",
                "un", "m", "t", "s", "v", "d",
            ]},
            "lowercase",
            {"type": "stop", "stopwords": "_italian_"},
            {"type": "stemmer", "language": "italian"},
        ],
    },
    "dutch": {
        "tokenizer": "standard",
        "filter": [
            "lowercase",
            {"type": "stop", "stopwords": "_dutch_"},
            {"type": "stemmer", "language": "dutch"},
        ],
    },
    # r4 late: the Scandinavian trio + Portuguese
    # (DanishAnalyzer/NorwegianAnalyzer/SwedishAnalyzer component
    # order: standard -> lowercase -> stop -> snowball stemmer).
    # Deviation: Lucene's PortugueseAnalyzer stems with
    # PortugueseLightStemFilter by default; we serve the snowball
    # stemmer the `stemmer`/`snowball` filters use (the
    # StemmerTokenFilterFactory `portuguese` table entry), same policy
    # as the italian preset above.
    "danish": {
        "tokenizer": "standard",
        "filter": [
            "lowercase",
            {"type": "stop", "stopwords": "_danish_"},
            {"type": "stemmer", "language": "danish"},
        ],
    },
    "norwegian": {
        "tokenizer": "standard",
        "filter": [
            "lowercase",
            {"type": "stop", "stopwords": "_norwegian_"},
            {"type": "stemmer", "language": "norwegian"},
        ],
    },
    "swedish": {
        "tokenizer": "standard",
        "filter": [
            "lowercase",
            {"type": "stop", "stopwords": "_swedish_"},
            {"type": "stemmer", "language": "swedish"},
        ],
    },
    "portuguese": {
        "tokenizer": "standard",
        "filter": [
            "lowercase",
            {"type": "stop", "stopwords": "_portuguese_"},
            {"type": "stemmer", "language": "portuguese"},
        ],
    },
    # r5 session 3 (FinnishAnalyzerProvider.java -> Lucene
    # FinnishAnalyzer: standard -> lowercase -> stop -> SnowballFilter
    # with FinnishStemmer).
    "finnish": {
        "tokenizer": "standard",
        "filter": [
            "lowercase",
            {"type": "stop", "stopwords": "_finnish_"},
            {"type": "stemmer", "language": "finnish"},
        ],
    },
    # analysis-icu IcuAnalyzerProvider.java:74-80: ICUNormalizer2
    # char filter (nfkc_cf) -> ICUTokenizer -> ICUFoldingFilter.
    "icu_analyzer": {
        "char_filter": [{"type": "icu_normalizer"}],
        "tokenizer": "icu_tokenizer",
        "filter": [{"type": "icu_folding"}],
    },
}


@dataclass
class Analyzer:
    """A resolved chain.  Call with a string -> (tokens, positions)."""

    char_filters: Sequence[Callable[[str], str]] = field(default_factory=list)
    tokenizer: Callable[[str], TokenStream] = None  # type: ignore[assignment]
    filters: Sequence[Callable[[TokenStream], TokenStream]] = field(
        default_factory=list
    )
    spec: Optional[dict] = None

    @classmethod
    def from_spec(cls, spec) -> "Analyzer":
        """Resolve a name ("standard") or a custom dict spec
        ``{"char_filter": [...], "tokenizer": ..., "filter": [...],
        "stopwords": ...}``.  A bare ``stopwords`` key on a named analyzer
        mirrors the reference's ``standard`` analyzer ``stopwords``
        setting (StandardAnalyzerProvider.java:50-57)."""
        if isinstance(spec, str):
            base = dict(NAMED_ANALYZERS[spec])
            base["_name"] = spec
            spec = base
        elif spec.get("type") in NAMED_ANALYZERS and "tokenizer" not in spec:
            # a named-type spec carries ONLY type + stopwords; anything
            # else (incl. a 'filter' list, or a misspelled 'filters')
            # would be silently discarded by the base replacement below
            # — fail loudly instead
            extra = set(spec) - {"type", "stopwords", "_name"}
            if extra:
                raise ValueError(
                    f"named analyzer {spec['type']!r} accepts only "
                    f"'stopwords'; unknown keys {sorted(extra)} (to add "
                    "filters, spell out tokenizer + filter as a custom spec)"
                )
            base = dict(NAMED_ANALYZERS[spec["type"]])
            if spec.get("stopwords") is not None:
                base = dict(base)
                base["filter"] = list(base["filter"]) + [
                    {"type": "stop", "stopwords": spec["stopwords"]}
                ]
            spec = base
        unknown = set(spec) - {
            "type", "_name", "char_filter", "tokenizer", "filter", "stopwords"
        }
        if unknown:
            # a misspelled key ("filters") would otherwise silently build
            # a plain standard analyzer — fail loudly instead
            raise ValueError(
                f"unknown analyzer spec keys {sorted(unknown)}; expected "
                "char_filter / tokenizer / filter (+ type, stopwords)"
            )
        # per-chain build context: keyword_marker / stemmer_override
        # accumulate protected vocabulary IN ORDER; stemmer factories
        # built after them snapshot it (Lucene keyword-attribute
        # semantics without per-token flags)
        ctx = {"protected": set(), "protected_ci": set(), "patterns": []}
        return cls(
            char_filters=[
                make_char_filter(c) for c in spec.get("char_filter", [])
            ],
            tokenizer=make_tokenizer(spec.get("tokenizer", "standard")),
            filters=[
                make_token_filter(f, ctx) for f in spec.get("filter", [])
            ],
            spec=spec,
        )

    def __call__(self, text: Optional[str]) -> TokenStream:
        s = text or ""
        for cf in self.char_filters:
            s = cf(s)
        ts = self.tokenizer(s)
        for f in self.filters:
            ts = f(ts)
        return ts

    def tokens(self, text: Optional[str]) -> List[str]:
        return self(text)[0]

    def make_udf(self):
        """Spark pandas UDF ``string -> array<string>`` over this chain."""
        from pyspark.sql.functions import pandas_udf
        from pyspark.sql.types import ArrayType, StringType

        chain = self

        @pandas_udf(ArrayType(StringType()))
        def analyze_udf(texts: pd.Series) -> pd.Series:
            return texts.map(lambda t: chain.tokens(t))

        return analyze_udf

    def make_pos_udf(self):
        """Spark pandas UDF ``string -> array<struct<token,pos>>`` — the
        ``_analyze``-shaped output (token + position) for explosion into
        rows.  Arrow-batched; one chain evaluation per input string."""
        from pyspark.sql.functions import pandas_udf
        from pyspark.sql.types import (
            ArrayType,
            IntegerType,
            StringType,
            StructField,
            StructType,
        )

        chain = self
        out_t = ArrayType(
            StructType(
                [
                    StructField("token", StringType()),
                    StructField("pos", IntegerType()),
                ]
            )
        )

        @pandas_udf(out_t)
        def analyze_pos_udf(texts: pd.Series) -> pd.Series:
            def one(t):
                toks, poss = chain(t)
                return [{"token": tk, "pos": int(p)} for tk, p in zip(toks, poss)]

            return texts.map(one)

        return analyze_pos_udf


def analyze_api(spec, texts: Sequence[str]) -> List[dict]:
    """The ``_analyze`` admin API analog
    (``TransportAnalyzeAction.java:258-265``): returns one dict per token
    with ``token`` and ``position``, in stream order, for each input."""
    an = Analyzer.from_spec(spec)
    out: List[dict] = []
    for i, text in enumerate(texts):
        toks, pos = an(text)
        out.extend(
            {"input": i, "token": t, "position": p}
            for t, p in zip(toks, pos)
        )
    return out
