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
    raise ValueError(f"unknown char_filter: {typ}")


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


def make_token_filter(spec) -> Callable[[TokenStream], TokenStream]:
    if isinstance(spec, str):
        spec = {"type": spec}
    typ = spec["type"]

    def _map1(fn):
        def _apply(ts: TokenStream) -> TokenStream:
            toks, pos = ts
            return [fn(t) for t in toks], list(pos)

        return _apply

    if typ == "lowercase":
        return _map1(std.java_lower)
    if typ == "uppercase":
        return _map1(str.upper)
    if typ == "asciifolding":
        return _map1(_fold_ascii)
    if typ in ("porter_stem", "kstem"):
        return _map1(porter_stem)
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
            return _map1(porter_stem)
        if lang == "french":
            return _map1(_sb.french_stem)
        if lang in ("german", "german2"):
            return _map1(_sb.german_stem)
        if lang == "spanish":
            return _map1(_sb.spanish_stem)
        if lang == "russian":
            return _map1(_sb.russian_stem)
        if lang == "italian":
            return _map1(_sb.italian_stem)
        if lang == "dutch":
            return _map1(_sb.dutch_stem)
        if lang == "danish":
            return _map1(_sb.danish_stem)
        if lang == "norwegian":
            return _map1(_sb.norwegian_stem)
        if lang == "swedish":
            return _map1(_sb.swedish_stem)
        if lang == "portuguese":
            return _map1(_sb.portuguese_stem)
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
        return cls(
            char_filters=[
                make_char_filter(c) for c in spec.get("char_filter", [])
            ],
            tokenizer=make_tokenizer(spec.get("tokenizer", "standard")),
            filters=[make_token_filter(f) for f in spec.get("filter", [])],
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
