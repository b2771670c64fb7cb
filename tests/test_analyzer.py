"""Analyzer conformance fixtures (_analyze-style, FIXTURES.md §2).

Reference semantics: StandardAnalyzer = UAX#29 word break + lowercase +
empty default stop set, max_token_length 255
(StandardAnalyzerProvider.java:50-57).  The foo.bar case was left open in
FIXTURES.md and is resolved per the UAX#29 spec: FULL STOP is MidNumLet,
which joins letters (WB6/WB7), so "foo.bar" is ONE token.
"""

import pytest

from opensearch_spark.analysis.analyzer import (
    ENGLISH_STOP_WORDS,
    tokenize,
    tokenize_with_positions,
)

CASES = [
    # (text, expected tokens) — default config: no stopwords
    ("The 2 QUICK Brown-Foxes jumped over the lazy dog's bone.",
     ["the", "2", "quick", "brown", "foxes", "jumped", "over", "the", "lazy", "dog's", "bone"]),
    ("foo.bar baz,qux", ["foo.bar", "baz", "qux"]),
    ("can't", ["can't"]),
    ("state-of-the-art", ["state", "of", "the", "art"]),
    ("snake_case", ["snake_case"]),
    ("x86_64", ["x86_64"]),
    ("3.14", ["3.14"]),
    ("192.168.0.1", ["192.168.0.1"]),
    ("Café", ["café"]),
    ("東京", ["東", "京"]),  # Han: one token per char
    ("タワー", ["タワー"]),  # Katakana: run kept whole
    ("404 errors", ["404", "errors"]),
    ("a..b", ["a", "b"]),  # double joiner breaks (WB6 needs letter on both sides)
    ("'quoted'", ["quoted"]),  # leading/trailing joiners don't attach
    ("___", []),
    ("", []),
    ("   \t\n", []),
]


@pytest.mark.parametrize("text,expected", CASES, ids=[c[0][:20] for c in CASES])
def test_standard_analyzer(text, expected):
    assert tokenize(text) == expected


def test_max_token_length_splits_at_255():
    toks = tokenize("x" * 300)
    assert [len(t) for t in toks] == [255, 45]


def test_english_stopwords():
    assert tokenize("the quick brown", ENGLISH_STOP_WORDS) == ["quick", "brown"]
    # default config removes nothing
    assert tokenize("the quick brown") == ["the", "quick", "brown"]


def test_stop_filter_position_gaps():
    """StopFilter keeps position increments: phrase positions skip removed
    stopwords (Lucene StopFilter semantics)."""
    toks, poss = tokenize_with_positions("the quick brown fox", ENGLISH_STOP_WORDS)
    assert toks == ["quick", "brown", "fox"]
    assert poss == [1, 2, 3]


def test_positions_without_stopwords_are_dense():
    toks, poss = tokenize_with_positions("a b c")
    assert poss == [0, 1, 2]


def test_field_length_counts_post_stop_tokens():
    """dl = tokens emitted after stop filtering (SURVEY.md §4.6)."""
    assert len(tokenize("the the the fox", ENGLISH_STOP_WORDS)) == 1


def test_java_lowercase_parity():
    """Lowercasing matches Java Character.toLowerCase per code point
    (Lucene LowerCaseFilter): U+0130 maps to plain 'i' (not i +
    combining dot) and final sigma stays U+03C3 (no context rule) —
    the two code points where Python's full case mapping diverges."""
    from opensearch_spark.analysis.analyzer import java_lower, tokenize

    assert java_lower("İstanbul") == "istanbul"
    assert "̇" not in java_lower("İ")          # no combining dot
    assert java_lower("ΟΔΥΣΣΕΥΣ") == "οδυσσευσ"          # final sigma -> σ
    assert java_lower("Straße") == "straße"              # 1:1 path untouched
    assert tokenize("İstanbul ΟΔΥΣΣΕΥΣ") == ["istanbul", "οδυσσευσ"]

    # exhaustiveness of the fixup table: no other code point lowers to
    # multiple characters in Python (the 1:many divergence class)
    multi = [cp for cp in range(0x110000) if len(chr(cp).lower()) != 1]
    assert multi == [0x0130]


# ---- ASCII fast-path differential (the build-throughput optimization:
# ASCII tokens skip _HAS_ALNUM/_split_cjk/translate — must be
# semantics-identical to the unconditional slow path) ----

def _slow_tokenize_with_positions(text, stopwords=None, mx=None):
    """The pre-optimization reference implementation, kept verbatim."""
    from opensearch_spark.analysis import analyzer as ana

    mx = mx or ana.MAX_TOKEN_LENGTH
    jl = str.maketrans({0x0130: "i", 0x03A3: "σ"})
    if not text:
        return [], []
    toks, poss, pos = [], [], 0
    for raw in ana._TOKEN_RE.findall(text):
        if not ana._HAS_ALNUM_RE.search(raw):
            continue
        for tok in ana._split_cjk(raw):
            for i in range(0, len(tok), mx):
                piece = tok[i : i + mx].translate(jl).lower()
                if stopwords is None or piece not in stopwords:
                    toks.append(piece)
                    poss.append(pos)
                pos += 1
    return toks, poss


def test_ascii_fast_path_differential():
    from opensearch_spark.analysis import analyzer as ana

    stop = ana.resolve_stopwords(None)
    cases = [
        "", "___", "_a_ b_c", "İstanbul ΣΟΦΟΣ σοφος ΤΕΛΟΣ",
        "日本語のテキスト and ascii", "カタカナ run ひらがな",
        "can't don't 3.14 1,000 a·b x'y",
        "x" * 300, "_" * 300, ("ab" * 200) + " ŷ" + "z" * 280,
        "mixed 漢字 and _under_ scores__ 'quote'",
        "İİİ word", "ΑΣ ΤΕΛΟΣ ΣΣ", "the quick brown fox",
        "___x___ _ __ a_b_c 9_9",
    ]
    for t in cases:
        for sw in (stop, None):
            assert ana.tokenize_with_positions(t, sw) == \
                _slow_tokenize_with_positions(t, sw), repr(t)
            assert ana.tokenize(t, sw) == \
                _slow_tokenize_with_positions(t, sw)[0], repr(t)


def test_ascii_fast_path_differential_random():
    import random

    from opensearch_spark.analysis import analyzer as ana

    rng = random.Random(42)
    alphabet = list("abc XYZ 09_'’·.,\t\n") + ["漢", "の", "カ", "İ", "Σ", "σ", "ŷ", "é"]
    stop = ana.resolve_stopwords(None)
    for _ in range(400):
        t = "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 120)))
        assert ana.tokenize_with_positions(t, stop) == \
            _slow_tokenize_with_positions(t, stop), repr(t)


def test_sea_runs_single_token_uax29_wb4():
    """UAX#29 WB4: Extend marks (Mn/Mc/Me) never break a word — Thai/
    Lao runs come through the standard tokenizer WHOLE (Lucene
    StandardTokenizer SOUTH_EAST_ASIAN complex-context behavior; the
    fixture sentence is the classic Lucene ThaiAnalyzer test input)."""
    from opensearch_spark.analysis.analyzer import tokenize

    assert tokenize("การที่ได้ต้องแสดงว่างานดี") == ["การที่ได้ต้องแสดงว่างานดี"]
    assert tokenize("ประโยค English Text") == ["ประโยค", "english", "text"]
    assert tokenize("ພາສາລາວ ແລະ ไทย") == ["ພາສາລາວ", "ແລະ", "ไทย"]
    # positions: one per run, like any other token
    toks, poss = __import__(
        "opensearch_spark.analysis.analyzer", fromlist=["x"]
    ).tokenize_with_positions("กิน ข้าว bowl")
    assert toks == ["กิน", "ข้าว", "bowl"] and poss == [0, 1, 2]


def test_nfd_combining_marks_stay_attached():
    """An NFD 'café' keeps its combining acute inside the token (it
    previously broke the run and dropped the mark); NFC text is
    untouched; Han stays one-char-per-token."""
    import unicodedata

    from opensearch_spark.analysis.analyzer import tokenize

    nfd = unicodedata.normalize("NFD", "café résumé")
    assert tokenize(nfd) == nfd.lower().split(" ")
    assert tokenize("café") == ["café"]
    assert tokenize("中文 and カタカナ") == ["中", "文", "and", "カタカナ"]
