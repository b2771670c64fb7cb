"""BPE tokenizer training/encoding (ops/bpe.py) — Sennrich et al. 2016
subword-nmt semantics.  The merge table for the paper's classic corpus
{low:5, lower:2, newest:6, widest:3} below is hand-derived under the
published tie-break (count, then lexicographically greatest pair) with
the end-of-word marker fused onto the final character."""

import pytest

from opensearch_spark.ops import bpe

CLASSIC = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]

# hand-derived merge sequence (10 steps):
#  (e,s)=9 ties (s,t</w>)=9 -> greatest pair wins each round
CLASSIC_MERGES = [
    ("s", "t</w>"),
    ("e", "st</w>"),
    ("l", "o"),
    ("w", "est</w>"),
    ("n", "e"),
    ("ne", "west</w>"),
    ("lo", "w</w>"),
    ("w", "i"),
    ("wi", "d"),
    ("wid", "est</w>"),
]

ENCODE_PINS = {
    "lowest": ["lo", "west</w>"],
    "newest": ["newest</w>"],
    "widest": ["widest</w>"],
    "low": ["low</w>"],
    "lower": ["lo", "w", "e", "r</w>"],
    "wider": ["wid", "e", "r</w>"],
}


def test_learn_bpe_classic_merges():
    assert bpe.learn_bpe(CLASSIC, 10) == CLASSIC_MERGES


def test_learn_bpe_stops_when_exhausted():
    # a single 2-char word offers exactly one merge
    assert bpe.learn_bpe([("ab", 3)], 10) == [("a", "b</w>")]


def test_encode_word_pins():
    ranks = bpe.merge_ranks(CLASSIC_MERGES)
    for word, toks in ENCODE_PINS.items():
        assert bpe.encode_word(word, ranks) == toks, word


def test_encode_roundtrip():
    ranks = bpe.merge_ranks(CLASSIC_MERGES)
    for word in ["lowest", "newest", "slowest", "widowed", "x",
                 "lowlow", "stew", "estimate"]:
        assert bpe.decode_tokens(bpe.encode_word(word, ranks)) == word


def test_unknown_chars_stay_single_symbols():
    ranks = bpe.merge_ranks(CLASSIC_MERGES)
    assert bpe.encode_word("zq", ranks) == ["z", "q</w>"]


@pytest.fixture(scope="module")
def corpus_df(spark):
    # word frequencies reproduce the classic counts through real text
    rows = (
        [("low low low", ), ("low low", ), ("lower lower", )]
        + [("newest newest newest", ), ("Newest, newest; NEWEST!", )]
        + [("widest widest widest", )]
    )
    return spark.createDataFrame(rows, "text string")


def test_word_counts_distributed(spark, corpus_df):
    got = {
        r["word"]: r["count"] for r in bpe.word_counts(corpus_df).collect()
    }
    assert got == {"low": 5, "lower": 2, "newest": 6, "widest": 3}


def test_train_bpe_matches_driver_learner(spark, corpus_df):
    assert bpe.train_bpe(corpus_df, num_merges=10) == CLASSIC_MERGES


def test_train_bpe_max_words_cap(spark, corpus_df):
    # cap to the two most frequent words -> merges learned from
    # {newest:6, low:5} only
    merges = bpe.train_bpe(corpus_df, num_merges=3, max_words=2)
    assert merges == bpe.learn_bpe([("newest", 6), ("low", 5)], 3)


def test_bpe_encode_column(spark, corpus_df):
    df = spark.createDataFrame(
        [(0, "lowest newest"), (1, "wider LOW!")], "id long, text string"
    )
    out = {
        r["id"]: r["bpe_tokens"]
        for r in bpe.bpe_encode(df, CLASSIC_MERGES).collect()
    }
    assert out[0] == ["lo", "west</w>", "newest</w>"]
    assert out[1] == ["wid", "e", "r</w>", "low</w>"]


def test_bpe_roundtrip_property():
    """Hypothesis soak: encode/decode roundtrip over the classic merge
    table for arbitrary lowercase-alnum words (BPE segmentations must
    always concatenate back to the word + EOW marker)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    ranks = bpe.merge_ranks(CLASSIC_MERGES)

    @given(st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789",
                   min_size=1, max_size=16))
    @settings(max_examples=400, deadline=None)
    def prop(w):
        toks = bpe.encode_word(w, ranks)
        assert bpe.decode_tokens(toks) == w
        assert all(toks), toks

    prop()
