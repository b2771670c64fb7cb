"""Noisy-channel phrase suggester semantics
(PhraseSuggester.java / NoisyChannelSpellChecker.java /
CandidateScorer.java / StupidBackoffScorer.java / LaplaceScorer.java).

Hand-computable 5-doc corpus so expected scores are derived in-test
from the published formulas, independent of the implementation's
internal stats plumbing (the cross-implementation check is the DuckDB
driver oracle in suggest_suite)."""

from __future__ import annotations

import math

import pytest

from opensearch_spark.query import suggest

TEXTS = [
    "rose apple pie",
    "rose apple tart",
    "ruse apple pie",
    "rose berry pie",
    "ruse apple pie",
]
# term -> (df, ttf): rose (3,3) ruse (2,2) apple (4,4) pie (4,4)
# tart (1,1) berry (1,1); V = 15 tokens, T = 6 terms
V, T = 15.0, 6.0
BG = {
    ("rose", "apple"): 2,
    ("ruse", "apple"): 2,
    ("rose", "berry"): 1,
    ("apple", "pie"): 3,
    ("apple", "tart"): 1,
    ("berry", "pie"): 1,
}
TTF = {"rose": 3, "ruse": 2, "apple": 4, "pie": 4, "tart": 1, "berry": 1}


@pytest.fixture(scope="module")
def tiny_index(spark, tmp_path_factory):
    from opensearch_spark.index.builder import IndexConfig, build_index
    from opensearch_spark.index.reader import InvertedIndex

    d = str(tmp_path_factory.mktemp("noisy") / "idx")
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    build_index(
        spark,
        docs,
        d,
        IndexConfig(
            n_segments=2,
            id_cols=("doc_id",),
            routing_col="doc_id",
            text_col="text",
        ),
    )
    return InvertedIndex(spark, d)


def _uni_sb(w):
    return (1.0 + TTF.get(w, 0)) / (V + T)


def _big_sb(w, prev):
    c = BG.get((prev, w), 0)
    if c < 1:
        return 0.4 * _uni_sb(w)
    return c / (TTF[prev] + 1e-11)


def _score_sb(path, dists):
    s = math.log10(dists[0] * _uni_sb(path[0]))
    for i in range(1, len(path)):
        s += math.log10(dists[i] * _big_sb(path[i], path[i - 1]))
    return math.exp(s)


def test_stupid_backoff_scores_and_cutoff(tiny_index):
    out = suggest.phrase_suggest_noisy(tiny_index, "rase apple pie", size=5)
    rows = {r["suggestion"]: r for r in out.collect()}
    # confidence 1.0 cutoff: the input phrase itself is never suggested
    assert "rase apple pie" not in rows
    assert set(rows) == {"rose apple pie", "ruse apple pie"}
    # dist(rase->rose) = 1 - 1/4 = 0.75; originals channel 0.95
    exp_rose = _score_sb(["rose", "apple", "pie"], [0.75, 0.95, 0.95])
    exp_ruse = _score_sb(["ruse", "apple", "pie"], [0.75, 0.95, 0.95])
    assert rows["rose apple pie"]["score"] == pytest.approx(exp_rose, rel=1e-12)
    assert rows["ruse apple pie"]["score"] == pytest.approx(exp_ruse, rel=1e-12)
    # ruse wins: bigram (ruse, apple) has p = 2/2 = 1.0 vs rose's 2/3
    assert rows["ruse apple pie"]["score"] > rows["rose apple pie"]["score"]


def test_confidence_zero_keeps_input_path(tiny_index):
    out = suggest.phrase_suggest_noisy(
        tiny_index, "rase apple pie", size=10, confidence=0.0
    )
    sugg = [r["suggestion"] for r in out.collect()]
    assert "rase apple pie" in sugg
    exp_input = _score_sb(["rase", "apple", "pie"], [0.95, 0.95, 0.95])
    row = {r["suggestion"]: r for r in out.collect()}["rase apple pie"]
    assert row["score"] == pytest.approx(exp_input, rel=1e-12)
    assert row["n_subs"] == 0


def test_max_errors_budget(tiny_index):
    # two misspelled tokens, default max_errors 0.5 on 3 tokens ->
    # round(1.5) = 2 substitutions allowed -> both fixable
    out = suggest.phrase_suggest_noisy(tiny_index, "rase apple piee", size=10)
    sugg = [r["suggestion"] for r in out.collect()]
    assert any(s == "ruse apple pie" for s in sugg)
    # absolute budget 1: no suggestion may fix both tokens
    out1 = suggest.phrase_suggest_noisy(
        tiny_index, "rase apple piee", size=10, max_errors=1.0, confidence=0.0
    )
    assert all(r["n_subs"] <= 1 for r in out1.collect())


def test_laplace_smoothing(tiny_index):
    out = suggest.phrase_suggest_noisy(
        tiny_index,
        "rase apple pie",
        size=5,
        smoothing={"model": "laplace", "alpha": 0.5},
        confidence=0.0,
    )
    rows = {r["suggestion"]: r for r in out.collect()}

    def uni(w):
        return (0.5 + TTF.get(w, 0)) / (V + 0.5 * T)

    def big(w, prev):
        return (0.5 + BG.get((prev, w), 0)) / (TTF.get(prev, 0) + 0.5 * T)

    exp = math.exp(
        math.log10(0.75 * uni("rose"))
        + math.log10(0.95 * big("apple", "rose"))
        + math.log10(0.95 * big("pie", "apple"))
    )
    assert rows["rose apple pie"]["score"] == pytest.approx(exp, rel=1e-12)


def test_linear_interpolation_lambdas_normalized(tiny_index):
    out = suggest.phrase_suggest_noisy(
        tiny_index,
        "rase apple pie",
        size=5,
        smoothing={
            "model": "linear_interpolation",
            "bigram_lambda": 4.0,
            "unigram_lambda": 1.0,
        },
    )
    rows = {r["suggestion"]: r for r in out.collect()}

    def uni(w):
        return _uni_sb(w)

    def big(w, prev):
        # LinearInterpolatingScorer.scoreBigram: 0.5 + ttf denominator
        c = BG.get((prev, w), 0)
        if c < 1:
            return 0.2 * uni(w)
        return 0.8 * (c / (0.5 + TTF[prev])) + 0.2 * uni(w)

    exp = math.exp(
        math.log10(0.75 * uni("rose"))
        + math.log10(0.95 * big("apple", "rose"))
        + math.log10(0.95 * big("pie", "apple"))
    )
    assert rows["rose apple pie"]["score"] == pytest.approx(exp, rel=1e-12)


def test_collate_prune_contract(tiny_index):
    # collate matching only suggestions containing "ruse":
    # prune=False DROPS non-matching options; prune=True KEEPS them
    # tagged collate_match=false (PhraseSuggester.java:172-174)
    coll = lambda p: "ruse" in p
    dropped = suggest.phrase_suggest_noisy(
        tiny_index, "rase apple pie", size=5, collate=coll, collate_prune=False
    ).collect()
    assert [r["suggestion"] for r in dropped] == ["ruse apple pie"]
    assert all(r["collate_match"] for r in dropped)
    kept = suggest.phrase_suggest_noisy(
        tiny_index, "rase apple pie", size=5, collate=coll, collate_prune=True
    ).collect()
    got = {r["suggestion"]: r["collate_match"] for r in kept}
    assert got == {"ruse apple pie": True, "rose apple pie": False}


def test_highlight_tags_substitutions_only(tiny_index):
    out = suggest.phrase_suggest_noisy(
        tiny_index, "rase apple pie", size=5, pre_tag="<em>", post_tag="</em>"
    ).collect()
    hl = {r["suggestion"]: r["highlighted"] for r in out}
    assert hl["rose apple pie"] == "<em>rose</em> apple pie"


def test_generator_gates(tiny_index):
    # min_word_length 4 (default): a 3-letter token is never corrected
    out = suggest.phrase_suggest_noisy(tiny_index, "pie rase", size=5)
    assert all(
        r["suggestion"].startswith("pie ") for r in out.collect()
    )
    # suggest_mode 'missing': in-index tokens draw no candidates
    out2 = suggest.phrase_suggest_noisy(tiny_index, "rose apple pie", size=5)
    assert out2.count() == 0  # nothing beats the input under confidence 1.0
    # gram_size bounds
    with pytest.raises(ValueError):
        suggest.phrase_suggest_noisy(tiny_index, "rase apple", gram_size=4)


TRI = {
    ("rose", "apple", "pie"): 1,
    ("rose", "apple", "tart"): 1,
    ("ruse", "apple", "pie"): 2,
    ("rose", "berry", "pie"): 1,
}


def test_trigram_stupid_backoff(tiny_index):
    """gram_size=3: StupidBackoffScorer.scoreTrigram — bigram gate,
    then trigram/bigram ratio; position 0 unigram, position 1 bigram."""
    out = suggest.phrase_suggest_noisy(
        tiny_index, "rase apple pie", size=5, gram_size=3
    )
    rows = {r["suggestion"]: r for r in out.collect()}

    def tri_sb(w, w1, w2):
        big = BG.get((w1, w), 0)
        if big < 1:
            return 0.4 * _uni_sb(w)
        t = TRI.get((w2, w1, w), 0)
        if t < 1:
            return 0.4 * (big / (TTF[w1] + 1e-11))
        return t / (big + 1e-11)

    for first in ("rose", "ruse"):
        exp = math.exp(
            math.log10(0.75 * _uni_sb(first))
            + math.log10(0.95 * _big_sb("apple", first))
            + math.log10(0.95 * tri_sb("pie", "apple", first))
        )
        assert rows[f"{first} apple pie"]["score"] == pytest.approx(exp, rel=1e-12)
    # ruse: trigram (ruse apple pie) = 2 of bigram (apple pie) = 3
    assert rows["ruse apple pie"]["score"] > rows["rose apple pie"]["score"]


def test_trigram_laplace_and_linear(tiny_index):
    lap = suggest.phrase_suggest_noisy(
        tiny_index, "rase apple pie", size=5, gram_size=3,
        smoothing={"model": "laplace", "alpha": 0.5},
    )
    rows = {r["suggestion"]: r for r in lap.collect()}

    def uni(w):
        return (0.5 + TTF.get(w, 0)) / (V + 0.5 * T)

    # LaplaceScorer.scoreTrigram: (a+tri)/(freq(w_1·w) + a*T)
    exp = math.exp(
        math.log10(0.75 * uni("rose"))
        + math.log10(0.95 * (0.5 + BG[("rose", "apple")]) / (TTF["rose"] + 0.5 * T))
        + math.log10(0.95 * (0.5 + TRI[("rose", "apple", "pie")]) / (BG[("apple", "pie")] + 0.5 * T))
    )
    assert rows["rose apple pie"]["score"] == pytest.approx(exp, rel=1e-12)

    # linear interpolation: the REVERSED trigram lookup ("pie apple
    # rose") never occurs, so position 2 backs off to scoreBigram
    lin = suggest.phrase_suggest_noisy(
        tiny_index, "rase apple pie", size=5, gram_size=3,
        smoothing={"model": "linear_interpolation", "trigram_lambda": 1.0,
                   "bigram_lambda": 1.0, "unigram_lambda": 1.0},
    )
    rows_l = {r["suggestion"]: r for r in lin.collect()}

    def big_lin(w, w1):
        c = BG.get((w1, w), 0)
        if c < 1:
            return (1 / 3) * _uni_sb(w)
        return (1 / 3) * (c / (0.5 + TTF[w1])) + (1 / 3) * _uni_sb(w)

    exp_l = math.exp(
        math.log10(0.75 * _uni_sb("rose"))
        + math.log10(0.95 * big_lin("apple", "rose"))
        + math.log10(0.95 * big_lin("pie", "apple"))
    )
    assert rows_l["rose apple pie"]["score"] == pytest.approx(exp_l, rel=1e-12)
