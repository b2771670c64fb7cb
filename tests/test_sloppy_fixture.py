"""Pin the slop>0 phrase semantics (Lucene sloppy-freq parity, r3).

The reference scores sloppy phrases with Lucene's sloppy frequency:
each match contributes ``1 / (1 + matchLength)`` where matchLength is
the edit distance the terms moved (``ExactPhraseMatcher`` /
``SloppyPhraseMatcher``; ``PhraseQuery`` docs).  Since r3 the engine
implements exactly that weighting over its minimal ORDERED interval
enumeration (executor._sloppy_freq): in-order matches — the dominant
case — score identically to Lucene (gap 0 -> 1, gap 1 -> 1/2,
gap 2 -> 1/3).  The one remaining documented deviation: Lucene also
counts OUT-OF-ORDER matches within slop (a transposition costs 2
moves, so "b a" matches "a b"~2 with weight 1/3); our ordered
enumeration scores those 0.

This fixture makes the contract MEASURED, not prose:

1. the engine's slop-2 scores are asserted EXACTLY against a pure-
   Python oracle implementing the weighted semantics on a hand-built
   corpus (any drift in the engine breaks the pin), and
2. the Lucene-style sloppy freq is computed side-by-side; the test
   asserts agreement on every in-order case and pins the out-of-order
   case as the sole divergence.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from opensearch_spark.analysis import smallfloat as sfl
from opensearch_spark.query import bm25
from opensearch_spark.query.executor import _count_intervals

DOCS = [
    # (conv_id, turn_idx, text)
    ("c0", 0, "alpha beta gamma delta"),          # adjacent "alpha beta"
    ("c1", 0, "alpha x beta gamma"),              # gap 1
    ("c2", 0, "alpha x y beta"),                  # gap 2
    ("c3", 0, "alpha x y z beta"),                # gap 3 (outside slop 2)
    ("c4", 0, "beta alpha"),                      # wrong order
    ("c5", 0, "alpha beta alpha beta"),           # two adjacent matches
    ("c6", 0, "gamma delta epsilon"),             # no match
]


def _positions(text, term):
    return np.array(
        [i for i, t in enumerate(text.split()) if t == term], dtype=np.int64
    )


def interval_count(text: str, terms, slop: int) -> int:
    """The CHOSEN semantics: minimal ordered intervals, gap <= slop."""
    pos = {t: _positions(text, t) for t in set(terms)}
    if any(p.size == 0 for p in pos.values()):
        return 0
    return _count_intervals(pos, list(terms), slop, True)


def lucene_sloppy_freq(text: str, a: str, b: str, slop: int) -> float:
    """Two-term Lucene-style sloppy frequency: each minimal (a, b)
    ordered pairing within slop contributes 1/(1 + matchLength) where
    matchLength = positions moved (= gap for an ordered 2-term phrase)."""
    pa, pb = _positions(text, a), _positions(text, b)
    freq = 0.0
    for qb in pb:
        prev_a = pa[pa < qb]
        if prev_a.size == 0:
            continue
        p = int(prev_a.max())
        # minimality: qb must be the first b after p (staircase pairing)
        nb = pb[pb > p]
        if nb.size == 0 or int(nb.min()) != int(qb):
            continue
        gap = int(qb) - p - 1
        if gap <= slop:
            freq += 1.0 / (1.0 + gap)
    return freq


@pytest.fixture(scope="module")
def sloppy_engine(spark, tmp_path_factory):
    from opensearch_spark.index.builder import IndexConfig, build_index
    from opensearch_spark.index.reader import InvertedIndex
    from opensearch_spark.query.executor import SearchEngine

    d = str(tmp_path_factory.mktemp("sloppyidx"))
    df = spark.createDataFrame(DOCS, "conv_id string, turn_idx int, text string")
    build_index(spark, df, d, IndexConfig(n_segments=2))
    return SearchEngine(InvertedIndex(spark, d))


def test_engine_matches_chosen_semantics_exactly(sloppy_engine):
    """Engine slop-2 scores == BM25(weighted sloppy freq) per the pin."""
    from opensearch_spark.query.executor import _sloppy_freq

    eng = sloppy_engine
    out = {
        (r["conv_id"], r["turn_idx"]): r["score"]
        for r in eng.search(
            {"match_phrase": {"text": {"query": "alpha beta", "slop": 2}}}, size=10
        ).collect()
    }
    N = eng.index.stats["doc_count"]
    avgdl = eng.index.stats["avgdl"]
    stats = eng.index.term_stats(["alpha", "beta"])
    idf_sum = float(sum(bm25.idf(int(d_), N) for d_ in stats["df"]))
    expected = {}
    for cid, tix, text in DOCS:
        pos = {t: _positions(text, t) for t in ("alpha", "beta")}
        if any(p.size == 0 for p in pos.values()):
            continue
        tf = _sloppy_freq(pos, ["alpha", "beta"], 2)
        if tf == 0:
            continue
        dl = len(text.split())
        dl_q = int(sfl.byte4_to_int(sfl.int_to_byte4(np.array([dl])))[0])
        s = float(
            bm25.term_score_np(
                np.array([tf]), idf_sum, np.array([dl_q]), avgdl, eng.k1, eng.b
            )[0]
        )
        expected[(cid, tix)] = s
    assert set(out) == set(expected)
    for k in expected:
        assert out[k] == pytest.approx(expected[k], rel=1e-6), k


def test_deviation_from_lucene_quantified():
    """Weighted engine semantics == Lucene sloppy freq on every
    in-order case; the out-of-order case is the sole pinned deviation."""
    from opensearch_spark.query.executor import _sloppy_freq

    def ours(text, slop=2):
        pos = {t: _positions(text, t) for t in ("alpha", "beta")}
        if any(p.size == 0 for p in pos.values()):
            return 0.0
        return _sloppy_freq(pos, ["alpha", "beta"], slop)

    # adjacent match: both 1.0
    assert ours(DOCS[0][2]) == 1.0
    assert lucene_sloppy_freq(DOCS[0][2], "alpha", "beta", 2) == 1.0
    # gap 1: both 1/2;  gap 2: both 1/3 (the r2 deviation, now closed)
    assert ours(DOCS[1][2]) == pytest.approx(1 / 2)
    assert ours(DOCS[2][2]) == pytest.approx(1 / 3)
    assert lucene_sloppy_freq(DOCS[2][2], "alpha", "beta", 2) == pytest.approx(1 / 3)
    # two adjacent matches: both 2.0
    assert ours(DOCS[5][2]) == 2.0
    assert lucene_sloppy_freq(DOCS[5][2], "alpha", "beta", 2) == 2.0
    # outside slop: both 0
    assert ours(DOCS[3][2]) == 0.0
    assert lucene_sloppy_freq(DOCS[3][2], "alpha", "beta", 2) == 0.0
    # REMAINING deviation: out-of-order within slop.  True Lucene would
    # score "beta alpha" ~2 with matchLength 2 -> 1/3; our ordered
    # enumeration scores 0 (documented in _sloppy_freq).
    assert ours(DOCS[4][2]) == 0.0
    # full in-order agreement across the corpus
    for cid, tix, text in DOCS:
        assert ours(text) == pytest.approx(
            lucene_sloppy_freq(text, "alpha", "beta", 2)
        ), (cid, tix)
