"""Hand-computed BM25 micro-fixture (FIXTURES.md §4).

Four tiny docs over vocab {a, b, c}; every scoring component (tf, df, dl,
quantized dl, idf, final score) asserted against explicit arithmetic,
including a doc whose length changes under byte4 quantization (41 -> 40).
"""

import math

import numpy as np
import pytest

from opensearch_spark.oracle import OracleIndex

K1, B = 1.2, 0.75

DOCS = [
    {"conv_id": "c0", "turn_idx": 0, "text": "a b a"},  # dl=3
    {"conv_id": "c1", "turn_idx": 0, "text": "a c"},  # dl=2
    {"conv_id": "c2", "turn_idx": 0, "text": "b b b b"},  # dl=4
    {"conv_id": "c3", "turn_idx": 0, "text": " ".join(["a"] * 41)},  # dl=41 -> q 40
]


@pytest.fixture(scope="module")
def idx():
    return OracleIndex(DOCS)


def hand_score(tf, df, dl_q, avgdl, n=4):
    idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
    return np.float32(idf * (K1 + 1) * tf / (tf + K1 * (1 - B + B * dl_q / avgdl)))


def test_collection_stats(idx):
    assert idx.doc_count == 4
    assert idx.sum_dl == 3 + 2 + 4 + 41
    assert idx.avgdl == 50 / 4
    assert list(idx.dl_q) == [3, 2, 4, 40]  # 41 quantizes to 40


def test_df(idx):
    assert len(idx.post["a"]) == 3
    assert len(idx.post["b"]) == 2
    assert len(idx.post["c"]) == 1


def test_single_term_scores(idx):
    s = idx.match("a")
    assert set(s) == {0, 1, 3}
    assert s[0] == pytest.approx(float(hand_score(2, 3, 3, 12.5)), abs=0)
    assert s[1] == pytest.approx(float(hand_score(1, 3, 2, 12.5)), abs=0)
    # d3 scores with QUANTIZED dl=40, not 41
    assert s[3] == pytest.approx(float(hand_score(41, 3, 40, 12.5)), abs=0)
    assert s[3] != pytest.approx(float(hand_score(41, 3, 41, 12.5)), abs=0)


def test_or_query_sums_clauses(idx):
    s = idx.match("a b")
    exp0 = float(hand_score(2, 3, 3, 12.5)) + float(hand_score(1, 2, 3, 12.5))
    assert s[0] == pytest.approx(exp0, rel=1e-12)
    assert set(s) == {0, 1, 2, 3}


def test_and_query_requires_all(idx):
    assert set(idx.match("a b", operator="and")) == {0}


def test_duplicate_query_terms_double_score(idx):
    s1 = idx.match("c")
    s2 = idx.match("c c")
    assert s2[1] == pytest.approx(2 * s1[1], rel=1e-12)


def test_idf_never_negative(idx):
    # Lucene-9 idf = ln(1 + ...) > 0 even when df == doc_count
    assert idx.idf("a") > 0
    assert idx.idf("nonexistent") == pytest.approx(
        math.log(1 + (4 + 0.5) / 0.5), rel=1e-12
    )
