"""CCNet-style bigram-LM quality scoring (ops/lmquality.py) — scores
hand-computed under the documented stupid-backoff + add-one formula."""

import math

import pytest

from opensearch_spark.ops import lmquality


@pytest.fixture(scope="module")
def ref(spark):
    return spark.createDataFrame(
        [("the cat sat",), ("the cat ran",)], "text string"
    )


def test_train_bigram_lm_counts(spark, ref):
    bi, uni, n, v = lmquality.train_bigram_lm(ref)
    assert n == 6 and v == 4
    assert {(r["w1"], r["w2"]): r["c12"] for r in bi.collect()} == {
        ("the", "cat"): 2, ("cat", "sat"): 1, ("cat", "ran"): 1
    }
    assert {r["w"]: r["c1"] for r in uni.collect()} == {
        "the": 2, "cat": 2, "sat": 1, "ran": 1
    }


def test_lm_scores_hand_computed(spark, ref):
    docs = spark.createDataFrame(
        [(0, "the cat sat"),     # seen bigrams: log10(1), log10(.5)
         (1, "the dog sat"),     # two backoffs: .4*1/10, .4*2/10
         (2, "x"),               # one token -> short
         (3, "cat ran")],        # one seen bigram
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in lmquality.lm_scores(docs, ref).collect()}
    assert math.isclose(got[0]["lm_logprob"],
                        round((0 + math.log10(0.5)) / 2, 6), abs_tol=1e-6)
    assert math.isclose(got[1]["lm_logprob"],
                        round((math.log10(0.04) + math.log10(0.08)) / 2, 6),
                        abs_tol=1e-6)
    assert got[2]["lm_logprob"] is None and got[2]["lm_bucket"] == "short"
    assert math.isclose(got[3]["lm_logprob"], round(math.log10(0.5), 6),
                        abs_tol=1e-6)
    # ntile(3) over 4 rows (nulls last): sizes 2/1/1
    assert got[0]["lm_bucket"] == "head"
    assert got[3]["lm_bucket"] == "head"
    assert got[1]["lm_bucket"] == "middle"
