"""Similarity modules (SimilarityProviders.java): formula micro-fixtures
plus engine e2e rank/score parity against a pure-Python recomputation
over the oracle corpus for LMDirichlet / LMJelinekMercer / boolean / DFI
and a scripted similarity."""

import math

import numpy as np
import pytest

from opensearch_spark.query import similarities as S

# ---------------------------------------------------------- formula micro


def test_lmdirichlet_formula_and_clamp():
    sim = S.LMDirichlet(mu=2000.0)
    # ttf=9, sum_dl=99 -> p_c = 10/100 = 0.1, tconst = 200
    c = sim.term_const(df=5, ttf=9, n=10, sum_dl=99)
    assert c == pytest.approx(200.0)
    got = float(sim.score_np([3], c, [7])[0])
    exp = math.log(1 + 3 / 200.0) + math.log(2000.0 / 2007.0)
    assert got == pytest.approx(np.float32(exp), rel=1e-6)
    # very long doc + rare-enough term -> negative raw score clamps to 0
    # (LMDirichletSimilarity.score: return score > 0 ? score : 0)
    long_doc = float(sim.score_np([1], 2000.0 * 0.5, [100000])[0])
    assert long_doc == 0.0


def test_lmjelinekmercer_formula():
    sim = S.LMJelinekMercer(lam=0.1)
    pc = sim.term_const(df=5, ttf=9, n=10, sum_dl=99)
    assert pc == pytest.approx(0.1)
    got = float(sim.score_np([2], pc, [8])[0])
    exp = math.log(1 + (0.9 * 2 / 8) / (0.1 * 0.1))
    assert got == pytest.approx(np.float32(exp), rel=1e-6)


def test_dfi_measures_and_zero_below_expected():
    # expected = tconst * dl; tf <= expected -> 0 (DFISimilarity.java)
    sim = S.DFI(measure="standardized")
    tconst = 0.5
    assert float(sim.score_np([1], tconst, [4])[0]) == 0.0  # e=2 >= tf=1
    e = 0.5 * 4
    for measure, m in [
        ("standardized", (5 - e) / math.sqrt(e)),
        ("saturated", (5 - e) / e),
        ("chisquared", (5 - e) ** 2 / e),
    ]:
        got = float(S.DFI(measure=measure).score_np([5], tconst, [4])[0])
        assert got == pytest.approx(np.float32(math.log2(m + 1)), rel=1e-6), measure
    with pytest.raises(ValueError):
        S.DFI(measure="nope")


def test_from_spec_defaults():
    assert S.from_spec({"type": "LMDirichlet"}).mu == 2000.0
    assert S.from_spec({"type": "LMJelinekMercer"}).lam == 0.1
    assert S.from_spec({"type": "DFI"}).measure == "standardized"
    bm = S.from_spec({"k1": 0.9, "b": 0.4}, avgdl=7.0)
    assert (bm.k1, bm.b, bm.avgdl) == (0.9, 0.4, 7.0)
    assert bm.is_bm25
    with pytest.raises(ValueError):
        S.from_spec({"type": "DFR"})


# ------------------------------------------------------------- engine e2e


def _pure_match_topk(oracle, sim, terms, k=10):
    """Pure-Python match-OR top-k under an arbitrary similarity."""
    acc = {}
    for t in terms:
        posting = oracle.post.get(t, {})
        if not posting:
            continue
        c = sim.term_const(len(posting), sum(posting.values()),
                           oracle.doc_count, oracle.sum_dl)
        for d, tf in posting.items():
            s = float(sim.score_np([tf], c, [int(oracle.dl_q[d])])[0])
            acc[d] = acc.get(d, 0.0) + s
    ranked = sorted(
        acc.items(),
        key=lambda kv: (-kv[1], oracle.rows[kv[0]]["conv_id"],
                        oracle.rows[kv[0]]["turn_idx"]),
    )[:k]
    return [
        ((oracle.rows[d]["conv_id"], oracle.rows[d]["turn_idx"]), s)
        for d, s in ranked
    ]


@pytest.mark.parametrize(
    "spec",
    [
        {"type": "LMDirichlet", "mu": 2000},
        {"type": "LMDirichlet", "mu": 500},
        {"type": "LMJelinekMercer", "lambda": 0.3},
        {"type": "DFI", "independence_measure": "chisquared"},
        {"type": "boolean"},
        {"type": "BM25", "k1": 0.9, "b": 0.3},
    ],
)
def test_engine_similarity_matches_pure_python(spark, index_dir, oracle, spec):
    from opensearch_spark.index.reader import InvertedIndex
    from opensearch_spark.query.executor import SearchEngine

    eng = SearchEngine(InvertedIndex(spark, index_dir), similarity=spec)
    sim = S.from_spec(dict(spec), avgdl=oracle.avgdl)
    terms = oracle.tokens[0][:2]  # two live analyzed corpus terms
    rows = eng.search({"match": {"text": " ".join(terms)}}, size=10).collect()
    gold = _pure_match_topk(oracle, sim, terms)
    got = [((r["conv_id"], r["turn_idx"]), r["score"]) for r in rows]
    assert [g[0] for g in got] == [g[0] for g in gold]
    for (_, gs), (_, es) in zip(got, gold):
        assert gs == pytest.approx(es, rel=1e-6)


def test_boolean_similarity_counts_matched_terms(spark, index_dir, oracle):
    from opensearch_spark.index.reader import InvertedIndex
    from opensearch_spark.query.executor import SearchEngine

    eng = SearchEngine(InvertedIndex(spark, index_dir),
                       similarity={"type": "boolean"})
    terms = oracle.tokens[0][:2]
    rows = eng.search({"match": {"text": " ".join(terms)}}, size=5).collect()
    assert rows, "expected hits"
    for r in rows:
        assert r["score"] in (1.0, 2.0)


def test_non_bm25_similarity_disables_prune(spark, index_dir, oracle):
    from opensearch_spark.index.reader import InvertedIndex
    from opensearch_spark.query.executor import SearchEngine

    eng = SearchEngine(InvertedIndex(spark, index_dir),
                       similarity={"type": "LMDirichlet"})
    q = {"match": {"text": oracle.tokens[0][0]}}
    dense = eng.search(q, size=10, prune=False).collect()
    forced = eng.search(q, size=10, prune=True).collect()  # gate ignores
    assert [tuple(r) for r in forced] == [tuple(r) for r in dense]


def test_scripted_similarity_runs_jvm_side(spark, index_dir, oracle):
    from pyspark.sql import functions as F

    from opensearch_spark.index.reader import InvertedIndex
    from opensearch_spark.query.executor import SearchEngine

    def tf_over_dl(tf, dl, df, ttf, n, sum_dl, avgdl):
        return tf / (dl + F.lit(1.0))

    eng = SearchEngine(InvertedIndex(spark, index_dir),
                       similarity=S.Scripted(tf_over_dl))
    term = oracle.tokens[0][0]
    rows = eng.search({"match": {"text": term}}, size=10).collect()
    posting = oracle.post[term]
    exp = sorted(
        (
            (float(np.float32(tf / (int(oracle.dl_q[d]) + 1.0))),
             oracle.rows[d]["conv_id"], oracle.rows[d]["turn_idx"])
            for d, tf in posting.items()
        ),
        key=lambda x: (-x[0], x[1], x[2]),
    )[:10]
    got = [(r["score"], r["conv_id"], r["turn_idx"]) for r in rows]
    assert [(c, t) for _, c, t in got] == [(c, t) for _, c, t in exp]
    for (gs, _, _), (es, _, _) in zip(got, exp):
        assert gs == pytest.approx(es, rel=1e-6)
