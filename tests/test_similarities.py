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
    # DFR/IB are supported (late r3) with the reference's defaults
    assert S.from_spec({"type": "DFR"}).name == "DFR"
    assert S.from_spec({"type": "IB"}).name == "IB"
    with pytest.raises(ValueError):
        S.from_spec({"type": "nope"})


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


# ------------------------------------------------------------- DFR / IB


def _tfn_py(norm, tf, dl, avgdl, sum_dl=None, ttf=None):
    if norm == "no":
        return tf
    if norm == "h1":
        return tf * avgdl / dl
    if norm == "h2":
        return tf * math.log2(1 + avgdl / dl)
    if norm == "z":
        return tf * (avgdl / dl) ** 0.30
    if norm == "h3":
        mu = 800.0
        return (tf + mu * (ttf + 1) / (sum_dl + 1)) / (dl + mu) * mu
    raise AssertionError(norm)


def _eval_full(spark, sim, tf, dl, df, ttf, n, sum_dl, avgdl):
    from pyspark.sql import functions as F

    df1 = spark.createDataFrame(
        [(float(tf), float(dl), float(df), float(ttf))],
        "tf double, dl double, df double, ttf double",
    )
    col = sim.score_full_col(
        F.col("tf"), F.col("dl"), F.col("df"), F.col("ttf"),
        float(n), float(sum_dl), float(avgdl),
    )
    return float(df1.select(col.alias("s")).collect()[0]["s"])


@pytest.mark.parametrize(
    "spec",
    [
        {"type": "DFR", "basic_model": "g", "after_effect": "l", "normalization": "h2"},
        {"type": "DFR", "basic_model": "in", "after_effect": "b", "normalization": "h1"},
        {"type": "DFR", "basic_model": "ine", "after_effect": "l", "normalization": "no"},
        {"type": "DFR", "basic_model": "if", "after_effect": "b", "normalization": "z"},
    ],
)
def test_dfr_formula_micro(spark, spec):
    sim = S.from_spec(dict(spec))
    tf, dl, df, ttf, n, sum_dl, avgdl = 3, 8, 5, 9, 100, 650, 6.5
    tfn = _tfn_py(spec["normalization"], tf, dl, avgdl, sum_dl, ttf)
    m = spec["basic_model"]
    if m == "g":
        lam = ttf / (n + ttf)
        inf1 = math.log2(1 / (1 + lam)) + tfn * math.log2((1 + lam) / lam)
    elif m == "in":
        inf1 = tfn * math.log2((n + 1) / (df + 0.5))
    elif m == "ine":
        ne = n * (1 - ((n - 1) / n) ** ttf)
        inf1 = tfn * math.log2((n + 1) / (ne + 0.5))
    else:
        inf1 = tfn * math.log2((n + 1) / (ttf + 0.5))
    gain = 1 / (1 + tfn) if spec["after_effect"] == "l" else (ttf + 1) / (df * (1 + tfn))
    exp = max(gain * inf1, 0.0)
    got = _eval_full(spark, sim, tf, dl, df, ttf, n, sum_dl, avgdl)
    assert got == pytest.approx(np.float32(exp), rel=1e-6)


@pytest.mark.parametrize(
    "spec",
    [
        {"type": "IB", "distribution": "ll", "lambda": "df", "normalization": "h2"},
        {"type": "IB", "distribution": "spl", "lambda": "ttf", "normalization": "h1"},
    ],
)
def test_ib_formula_micro(spark, spec):
    sim = S.from_spec(dict(spec))
    tf, dl, df, ttf, n, sum_dl, avgdl = 2, 10, 4, 7, 50, 325, 6.5
    tfn = _tfn_py(spec["normalization"], tf, dl, avgdl, sum_dl, ttf)
    lam = (df + 1) / (n + 1) if spec["lambda"] == "df" else (ttf + 1) / (n + 1)
    # Lucene's DistributionLL/SPL use natural log (unlike DFR's log2)
    if spec["distribution"] == "ll":
        exp = -math.log(lam / (tfn + lam))
    else:
        exp = -math.log((lam ** (tfn / (tfn + 1)) - lam) / (1 - lam))
    exp = max(exp, 0.0)
    got = _eval_full(spark, sim, tf, dl, df, ttf, n, sum_dl, avgdl)
    assert got == pytest.approx(np.float32(exp), rel=1e-6)


@pytest.mark.parametrize(
    "spec",
    [
        {"type": "DFR", "basic_model": "g", "after_effect": "l", "normalization": "h2"},
        {"type": "IB", "distribution": "ll", "lambda": "df", "normalization": "h2"},
    ],
)
def test_engine_dfr_ib_e2e(spark, index_dir, oracle, spec):
    # engine top-10 equals a pure-python recomputation from the oracle
    # postings (quantized dl, float32 per-term scores)
    from opensearch_spark.index.reader import InvertedIndex
    from opensearch_spark.query.executor import SearchEngine

    eng = SearchEngine(InvertedIndex(spark, index_dir), similarity=spec)
    term = oracle.tokens[0][0]
    rows = eng.search({"match": {"text": term}}, size=10).collect()
    n = oracle.doc_count
    avgdl = oracle.avgdl
    posting = oracle.post[term]
    df_t = len(posting)
    ttf_t = sum(posting.values())
    exp = []
    for d, tf in posting.items():
        dl = float(oracle.dl_q[d])
        tfn = tf * math.log2(1 + avgdl / dl)
        if spec["type"] == "DFR":
            lam = ttf_t / (n + ttf_t)
            inf1 = math.log2(1 / (1 + lam)) + tfn * math.log2((1 + lam) / lam)
            s = max(inf1 / (1 + tfn), 0.0)
        else:
            lam = (df_t + 1) / (n + 1)
            s = max(-math.log(lam / (tfn + lam)), 0.0)
        exp.append((float(np.float32(s)),
                    oracle.rows[d]["conv_id"], oracle.rows[d]["turn_idx"]))
    exp.sort(key=lambda x: (-x[0], x[1], x[2]))
    got = [(r["score"], r["conv_id"], r["turn_idx"]) for r in rows]
    assert [(c, t) for _, c, t in got] == [(c, t) for _, c, t in exp[:10]]
    for (gs, _, _), (es, _, _) in zip(got, exp[:10]):
        assert gs == pytest.approx(es, rel=1e-6)


def test_dfr_ib_validation():
    with pytest.raises(ValueError, match="basic_model"):
        S.from_spec({"type": "DFR", "basic_model": "p"})
    with pytest.raises(ValueError, match="after_effect"):
        S.from_spec({"type": "DFR", "basic_model": "g", "after_effect": "no"})
    with pytest.raises(ValueError, match="distribution"):
        S.from_spec({"type": "IB", "distribution": "x"})
    with pytest.raises(ValueError, match="normalization"):
        S.from_spec({"type": "DFR", "basic_model": "g", "after_effect": "l",
                     "normalization": "h9"})


def test_ib_spl_all_docs_term_does_not_divide_by_zero(spark):
    # df == N makes lambda == 1; the spl divisor (1 - lambda) must be
    # guarded BEFORE the division (ANSI mode throws on /0)
    sim = S.from_spec({"type": "IB", "distribution": "spl", "lambda": "df"})
    got = _eval_full(spark, sim, tf=2, dl=10, df=100, ttf=300,
                     n=100, sum_dl=650, avgdl=6.5)
    assert np.isfinite(got) and got >= 0.0


def test_ib_spl_lambda_gt_one_uses_published_formula(spark):
    # lambda='ttf' routinely gives lam > 1; the formula is well-defined
    # there and must NOT be clamped (review finding: the old guard
    # clamped all lam > 1, inflating every frequent-term score)
    sim = S.from_spec({"type": "IB", "distribution": "spl", "lambda": "ttf",
                       "normalization": "h2"})
    tf, dl, df, ttf, n, sum_dl, avgdl = 2, 10, 50, 300, 100, 650, 6.5
    tfn = _tfn_py("h2", tf, dl, avgdl)
    lam = (ttf + 1) / (n + 1)  # ~2.98 > 1
    exp = max(-math.log((lam ** (tfn / (tfn + 1)) - lam) / (1 - lam)), 0.0)
    got = _eval_full(spark, sim, tf, dl, df, ttf, n, sum_dl, avgdl)
    assert got == pytest.approx(np.float32(exp), rel=1e-6)


def test_ib_spl_lambda_one_analytic_limit(spark):
    # lam == 1 exactly: the analytic limit -ln(1/(tfn+1)) = ln(tfn+1)
    sim = S.from_spec({"type": "IB", "distribution": "spl", "lambda": "df",
                       "normalization": "no"})
    got = _eval_full(spark, sim, tf=3, dl=10, df=100, ttf=300,
                     n=100, sum_dl=650, avgdl=6.5)
    assert got == pytest.approx(np.float32(math.log(4.0)), rel=1e-6)
