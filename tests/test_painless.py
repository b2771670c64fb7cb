"""Painless expression compiler (query/painless.py).

Semantics pinned against hand-computed values on a tiny frame, plus
engine-level equivalence: a Painless script_score / script query /
script sort / script_fields produces results identical to its Spark-SQL
twin (the long-standing documented analog path)."""

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from opensearch_spark.query import dsl as Q
from opensearch_spark.query.painless import (
    PainlessError,
    compile_painless,
    extract_doc_fields,
    looks_painless,
    script_expr,
)


@pytest.fixture(scope="module")
def pdf(spark):
    return spark.createDataFrame(
        [
            Row(a=1, b=10.0, s="Hello World", t=None),
            Row(a=2, b=2.5, s="foo", t="x"),
            Row(a=-3, b=0.5, s="BAR", t="y"),
        ]
    )


def _vals(pdf, source, **kw):
    col = compile_painless(source, **kw)
    return [r[0] for r in pdf.select(col).orderBy(F.col("a")).collect()]


def _one(pdf, source, **kw):
    return pdf.select(compile_painless(source, **kw)).head()[0]


def test_arithmetic_and_precedence(pdf):
    assert _one(pdf, "2 + 3 * 4") == 14
    assert _one(pdf, "(2 + 3) * 4") == 20
    assert _one(pdf, "7 % 4") == 3
    assert _one(pdf, "-2 * 3") == -6
    assert _one(pdf, "1.5 + 2.5") == 4.0
    assert _one(pdf, "10 / 4.0") == 2.5


def test_doc_values_and_ternary(pdf):
    got = sorted(_vals(pdf, "doc['a'].value * 2 + doc['b'].value"))
    assert got == sorted([12.0, 6.5, -5.5])
    got = _vals(pdf, "doc['a'].value > 0 ? 'pos' : 'neg'")
    assert sorted(got) == ["neg", "pos", "pos"]


def test_math_functions(pdf):
    assert _one(pdf, "Math.log(Math.E)") == pytest.approx(1.0)
    assert _one(pdf, "Math.log10(100.0)") == pytest.approx(2.0)
    assert _one(pdf, "Math.sqrt(16)") == 4.0
    assert _one(pdf, "Math.pow(2, 10)") == 1024.0
    assert _one(pdf, "Math.max(3, 7) + Math.min(3, 7)") == 10
    assert _one(pdf, "Math.abs(-4.5)") == 4.5
    assert _one(pdf, "Math.floor(2.7)") == 2.0
    assert _one(pdf, "Math.ceil(2.1)") == 3.0
    assert _one(pdf, "Math.PI") == pytest.approx(math.pi)


def test_math_round_java_semantics(pdf):
    # Java Math.round = floor(x + 0.5): -2.5 -> -2 (SQL half-up gives -3)
    assert _one(pdf, "Math.round(-2.5)") == -2
    assert _one(pdf, "Math.round(2.5)") == 3
    assert _one(pdf, "Math.round(2.4)") == 2


def test_null_guard_and_empty(pdf):
    assert sorted(_vals(pdf, "doc['t'].value == null")) == [False, False, True]
    assert sorted(_vals(pdf, "doc['t'].empty")) == [False, False, True]
    assert sorted(_vals(pdf, "doc['t'].size()")) == [0, 1, 1]
    got = _vals(pdf, "doc['t'].value != null && doc['a'].value > 0")
    assert sorted(got) == [False, False, True]


def test_string_methods(pdf):
    assert sorted(_vals(pdf, "doc['s'].value.toLowerCase()")) == [
        "bar", "foo", "hello world",
    ]
    assert sum(_vals(pdf, "doc['s'].value.contains('o') ? 1 : 0")) == 2
    assert sum(_vals(pdf, "doc['s'].value.startsWith('He') ? 1 : 0")) == 1
    assert sum(_vals(pdf, "doc['s'].value.endsWith('R') ? 1 : 0")) == 1
    assert sorted(_vals(pdf, "doc['s'].value.length()")) == [3, 3, 11]
    assert sum(_vals(pdf, "doc['s'].value.equals('foo') ? 1 : 0")) == 1
    assert sorted(_vals(pdf, "doc['s'].length()")) == [3, 3, 11]


def test_params_and_score(pdf):
    got = _one(pdf, "params.k * 2 + params['j']", params={"k": 5, "j": 1})
    assert got == 11
    col = compile_painless("_score * 2 + doc['a'].value", score=F.col("b"))
    rows = {r["a"]: r["v"] for r in pdf.select("a", col.alias("v")).collect()}
    assert rows[1] == 21.0 and rows[2] == 7.0


def test_return_and_semicolon(pdf):
    assert _one(pdf, "return 1 + 2;") == 3
    assert _one(pdf, "doc.a.value + 1") in (2, 3, -2)  # dotted doc access


def test_ctx_ingest_access(pdf):
    got = sorted(_vals(pdf, "ctx.a * 10 + ctx['a']"))
    assert got == [-33, 11, 22]


def test_errors():
    for bad in [
        "doc['a']",                  # missing .value
        "unknownvar + 1",            # bare identifier
        "Math.tan(1)",               # unsupported fn
        "params.missing",            # unbound param
        "1 +",                       # incomplete
        "_score + 1",                # no score in this context
        "doc['a'].value @ 2",        # bad char
    ]:
        with pytest.raises((PainlessError, ValueError)):
            compile_painless(bad)


def test_extract_and_sniff():
    src = "Math.log(doc['n_chars'].value) * _score + doc.lang.value"
    assert extract_doc_fields(src) == ["n_chars", "lang"]
    assert looks_painless(src)
    assert looks_painless("ctx.x + 1")
    assert not looks_painless("n_chars % 7 = 0 AND lang = 'en'")
    assert not looks_painless("length(text) / 2")


def test_script_expr_routing(pdf):
    # Spark SQL stays Spark SQL; painless routes to the compiler
    assert pdf.select(script_expr("a + 1", None).alias("v")).count() == 3
    col = script_expr("doc['a'].value + 1", None)
    assert sorted(r[0] for r in pdf.select(col).collect()) == [-2, 2, 3]
    with pytest.raises(PainlessError):
        script_expr("a + 1", "painless")  # explicit lang, painless rules
    # lang-expression (numeric Lucene expressions) rides the same
    # compiler: doc-values arithmetic, no Spark-SQL fallback
    col = script_expr("doc['a'].value * 2", "expression")
    assert sorted(r[0] for r in pdf.select(col).collect()) == [-6, 2, 4]


# ------------------------------------------------------- engine parity

def test_engine_painless_script_score_matches_sql_twin(engine):
    base = Q.Match("text", "error handling")
    sql = engine.search(
        Q.ScriptScore(base, expr="_score * (1 + dl / 100.0)"), size=10
    ).collect()
    pls = engine.search(
        Q.ScriptScore(
            base,
            expr="_score * (1 + doc['dl'].value / 100.0)",
            lang="painless",
        ),
        size=10,
    ).collect()
    assert [(r["conv_id"], r["turn_idx"], round(r["score"], 8)) for r in sql] == [
        (r["conv_id"], r["turn_idx"], round(r["score"], 8)) for r in pls
    ]
    assert len(sql) == 10


def test_engine_painless_script_query_matches_sql_twin(engine):
    sql = engine.search(
        Q.ScriptQuery(expr="dl % 5 = 0 AND role = 'user'"), size=500
    ).collect()
    pls = engine.search(
        Q.ScriptQuery(
            expr="doc['dl'].value % 5 == 0 && doc['role'].value.equals('user')",
            lang="painless",
        ),
        size=500,
    ).collect()
    key = lambda rows: sorted((r["conv_id"], r["turn_idx"]) for r in rows)
    assert key(sql) == key(pls) and len(sql) > 0


def test_engine_painless_script_query_params(engine):
    pls = engine.search(
        Q.ScriptQuery(
            expr="doc['dl'].value >= params.lo && doc['dl'].value < params.hi",
            lang="painless",
            params={"lo": 10, "hi": 12},
        ),
        size=500,
    ).collect()
    sql = engine.search(
        Q.ScriptQuery(expr="dl >= 10 AND dl < 12"), size=500
    ).collect()
    key = lambda rows: sorted((r["conv_id"], r["turn_idx"]) for r in rows)
    assert key(sql) == key(pls) and len(pls) > 0


def test_engine_function_score_script_function(engine):
    # ScriptScoreFunctionBuilder.java: script_score as a FUNCTION entry;
    # parity vs the equivalent top-level script_score query
    fs = engine.search(
        {
            "function_score": {
                "query": {"match": {"text": "error handling"}},
                "functions": [
                    {"script_score": {"script": {
                        "lang": "painless",
                        "source": "Math.sqrt(doc['dl'].value)",
                    }}, "weight": 2.0}
                ],
                "boost_mode": "multiply",
            }
        },
        size=10,
    ).collect()
    tw = engine.search(
        Q.ScriptScore(
            Q.Match("text", "error handling"),
            expr="_score * 2.0 * sqrt(dl)",
        ),
        size=10,
    ).collect()
    assert [(r["conv_id"], r["turn_idx"]) for r in fs] == [
        (r["conv_id"], r["turn_idx"]) for r in tw
    ]
    for a, b in zip(fs, tw):
        assert a["score"] == pytest.approx(b["score"], rel=1e-9)


def test_engine_painless_script_sort_and_fields(engine):
    q = Q.Match("text", "error")
    pls = engine.search(
        q, size=8,
        sort=[({"_script": {"source": "doc['dl'].value % 7",
                            "lang": "painless"}}, "asc")],
    ).collect()
    sql = engine.search(
        q, size=8,
        sort=[({"_script": {"source": "dl % 7", "fields": ["dl"]}}, "asc")],
    ).collect()
    assert [(r["conv_id"], r["turn_idx"]) for r in pls] == [
        (r["conv_id"], r["turn_idx"]) for r in sql
    ]
    # script_fields: painless source, inputs resolved via doc[...] (the
    # extracted `dl` column rides the fetch join and lands in the output)
    rows = engine.search(
        q,
        size=5,
        script_fields={
            "dl_log": {"source": "Math.log(1 + doc['dl'].value)",
                       "lang": "painless"},
        },
    ).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["dl_log"] == pytest.approx(math.log(1 + r["dl"]))
