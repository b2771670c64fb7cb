"""The driver-facing query surface: every implemented operator as a
``(spark, sf_dir) -> DataFrame`` callable plus an equivalent ANSI-SQL
oracle string (DuckDB dialect) over the same parquet tables.

Score parity contract (why these oracles can hash-match a float BM25):
the engine computes per-term scores in float64, narrows to float32
(Lucene's behavior), sums in float64 and the driver wrapper ROUNDS to
4 decimals BEFORE the top-k ordering with doc-id tie-break
(``docs_index.topk``).  The SQL oracle mirrors that pipeline literally:
``CAST(expr AS REAL)`` -> ``SUM(CAST(.. AS DOUBLE))`` -> ``ROUND(,4)``
-> ``ORDER BY score DESC, doc_id``.  The BM25 constants are written so
the SQL doubles are bit-identical to the engine's Python/JVM doubles
(``1.2 + 1.0 == 2.2`` in IEEE754).  The SmallFloat-quantized document
length is inlined as a literal lookup table (the same 256-entry table
the engine evaluates JVM-side).
"""

from __future__ import annotations

from typing import Callable, Dict

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from opensearch_spark import aggs
from opensearch_spark.analysis import smallfloat as sfl
from opensearch_spark.docs_index import (
    docset,
    documents_df,
    documents_engine,
    load_table,
    topk,
)
from opensearch_spark.ops import dedup, similarity, textstats

# ---------------------------------------------------------------- SQL scaffolding

_QT = "[" + ",".join(str(int(v)) for v in sfl.quantize_len(np.arange(512))) + "]"

# Tokenization oracle: the documents corpus is plain [a-z0-9 ] text, on
# which the standard analyzer is exactly "split on spaces, drop empties"
# (pinned by tests/test_driver_surface.py::test_oracle_tokenizer_assumption).
_PRE = f"""
WITH __docs AS (
  SELECT doc_id,
         list_filter(string_split(text, ' '), x -> x <> '') AS toks,
         lang, source, n_chars,
         CASE WHEN doc_id % 7 = 0 THEN NULL ELSE source END AS src_alt,
         CAST(1 + doc_id % 3 AS INT) AS req_terms
  FROM documents
),
__dl AS (SELECT doc_id, len(toks) AS dl FROM __docs),
__qdl AS (SELECT doc_id, CAST(list_extract({_QT}, dl + 1) AS DOUBLE) AS qdl FROM __dl),
__stats AS (
  SELECT CAST(count(*) FILTER (WHERE dl > 0) AS DOUBLE) AS n,
         CAST(sum(dl) AS DOUBLE) / CAST(count(*) FILTER (WHERE dl > 0) AS DOUBLE) AS avgdl
  FROM __dl
),
__tok AS (SELECT doc_id, unnest(toks) AS term FROM __docs),
__tf AS (SELECT doc_id, term, CAST(count(*) AS INT) AS tf FROM __tok GROUP BY 1, 2),
__df AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM __tf GROUP BY 1),
__pos AS (SELECT doc_id, unnest(toks) AS term, generate_subscripts(toks, 1) AS pos FROM __docs)
"""

_SCORE = (
    "CAST(ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5)) * 2.2 * t.tf / "
    "(t.tf + 1.2 * (0.25 + 0.75 * q2.qdl / s.avgdl)) AS REAL)"
)


def _sql_match(terms: Dict[str, int], required: int, k: int = 10) -> str:
    vals = ", ".join(f"('{t}', {w})" for t, w in terms.items())
    return (
        _PRE
        + f""", __q AS (SELECT * FROM (VALUES {vals}) AS v(term, w)),
__scored AS (
  SELECT t.doc_id,
         ROUND(SUM(CAST({_SCORE} AS DOUBLE) * __q.w), 4) AS score,
         SUM(__q.w) AS matched
  FROM __tf t
  JOIN __df d USING (term)
  JOIN __q ON __q.term = t.term
  JOIN __qdl q2 ON q2.doc_id = t.doc_id
  CROSS JOIN __stats s
  GROUP BY t.doc_id
)
SELECT doc_id, score FROM __scored
WHERE matched >= {required}
ORDER BY score DESC, doc_id ASC
LIMIT {k}"""
    )


def _sql_clause(terms: Dict[str, int]) -> str:
    """Unrounded per-doc match score (a compound-query building block)."""
    vals = ", ".join(f"('{t}', {w})" for t, w in terms.items())
    return f"""SELECT t.doc_id, SUM(CAST({_SCORE} AS DOUBLE) * v.w) AS sc
  FROM __tf t
  JOIN __df d USING (term)
  JOIN (SELECT * FROM (VALUES {vals}) AS x(term, w)) v ON v.term = t.term
  JOIN __qdl q2 ON q2.doc_id = t.doc_id
  CROSS JOIN __stats s
  GROUP BY t.doc_id"""


# ---------------------------------------------------------------- registry

QUERIES: Dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: Dict[str, str] = {}


def _q(name: str, oracle: str = None):
    def reg(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return reg


# ================================================= full-text queries

@_q("ft_match_or", _sql_match({"spark": 1, "join": 1}, required=1))
def ft_match_or(spark, sf_dir):
    """``match`` default OR (MatchQueryBuilder.java:85-88)."""
    eng = documents_engine(spark, sf_dir)
    return topk(eng, {"match": {"text": {"query": "spark join"}}})


@_q("ft_match_and", _sql_match({"spark": 1, "join": 1}, required=2))
def ft_match_and(spark, sf_dir):
    """``match`` operator AND (Operator.java:53-58)."""
    eng = documents_engine(spark, sf_dir)
    return topk(eng, {"match": {"text": {"query": "spark join", "operator": "and"}}})


@_q("ft_match_msm", _sql_match({"spark": 1, "merge": 1, "vector": 1}, required=2))
def ft_match_msm(spark, sf_dir):
    """``match`` with minimum_should_match=2 of 3 clauses."""
    eng = documents_engine(spark, sf_dir)
    return topk(
        eng,
        {"match": {"text": {"query": "spark merge vector", "minimum_should_match": 2}}},
    )


@_q("ft_term_text", _sql_match({"dup": 1}, required=1))
def ft_term_text(spark, sf_dir):
    """``term`` on the indexed text field = single-token BM25 scorer
    (TermQueryBuilder.java; MatchQuery.java:303-310)."""
    eng = documents_engine(spark, sf_dir)
    return topk(eng, {"term": {"text": "dup"}})


@_q(
    "ft_match_count",
    _PRE
    + """
SELECT CAST(count(*) AS BIGINT) AS total
FROM (SELECT doc_id FROM __tf WHERE term IN ('spark', 'join') GROUP BY 1)""",
)
def ft_match_count(spark, sf_dir):
    """``_count`` entry point: exact hit count (SURVEY.md §2.6)."""
    eng = documents_engine(spark, sf_dir)
    from opensearch_spark.query import dsl as Q

    scored = eng._score(Q.from_dict({"match": {"text": "spark join"}}))
    return scored.agg(F.count(F.lit(1)).cast("long").alias("total"))


@_q(
    "ft_match_phrase",
    _PRE
    + """, __phr AS (
  SELECT a.doc_id, CAST(count(*) AS INT) AS ptf
  FROM __pos a JOIN __pos b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
  WHERE a.term = 'table' AND b.term = 'hash'
  GROUP BY a.doc_id
),
__pidf AS (
  SELECT CAST(sum(ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5))) AS DOUBLE) AS idf
  FROM __df d CROSS JOIN __stats s WHERE d.term IN ('table', 'hash')
)
SELECT p.doc_id,
       ROUND(CAST(CAST(i.idf * 2.2 * p.ptf /
             (p.ptf + 1.2 * (0.25 + 0.75 * q2.qdl / s.avgdl)) AS REAL) AS DOUBLE), 4) AS score
FROM __phr p
JOIN __qdl q2 ON q2.doc_id = p.doc_id
CROSS JOIN __pidf i CROSS JOIN __stats s
ORDER BY score DESC, p.doc_id ASC
LIMIT 10""",
)
def ft_match_phrase(spark, sf_dir):
    """``match_phrase`` slop=0 (MatchPhraseQueryBuilder.java;
    MatchQuery.java:332): phrase frequency scored as one clause with
    summed idf — positions intersect via the stored posting positions."""
    eng = documents_engine(spark, sf_dir)
    return topk(eng, {"match_phrase": {"text": "table hash"}})


@_q(
    "ft_terms_text",
    _PRE
    + """
SELECT doc_id, CAST(1.0 AS DOUBLE) AS score
FROM (SELECT DISTINCT doc_id FROM __tf WHERE term IN ('dup', 'traceback'))
ORDER BY doc_id""",
)
def ft_terms_text(spark, sf_dir):
    """``terms`` OR over exact terms, constant-score rewrite
    (TermsQueryBuilder.java)."""
    eng = documents_engine(spark, sf_dir)
    return docset(eng, {"terms": {"text": ["dup", "traceback"]}})


@_q(
    "ft_terms_set",
    _PRE
    + """
SELECT t.doc_id, CAST(1.0 AS DOUBLE) AS score
FROM __tf t
WHERE t.term IN ('spark', 'merge', 'vector', 'dup')
GROUP BY t.doc_id
HAVING count(DISTINCT t.term) >= max(1 + t.doc_id % 3)
ORDER BY t.doc_id""",
)
def ft_terms_set(spark, sf_dir):
    """``terms_set``: per-doc dynamic minimum-should-match from a field
    (TermsSetQueryBuilder.java)."""
    eng = documents_engine(spark, sf_dir)
    from opensearch_spark.query import dsl as Q

    return docset(
        eng,
        Q.TermsSet(
            field="text",
            values=["spark", "merge", "vector", "dup"],
            minimum_should_match_field="req_terms",
        ),
    )


@_q(
    "ft_bool",
    _PRE
    + f""", __m AS ({_sql_clause({"spark": 1, "join": 1})})
SELECT m.doc_id, ROUND(m.sc, 4) AS score
FROM __m m JOIN __docs dd ON dd.doc_id = m.doc_id
WHERE dd.lang = 'en' AND dd.n_chars >= 100
  AND NOT coalesce(dd.src_alt = 'src3', false)
ORDER BY score DESC, m.doc_id ASC
LIMIT 10""",
)
def ft_bool(spark, sf_dir):
    """``bool``: must (scored) + filter (columnar, unscored) + must_not
    with SQL-null three-valued semantics (BoolQueryBuilder.java:66-74)."""
    eng = documents_engine(spark, sf_dir)
    return topk(
        eng,
        {
            "bool": {
                "must": [{"match": {"text": "spark join"}}],
                "filter": [
                    {"term": {"lang": "en"}},
                    {"range": {"n_chars": {"gte": 100}}},
                ],
                "must_not": [{"term": {"src_alt": "src3"}}],
            }
        },
    )


@_q(
    "ft_bool_should",
    _PRE
    + f""", __c1 AS ({_sql_clause({"dup": 1})}),
__c2 AS ({_sql_clause({"traceback": 1})}),
__u AS (SELECT * FROM __c1 UNION ALL SELECT * FROM __c2)
SELECT doc_id, ROUND(SUM(sc), 4) AS score
FROM __u GROUP BY doc_id
HAVING count(*) >= 1
ORDER BY score DESC, doc_id ASC
LIMIT 10""",
)
def ft_bool_should(spark, sf_dir):
    """``bool`` pure-should: OR with score accumulation and default
    minimum_should_match=1 (BoolQueryBuilder.java:66-74)."""
    eng = documents_engine(spark, sf_dir)
    return topk(
        eng,
        {
            "bool": {
                "should": [
                    {"match": {"text": "dup"}},
                    {"match": {"text": "traceback"}},
                ]
            }
        },
    )


@_q(
    "ft_dis_max",
    _PRE
    + f""", __c1 AS ({_sql_clause({"spark": 1})}),
__c2 AS ({_sql_clause({"merge": 1})}),
__u AS (SELECT * FROM __c1 UNION ALL SELECT * FROM __c2)
SELECT doc_id, ROUND(max(sc) + 0.3 * (SUM(sc) - max(sc)), 4) AS score
FROM __u GROUP BY doc_id
ORDER BY score DESC, doc_id ASC
LIMIT 10""",
)
def ft_dis_max(spark, sf_dir):
    """``dis_max``: best clause + tie_breaker * others
    (DisMaxQueryBuilder.java)."""
    eng = documents_engine(spark, sf_dir)
    return topk(
        eng,
        {
            "dis_max": {
                "queries": [{"match": {"text": "spark"}}, {"match": {"text": "merge"}}],
                "tie_breaker": 0.3,
            }
        },
    )


@_q(
    "ft_constant_score",
    _PRE
    + """
SELECT doc_id, CAST(2.0 AS DOUBLE) AS score
FROM __docs WHERE lang = 'en'
ORDER BY doc_id""",
)
def ft_constant_score(spark, sf_dir):
    """``constant_score`` filter wrapper (ConstantScoreQueryBuilder.java)."""
    eng = documents_engine(spark, sf_dir)
    return docset(
        eng, {"constant_score": {"filter": {"term": {"lang": "en"}}, "boost": 2.0}}
    )


@_q(
    "ft_boosting",
    _PRE
    + f""", __p AS ({_sql_clause({"spark": 1})})
SELECT p.doc_id,
       ROUND(CASE WHEN dd.lang = 'zh' THEN p.sc * 0.5 ELSE p.sc END, 4) AS score
FROM __p p JOIN __docs dd ON dd.doc_id = p.doc_id
ORDER BY score DESC, p.doc_id ASC
LIMIT 10""",
)
def ft_boosting(spark, sf_dir):
    """``boosting``: demote docs matching the negative query
    (BoostingQueryBuilder.java)."""
    eng = documents_engine(spark, sf_dir)
    return topk(
        eng,
        {
            "boosting": {
                "positive": {"match": {"text": "spark"}},
                "negative": {"term": {"lang": "zh"}},
                "negative_boost": 0.5,
            }
        },
    )


@_q(
    "ft_range",
    _PRE
    + """
SELECT doc_id, CAST(1.0 AS DOUBLE) AS score
FROM __docs WHERE n_chars >= 100 AND n_chars < 300
ORDER BY doc_id""",
)
def ft_range(spark, sf_dir):
    """``range`` on a numeric doc-values column (RangeQueryBuilder.java) —
    Catalyst pushes the predicate into the parquet scan."""
    eng = documents_engine(spark, sf_dir)
    return docset(eng, {"range": {"n_chars": {"gte": 100, "lt": 300}}})


@_q(
    "ft_exists",
    _PRE
    + """
SELECT doc_id, CAST(1.0 AS DOUBLE) AS score
FROM __docs WHERE src_alt IS NOT NULL
ORDER BY doc_id""",
)
def ft_exists(spark, sf_dir):
    """``exists`` = non-null doc value (ExistsQueryBuilder.java)."""
    eng = documents_engine(spark, sf_dir)
    return docset(eng, {"exists": {"field": "src_alt"}})


@_q(
    "ft_ids",
    _PRE
    + """
SELECT doc_id, CAST(1.0 AS DOUBLE) AS score
FROM __docs WHERE doc_id IN (3, 5, 144)
ORDER BY doc_id""",
)
def ft_ids(spark, sf_dir):
    """``ids`` lookup (IdsQueryBuilder.java)."""
    eng = documents_engine(spark, sf_dir)
    return docset(eng, {"ids": {"values": [3, 5, 144]}})


@_q(
    "ft_prefix",
    _PRE
    + """
SELECT doc_id, CAST(1.0 AS DOUBLE) AS score
FROM (SELECT DISTINCT doc_id FROM __tok WHERE term LIKE 'sp%')
ORDER BY doc_id""",
)
def ft_prefix(spark, sf_dir):
    """``prefix``: term-dictionary expansion, constant-score rewrite
    (PrefixQueryBuilder.java)."""
    eng = documents_engine(spark, sf_dir)
    return docset(eng, {"prefix": {"text": "sp"}})


@_q(
    "ft_wildcard",
    _PRE
    + """
SELECT doc_id, CAST(1.0 AS DOUBLE) AS score
FROM (SELECT DISTINCT doc_id FROM __tok WHERE term LIKE 'j%n')
ORDER BY doc_id""",
)
def ft_wildcard(spark, sf_dir):
    """``wildcard`` over the term dictionary (WildcardQueryBuilder.java)."""
    eng = documents_engine(spark, sf_dir)
    return docset(eng, {"wildcard": {"text": "j*n"}})


@_q(
    "ft_regexp",
    _PRE
    + """
SELECT doc_id, CAST(1.0 AS DOUBLE) AS score
FROM (SELECT DISTINCT doc_id FROM __tok WHERE regexp_full_match(term, '(?:s.+k|dup)'))
ORDER BY doc_id""",
)
def ft_regexp(spark, sf_dir):
    """``regexp``: anchored automaton over the term dictionary
    (RegexpQueryBuilder.java)."""
    eng = documents_engine(spark, sf_dir)
    return docset(eng, {"regexp": {"text": "s.+k|dup"}})


@_q(
    "ft_fuzzy",
    _PRE
    + """, __fz AS (
  SELECT term FROM __df
  WHERE levenshtein(term, 'spak') <= 1
  ORDER BY df DESC, term ASC LIMIT 50
),
__scored AS (
  SELECT t.doc_id, ROUND(SUM(CAST({score} AS DOUBLE)), 4) AS score
  FROM __tf t
  JOIN __df d USING (term)
  JOIN __fz ON __fz.term = t.term
  JOIN __qdl q2 ON q2.doc_id = t.doc_id
  CROSS JOIN __stats s
  GROUP BY t.doc_id
)
SELECT doc_id, score FROM __scored
ORDER BY score DESC, doc_id ASC
LIMIT 10""".replace("{score}", _SCORE),
)
def ft_fuzzy(spark, sf_dir):
    """``fuzzy``: Levenshtein expansion against the term dictionary,
    AUTO fuzziness (FuzzyQueryBuilder.java; MatchQueryBuilder.java:100-104)."""
    eng = documents_engine(spark, sf_dir)
    return topk(eng, {"fuzzy": {"text": "spak"}})


@_q(
    "ft_msearch",
    _PRE
    + f""", __c1 AS ({_sql_clause({"spark": 1, "join": 1})}),
__c2 AS ({_sql_clause({"merge": 1, "group": 1})}),
__r1 AS (SELECT 'q1' AS query_id, doc_id, ROUND(sc, 4) AS score FROM __c1
         ORDER BY score DESC, doc_id ASC LIMIT 5),
__r2 AS (SELECT 'q2' AS query_id, doc_id, ROUND(sc, 4) AS score FROM __c2
         ORDER BY score DESC, doc_id ASC LIMIT 5)
SELECT * FROM __r1 UNION ALL SELECT * FROM __r2""",
)
def ft_msearch(spark, sf_dir):
    """``_msearch`` batching: independent queries unioned with a
    query_id column (rest-api-spec/api/msearch.json; SURVEY.md §2.7)."""
    eng = documents_engine(spark, sf_dir)
    a = topk(eng, {"match": {"text": "spark join"}}, k=5).withColumn(
        "query_id", F.lit("q1")
    )
    b = topk(eng, {"match": {"text": "merge group"}}, k=5).withColumn(
        "query_id", F.lit("q2")
    )
    return a.unionByName(b).select("query_id", "doc_id", "score")


@_q(
    "ft_multi_match",
    _PRE
    + f""", __c1 AS ({_sql_clause({"spark": 1})})
SELECT doc_id, ROUND(sc * 2.0, 4) AS score
FROM __c1
ORDER BY score DESC, doc_id ASC
LIMIT 10""",
)
def ft_multi_match(spark, sf_dir):
    """``multi_match`` best_fields over text^2 + keyword field
    (MultiMatchQueryBuilder.java); the keyword clause contributes no
    docs for this query so best = boosted text clause."""
    eng = documents_engine(spark, sf_dir)
    return topk(
        eng,
        {
            "multi_match": {
                "query": "spark",
                "fields": ["text^2", "lang"],
                "type": "best_fields",
                "tie_breaker": 0.3,
            }
        },
    )


@_q(
    "ft_match_bool_prefix",
    _PRE
    + f""", __t AS ({_sql_clause({"dup": 1})}),
__p AS (SELECT doc_id, CAST(1.0 AS DOUBLE) AS sc
        FROM (SELECT DISTINCT doc_id FROM __tok WHERE term LIKE 'sp%')),
__u AS (SELECT * FROM __t UNION ALL SELECT * FROM __p)
SELECT doc_id, ROUND(SUM(sc), 4) AS score
FROM __u GROUP BY doc_id
ORDER BY score DESC, doc_id ASC
LIMIT 10""",
)
def ft_match_bool_prefix(spark, sf_dir):
    """``match_bool_prefix`` (MatchBoolPrefixQueryBuilder.java): term
    clauses + constant-score prefix on the last token."""
    eng = documents_engine(spark, sf_dir)
    return topk(eng, {"match_bool_prefix": {"text": "dup sp"}})


@_q(
    "ft_match_phrase_prefix",
    _PRE
    + """, __exp AS (SELECT term FROM __df WHERE term LIKE 'ha%' ORDER BY term ASC LIMIT 50),
__dfu AS (SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS dfu
          FROM __tok WHERE term IN (SELECT term FROM __exp)),
__phr AS (
  SELECT a.doc_id, CAST(count(*) AS INT) AS ptf
  FROM __pos a JOIN __pos b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
  WHERE a.term = 'table' AND b.term IN (SELECT term FROM __exp)
  GROUP BY a.doc_id
),
__pidf AS (
  SELECT CAST(sum(ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5)))
         + max(ln(1 + (s.n - u.dfu + 0.5) / (u.dfu + 0.5))) AS DOUBLE) AS idf
  FROM __df d CROSS JOIN __stats s CROSS JOIN __dfu u WHERE d.term IN ('table')
)
SELECT p.doc_id,
       ROUND(CAST(CAST(i.idf * 2.2 * p.ptf /
             (p.ptf + 1.2 * (0.25 + 0.75 * q2.qdl / s.avgdl)) AS REAL) AS DOUBLE), 4) AS score
FROM __phr p
JOIN __qdl q2 ON q2.doc_id = p.doc_id
CROSS JOIN __pidf i CROSS JOIN __stats s
ORDER BY score DESC, p.doc_id ASC
LIMIT 10""",
)
def ft_match_phrase_prefix(spark, sf_dir):
    """``match_phrase_prefix`` (MatchPhrasePrefixQueryBuilder.java):
    phrase with last-slot prefix expansion; documented scoring (idf of
    fixed terms + idf of the expansion-union df)."""
    eng = documents_engine(spark, sf_dir)
    return topk(eng, {"match_phrase_prefix": {"text": "table ha"}})


@_q(
    "ft_more_like_this",
    _PRE
    + """, __like AS (SELECT term, CAST(count(*) AS DOUBLE) AS ltf FROM __tok WHERE doc_id = 1 GROUP BY 1),
__cand AS (
  SELECT l.term, l.ltf * ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5)) AS sc
  FROM __like l JOIN __df d USING (term) CROSS JOIN __stats s
  WHERE d.df >= 2
),
__sel AS (SELECT term FROM __cand ORDER BY sc DESC, term ASC LIMIT 10),
__req AS (SELECT greatest(1, CAST(floor(0.3 * count(*)) AS INT)) AS r FROM __sel),
__scored AS (
  SELECT t.doc_id, ROUND(SUM(CAST({score} AS DOUBLE)), 4) AS score, count(*) AS matched
  FROM __tf t
  JOIN __df d USING (term)
  JOIN __sel ON __sel.term = t.term
  JOIN __qdl q2 ON q2.doc_id = t.doc_id
  CROSS JOIN __stats s
  GROUP BY t.doc_id
)
SELECT doc_id, score FROM __scored CROSS JOIN __req
WHERE matched >= r AND doc_id <> 1
ORDER BY score DESC, doc_id ASC
LIMIT 10""".replace("{score}", _SCORE),
)
def ft_more_like_this(spark, sf_dir):
    """``more_like_this`` over an existing doc
    (MoreLikeThisQueryBuilder.java): top tf*idf example terms, 30% msm,
    example excluded."""
    eng = documents_engine(spark, sf_dir)
    from opensearch_spark.query import dsl as Q

    return topk(
        eng, Q.MoreLikeThis(like_ids=[1], max_query_terms=10, min_doc_freq=2)
    )


@_q(
    "ft_function_score",
    _PRE
    + f""", __c1 AS ({_sql_clause({"spark": 1})})
SELECT c.doc_id, ROUND(c.sc * sqrt(dd.n_chars * 0.01), 4) AS score
FROM __c1 c JOIN __docs dd ON dd.doc_id = c.doc_id
ORDER BY score DESC, c.doc_id ASC
LIMIT 10""",
)
def ft_function_score(spark, sf_dir):
    """``function_score`` field_value_factor sqrt modifier, multiply
    boost_mode (functionscore/FunctionScoreQueryBuilder.java)."""
    eng = documents_engine(spark, sf_dir)
    return topk(
        eng,
        {
            "function_score": {
                "query": {"match": {"text": "spark"}},
                "functions": [
                    {
                        "field_value_factor": {
                            "field": "n_chars",
                            "factor": 0.01,
                            "modifier": "sqrt",
                            "missing": 0.0,
                        }
                    }
                ],
                "boost_mode": "multiply",
            }
        },
    )


@_q(
    "ft_rescore",
    _PRE
    + f""", __c1 AS ({_sql_clause({"spark": 1})}),
__w AS (SELECT doc_id, sc AS s1 FROM __c1 ORDER BY sc DESC, doc_id ASC LIMIT 30),
__phr AS (
  SELECT a.doc_id, CAST(count(*) AS INT) AS ptf
  FROM __pos a JOIN __pos b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
  WHERE a.term = 'table' AND b.term = 'hash'
  GROUP BY a.doc_id
),
__pidf AS (
  SELECT CAST(sum(ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5))) AS DOUBLE) AS idf
  FROM __df d CROSS JOIN __stats s WHERE d.term IN ('table', 'hash')
),
__p2 AS (
  SELECT p.doc_id,
         CAST(CAST(i.idf * 2.2 * p.ptf /
              (p.ptf + 1.2 * (0.25 + 0.75 * q2.qdl / s.avgdl)) AS REAL) AS DOUBLE) AS s2
  FROM __phr p JOIN __qdl q2 ON q2.doc_id = p.doc_id
  CROSS JOIN __pidf i CROSS JOIN __stats s
  WHERE p.ptf > 0
)
SELECT doc_id, ROUND(comb, 4) AS score FROM (
  SELECT w.doc_id,
         CASE WHEN p.s2 IS NOT NULL THEN w.s1 * 1.0 + p.s2 * 2.0 ELSE w.s1 * 1.0 END AS comb
  FROM __w w LEFT JOIN __p2 p ON p.doc_id = w.doc_id
  ORDER BY comb DESC, w.doc_id ASC
  LIMIT 10
)
ORDER BY score DESC, doc_id ASC""",
)
def ft_rescore(spark, sf_dir):
    """Two-phase ``rescore`` (QueryRescorer.java:245): window 30 of the
    match, phrase rescorer weighted 2x, total combine."""
    eng = documents_engine(spark, sf_dir)
    out = eng.rescore(
        {"match": {"text": "spark"}},
        {"match_phrase": {"text": "table hash"}},
        window_size=30,
        query_weight=1.0,
        rescore_query_weight=2.0,
        score_mode="total",
        size=10,
    )
    return out.withColumn("score", F.round(F.col("score"), 4)).orderBy(
        F.desc("score"), F.asc("doc_id")
    )


@_q(
    "ft_query_string",
    _sql_match({"spark": 1, "merge": 1}, required=2),
)
def ft_query_string(spark, sf_dir):
    """``query_string`` mini-parser (QueryStringQueryBuilder.java):
    'spark AND merge' compiles to bool-must of match clauses = the AND
    match plan."""
    eng = documents_engine(spark, sf_dir)
    return topk(eng, {"query_string": {"query": "spark AND merge"}})


@_q("ft_highlight")  # fetch-phase text decoration: rows-only check
def ft_highlight(spark, sf_dir):
    """Fetch-phase highlighting (SearchModule.java:1048-1057)."""
    eng = documents_engine(spark, sf_dir)
    out = eng.search_highlight({"match": {"text": "spark join"}}, size=10)
    return out.select("doc_id", "highlight")


@_q(
    "ft_distance_feature",
    _PRE
    + """
SELECT doc_id, ROUND(100.0 / (100.0 + abs(CAST(n_chars AS DOUBLE) - 250.0)), 4) AS score
FROM __docs WHERE n_chars IS NOT NULL
ORDER BY score DESC, doc_id ASC
LIMIT 10""",
)
def ft_distance_feature(spark, sf_dir):
    """``distance_feature`` (DistanceFeatureQueryBuilder.java): score =
    boost * pivot / (pivot + |x - origin|)."""
    eng = documents_engine(spark, sf_dir)
    from opensearch_spark.query import dsl as Q

    return topk(eng, Q.DistanceFeature(field="n_chars", origin=250, pivot=100.0))


@_q(
    "ft_script_score",
    _PRE
    + f""", __c1 AS ({_sql_clause({"spark": 1})})
SELECT c.doc_id, ROUND(c.sc * (1 + dd.n_chars / 1000.0), 4) AS score
FROM __c1 c JOIN __docs dd ON dd.doc_id = c.doc_id
ORDER BY score DESC, c.doc_id ASC
LIMIT 10""",
)
def ft_script_score(spark, sf_dir):
    """``script_score`` (ScriptScoreQueryBuilder.java): Catalyst
    expression over _score + doc columns (the lang-expression analog)."""
    eng = documents_engine(spark, sf_dir)
    return topk(
        eng,
        {
            "script_score": {
                "query": {"match": {"text": "spark"}},
                "script": {"source": "_score * (1 + n_chars / 1000.0)"},
            }
        },
    )


@_q(
    "agg_adjacency_matrix",
    """SELECT * FROM (
  SELECT 'big' AS key, CAST(count(*) FILTER (WHERE value > 100) AS BIGINT) AS doc_count FROM events
  UNION ALL
  SELECT 'big&errors', CAST(count(*) FILTER (WHERE value > 100 AND event_type = 'error') AS BIGINT) FROM events
  UNION ALL
  SELECT 'errors', CAST(count(*) FILTER (WHERE event_type = 'error') AS BIGINT) FROM events
) WHERE doc_count > 0""",
)
def agg_adjacency_matrix(spark, sf_dir):
    """``adjacency_matrix`` (AdjacencyMatrixAggregationBuilder.java)."""
    ev = load_table(spark, sf_dir, "events")
    return aggs.adjacency_matrix(
        ev, {"big": F.col("value") > 100, "errors": F.col("event_type") == "error"}
    )


@_q(
    "agg_auto_date_histogram",
    """SELECT strftime(date_trunc('month', ts), '%Y-%m-%d %H:%M:%S') AS key,
       CAST(count(*) AS BIGINT) AS doc_count,
       'month' AS interval
FROM events GROUP BY 1 ORDER BY key ASC""",
)
def agg_auto_date_histogram(spark, sf_dir):
    """``auto_date_histogram`` (AutoDateHistogramAggregationBuilder.java):
    coarsest calendar interval yielding <= 10 buckets (month for the
    30-day events span)."""
    return aggs.auto_date_histogram(load_table(spark, sf_dir, "events"), "ts", 10)


@_q(
    "agg_sampler",
    _PRE
    + f""", __c1 AS ({_sql_clause({"spark": 1})}),
__samp AS (SELECT doc_id FROM __c1 ORDER BY sc DESC, doc_id ASC LIMIT 100)
SELECT dd.lang AS key, CAST(count(*) AS BIGINT) AS doc_count
FROM __samp s JOIN __docs dd ON dd.doc_id = s.doc_id
GROUP BY 1 ORDER BY doc_count DESC, key ASC LIMIT 10""",
)
def agg_sampler(spark, sf_dir):
    """``sampler`` agg (SamplerAggregationBuilder.java): sub-agg (terms
    on lang) over the top-100-scoring docs of the query."""
    eng = documents_engine(spark, sf_dir)
    from opensearch_spark.query import dsl as Q

    scored = eng._score(Q.Match("text", "spark"))
    dm = eng.index.docmap().select("_docid", "doc_id", "lang")
    sample = (
        scored.join(dm, "_docid")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(100)
    )
    return aggs.terms(sample, "lang")


@_q(
    "agg_significant_terms",
    """WITH fg AS (
  SELECT DISTINCT d.doc_id, d.source
  FROM documents d
  WHERE len(list_filter(string_split(d.text, ' '), x -> x = 'dup')) > 0
),
fgc AS (SELECT source AS key, CAST(count(*) AS BIGINT) AS fg_count FROM fg GROUP BY 1),
bgc AS (SELECT source AS key, CAST(count(*) AS BIGINT) AS bg_count FROM documents GROUP BY 1),
tot AS (SELECT (SELECT CAST(count(*) AS DOUBLE) FROM fg) AS fg_total,
               (SELECT CAST(count(*) AS DOUBLE) FROM documents) AS bg_total)
SELECT key, fg_count, bg_count,
       ROUND((fg_count / t.fg_total - bg_count / t.bg_total)
             * ((fg_count / t.fg_total) / (bg_count / t.bg_total)), 6) AS score
FROM fgc JOIN bgc USING (key) CROSS JOIN tot t
WHERE fg_count / t.fg_total > bg_count / t.bg_total
ORDER BY score DESC, key ASC
LIMIT 10""",
)
def agg_significant_terms(spark, sf_dir):
    """``significant_terms`` with JLH scoring
    (SignificantTermsAggregationBuilder.java): sources over-represented
    among docs containing 'dup'."""
    from opensearch_spark.ops.dedup import tokens_col

    docs = load_table(spark, sf_dir, "documents")
    fg_cond = F.array_contains(tokens_col("text"), "dup")
    return aggs.significant_terms(docs, fg_cond, "source")


# ================================================= aggregations

@_q(
    "agg_terms",
    """SELECT event_type AS key, CAST(count(*) AS BIGINT) AS doc_count
FROM events GROUP BY 1 ORDER BY doc_count DESC, key ASC LIMIT 10""",
)
def agg_terms(spark, sf_dir):
    """``terms`` bucket agg, default ordering (TermsAggregationBuilder.java:81-86)."""
    return aggs.terms(load_table(spark, sf_dir, "events"), "event_type")


@_q(
    "agg_terms_tree",
    """SELECT event_type AS key, CAST(count(*) AS BIGINT) AS doc_count,
       ROUND(avg(value), 6) AS avg_value,
       ROUND(CAST(max(value) AS DOUBLE), 6) AS max_value,
       CAST(count(DISTINCT user_id) AS BIGINT) AS users
FROM events GROUP BY 1
ORDER BY doc_count DESC, key ASC LIMIT 10""",
)
def agg_terms_tree(spark, sf_dir):
    """Aggregation tree: terms buckets with nested metric sub-aggs
    (avg/max/cardinality) in one grouped pass (SURVEY.md §2.4)."""
    ev = load_table(spark, sf_dir, "events")
    return aggs.terms_tree(
        ev,
        "event_type",
        {
            "avg_value": F.round(F.avg("value"), 6),
            "max_value": F.round(F.max("value").cast("double"), 6),
            "users": F.count_distinct(F.col("user_id")),
        },
    )


@_q(
    "sort_search_after_engine",
    _PRE
    + f""", __c1 AS ({_sql_clause({"spark": 1, "join": 1})})
SELECT doc_id, ROUND(sc, 4) AS score FROM (
  SELECT doc_id, sc, row_number() OVER (ORDER BY sc DESC, doc_id ASC) AS rn
  FROM __c1
) WHERE rn BETWEEN 6 AND 10
ORDER BY score DESC, doc_id ASC""",
)
def sort_search_after_engine(spark, sf_dir):
    """Engine-level ``search_after``: page 2 of the match via the last
    page-1 hit's raw (score, doc_id) sort key (SearchAfterBuilder.java)
    — equals ranks 6..10 of the full ordering."""
    eng = documents_engine(spark, sf_dir)
    page1 = eng.search({"match": {"text": "spark join"}}, size=5).collect()
    last = page1[-1]
    page2 = eng.search(
        {"match": {"text": "spark join"}},
        size=5,
        search_after=(last["score"], last["doc_id"]),
    )
    return page2.withColumn("score", F.round(F.col("score"), 4)).select(
        "doc_id", "score"
    )


@_q(
    "agg_multi_terms",
    """SELECT event_type AS key_event_type, CAST(user_id % 10 AS BIGINT) AS key_bucket,
       CAST(count(*) AS BIGINT) AS doc_count
FROM events GROUP BY 1, 2
ORDER BY doc_count DESC, key_event_type ASC, key_bucket ASC LIMIT 10""",
)
def agg_multi_terms(spark, sf_dir):
    """``multi_terms`` (SearchModule registry)."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "bucket", (F.col("user_id") % 10).cast("long")
    )
    return aggs.multi_terms(ev, ["event_type", "bucket"])


@_q(
    "agg_rare_terms",
    """SELECT CAST(user_id AS BIGINT) AS key, CAST(count(*) AS BIGINT) AS doc_count
FROM events GROUP BY 1 HAVING count(*) <= 55 ORDER BY key ASC""",
)
def agg_rare_terms(spark, sf_dir):
    """``rare_terms`` (RareTermsAggregationBuilder.java)."""
    return aggs.rare_terms(load_table(spark, sf_dir, "events"), "user_id", 55)


@_q(
    "agg_histogram",
    """SELECT CAST(floor(value / 50.0) * 50.0 AS DOUBLE) AS key,
       CAST(count(*) AS BIGINT) AS doc_count
FROM events GROUP BY 1 ORDER BY key ASC""",
)
def agg_histogram(spark, sf_dir):
    """``histogram`` fixed interval (HistogramAggregationBuilder.java)."""
    return aggs.histogram(load_table(spark, sf_dir, "events"), "value", 50.0)


@_q(
    "agg_date_histogram",
    """SELECT strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S') AS key,
       CAST(count(*) AS BIGINT) AS doc_count
FROM events GROUP BY 1 ORDER BY key ASC""",
)
def agg_date_histogram(spark, sf_dir):
    """``date_histogram`` calendar day (DateHistogramAggregator.java)."""
    return aggs.date_histogram(load_table(spark, sf_dir, "events"), "ts", "day")


@_q(
    "agg_range",
    """SELECT '*-50' AS key, CAST(count(*) FILTER (WHERE value < 50) AS BIGINT) AS doc_count FROM events
UNION ALL
SELECT '50-150', CAST(count(*) FILTER (WHERE value >= 50 AND value < 150) AS BIGINT) FROM events
UNION ALL
SELECT '150-*', CAST(count(*) FILTER (WHERE value >= 150) AS BIGINT) FROM events""",
)
def agg_range(spark, sf_dir):
    """``range`` bucket agg (RangeAggregationBuilder.java)."""
    return aggs.range_agg(
        load_table(spark, sf_dir, "events"), "value", [(None, 50), (50, 150), (150, None)]
    )


@_q(
    "agg_filters",
    """SELECT 'errors' AS key, CAST(count(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS doc_count FROM events
UNION ALL
SELECT 'big', CAST(count(*) FILTER (WHERE value > 100) AS BIGINT) FROM events""",
)
def agg_filters(spark, sf_dir):
    """``filters``: one bucket per predicate, conditional sums
    (FiltersAggregationBuilder.java)."""
    ev = load_table(spark, sf_dir, "events")
    return aggs.filters_agg(
        ev, {"errors": F.col("event_type") == "error", "big": F.col("value") > 100}
    )


@_q(
    "agg_missing",
    """SELECT CAST(count(*) FILTER (WHERE doc_id % 7 = 0) AS BIGINT) AS doc_count
FROM documents""",
)
def agg_missing(spark, sf_dir):
    """``missing`` bucket (MissingAggregationBuilder.java)."""
    return aggs.missing_agg(documents_df(spark, sf_dir), "src_alt")


@_q(
    "agg_composite",
    """SELECT * FROM (
  SELECT event_type AS key_event_type, CAST(user_id AS BIGINT) AS key_user_id,
         CAST(count(*) AS BIGINT) AS doc_count
  FROM events GROUP BY 1, 2
) WHERE key_event_type > 'error' OR (key_event_type = 'error' AND key_user_id > 5)
ORDER BY key_event_type ASC, key_user_id ASC LIMIT 10""",
)
def agg_composite(spark, sf_dir):
    """``composite`` paginated buckets with ``after`` keyset
    (CompositeAggregator.java)."""
    return aggs.composite(
        load_table(spark, sf_dir, "events"),
        ["event_type", "user_id"],
        size=10,
        after=("error", 5),
    )


@_q(
    "agg_stats",
    """SELECT CAST(count(value) AS BIGINT) AS count,
       ROUND(CAST(min(value) AS DOUBLE), 6) AS min,
       ROUND(CAST(max(value) AS DOUBLE), 6) AS max,
       ROUND(CAST(sum(value) AS DOUBLE), 4) AS sum,
       ROUND(avg(value), 6) AS avg
FROM events""",
)
def agg_stats(spark, sf_dir):
    """``stats`` metric agg (StatsAggregator.java)."""
    return aggs.stats(load_table(spark, sf_dir, "events"), "value")


@_q(
    "agg_extended_stats",
    """SELECT CAST(count(value) AS BIGINT) AS count,
       ROUND(CAST(sum(value) AS DOUBLE), 4) AS sum,
       ROUND(avg(value), 6) AS avg,
       ROUND(var_pop(value), 4) AS variance,
       ROUND(stddev_pop(value), 6) AS std_deviation
FROM events""",
)
def agg_extended_stats(spark, sf_dir):
    """``extended_stats`` with population variance
    (ExtendedStatsAggregator.java)."""
    return aggs.extended_stats(load_table(spark, sf_dir, "events"), "value")


@_q(
    "agg_value_count",
    "SELECT CAST(count(value) AS BIGINT) AS value_count FROM events",
)
def agg_value_count(spark, sf_dir):
    return aggs.value_count(load_table(spark, sf_dir, "events"), "value")


@_q(
    "agg_weighted_avg",
    """SELECT ROUND(sum(value * (user_id + 1)) / sum(CAST(user_id + 1 AS DOUBLE)), 6) AS weighted_avg
FROM events""",
)
def agg_weighted_avg(spark, sf_dir):
    """``weighted_avg`` = sum(v*w)/sum(w) (InternalWeightedAvg.java)."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "w", (F.col("user_id") + 1).cast("double")
    )
    return aggs.weighted_avg(ev, "value", "w")


@_q(
    "agg_cardinality",
    "SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS cardinality FROM events",
)
def agg_cardinality(spark, sf_dir):
    """``cardinality`` — exact variant for the verifiable gate; the
    HLL++ scale path is ``agg_cardinality_approx`` (rows-only check)."""
    return aggs.cardinality(load_table(spark, sf_dir, "events"), "user_id", exact=True)


@_q("agg_cardinality_approx")  # approx sketch: no SQL oracle (rows-only)
def agg_cardinality_approx(spark, sf_dir):
    """``cardinality`` via HLL++ (CardinalityAggregator.java,
    HyperLogLogPlusPlus.java:70 — precision 14 ~ rsd 0.01)."""
    return aggs.cardinality(load_table(spark, sf_dir, "events"), "user_id", exact=False)


@_q(
    "agg_percentiles",
    """SELECT ROUND(CAST(quantile_cont(value, 0.50) AS DOUBLE), 4) AS p50,
       ROUND(CAST(quantile_cont(value, 0.95) AS DOUBLE), 4) AS p95,
       ROUND(CAST(quantile_cont(value, 0.99) AS DOUBLE), 4) AS p99
FROM events""",
)
def agg_percentiles(spark, sf_dir):
    """``percentiles`` exact (the t-digest scale path is
    percentile_approx; AbstractTDigestPercentilesAggregator.java)."""
    return aggs.percentiles(load_table(spark, sf_dir, "events"), "value", (50, 95, 99))


@_q(
    "agg_top_hits",
    """SELECT event_type, CAST(rank AS INT) AS rank, event_id, value FROM (
  SELECT event_type, event_id, value,
         row_number() OVER (PARTITION BY event_type ORDER BY value DESC, event_id ASC) AS rank
  FROM events
) WHERE rank <= 3""",
)
def agg_top_hits(spark, sf_dir):
    """``top_hits`` per-bucket top-k (TopHitsAggregator.java)."""
    ev = load_table(spark, sf_dir, "events")
    return aggs.top_hits(ev, "event_type", "value", k=3, tie_col="event_id").select(
        "event_type", "rank", "event_id", "value"
    )


@_q(
    "agg_derivative",
    """WITH b AS (
  SELECT strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S') AS key,
         CAST(count(*) AS BIGINT) AS doc_count
  FROM events GROUP BY 1
)
SELECT key, doc_count,
       CAST(doc_count - lag(doc_count) OVER (ORDER BY key ASC) AS DOUBLE) AS derivative
FROM b ORDER BY key ASC""",
)
def agg_derivative(spark, sf_dir):
    """``derivative`` pipeline agg over date_histogram buckets
    (DerivativePipelineAggregator.java)."""
    b = aggs.date_histogram(load_table(spark, sf_dir, "events"), "ts", "day")
    return aggs.derivative(b)


@_q(
    "agg_cumulative_sum",
    """WITH b AS (
  SELECT strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S') AS key,
         CAST(count(*) AS BIGINT) AS doc_count
  FROM events GROUP BY 1
)
SELECT key, doc_count,
       CAST(sum(doc_count) OVER (ORDER BY key ASC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS cumulative_sum
FROM b ORDER BY key ASC""",
)
def agg_cumulative_sum(spark, sf_dir):
    """``cumulative_sum`` (CumulativeSumPipelineAggregator.java)."""
    b = aggs.date_histogram(load_table(spark, sf_dir, "events"), "ts", "day")
    return aggs.cumulative_sum(b)


@_q(
    "agg_moving_avg",
    """WITH b AS (
  SELECT strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S') AS key,
         CAST(count(*) AS BIGINT) AS doc_count
  FROM events GROUP BY 1
)
SELECT key, doc_count,
       ROUND(avg(CAST(doc_count AS DOUBLE)) OVER (ORDER BY key ASC ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6) AS moving_avg
FROM b ORDER BY key ASC""",
)
def agg_moving_avg(spark, sf_dir):
    """``moving_avg`` simple model, trailing window 7
    (MovAvgPipelineAggregator.java)."""
    b = aggs.date_histogram(load_table(spark, sf_dir, "events"), "ts", "day")
    return aggs.moving_avg(b, window=7)


@_q(
    "agg_serial_diff",
    """WITH b AS (
  SELECT strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S') AS key,
         CAST(count(*) AS BIGINT) AS doc_count
  FROM events GROUP BY 1
)
SELECT key, doc_count,
       CAST(doc_count - lag(doc_count, 2) OVER (ORDER BY key ASC) AS DOUBLE) AS serial_diff
FROM b ORDER BY key ASC""",
)
def agg_serial_diff(spark, sf_dir):
    """``serial_diff`` lag 2 (SerialDiffPipelineAggregator.java)."""
    b = aggs.date_histogram(load_table(spark, sf_dir, "events"), "ts", "day")
    return aggs.serial_diff(b, lag=2)


@_q(
    "agg_avg_bucket",
    """WITH b AS (SELECT date_trunc('day', ts) AS key, count(*) AS doc_count FROM events GROUP BY 1)
SELECT ROUND(avg(CAST(doc_count AS DOUBLE)), 6) AS avg_bucket FROM b""",
)
def agg_avg_bucket(spark, sf_dir):
    """``avg_bucket`` second-level metric (AvgBucketPipelineAggregator.java)."""
    b = aggs.date_histogram(load_table(spark, sf_dir, "events"), "ts", "day")
    return aggs.avg_bucket(b)


@_q(
    "agg_lineitem_pricing",
    """SELECT l_returnflag, l_linestatus,
       ROUND(CAST(sum(l_quantity) AS DOUBLE), 2) AS sum_qty,
       ROUND(CAST(sum(l_extendedprice) AS DOUBLE), 2) AS sum_base_price,
       ROUND(avg(l_discount), 6) AS avg_disc,
       CAST(count(*) AS BIGINT) AS count_order
FROM lineitem
GROUP BY 1, 2 ORDER BY 1, 2""",
)
def agg_lineitem_pricing(spark, sf_dir):
    """Nested terms->metrics agg tree over the largest table (the
    reference's agg-tree = groupBy on concatenated keys; SURVEY.md §2.4)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity").cast("double"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice").cast("double"), 2).alias("sum_base_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@_q(
    "suggest_term",
    _PRE
    + """
SELECT 'spak' AS token, term AS suggestion, CAST(df AS BIGINT) AS freq,
       CAST(levenshtein(term, 'spak') AS INT) AS distance
FROM __df
WHERE levenshtein(term, 'spak') BETWEEN 1 AND 2
ORDER BY distance ASC, df DESC, term ASC
LIMIT 5""",
)
def suggest_term(spark, sf_dir):
    """term suggester (SearchModule.java:863-893): edit-distance
    corrections ranked by frequency, missing mode."""
    from opensearch_spark.query import suggest

    eng = documents_engine(spark, sf_dir)
    return suggest.term_suggest(eng.index, "spak", max_edits=2, size=5)


@_q(
    "suggest_completion",
    _PRE
    + """
SELECT term AS suggestion, CAST(df AS BIGINT) AS freq
FROM __df WHERE term LIKE 's%'
ORDER BY df DESC, term ASC
LIMIT 10""",
)
def suggest_completion(spark, sf_dir):
    """completion suggester: prefix lookup over the term-sorted
    dictionary ranked by frequency (the FST analog)."""
    from opensearch_spark.query import suggest

    eng = documents_engine(spark, sf_dir)
    return suggest.completion_suggest(eng.index, "s", size=10)


@_q(
    "ingest_pipeline",
    """SELECT doc_id,
       regexp_replace(text, 'spark', 'sprk', 'g') AS text,
       'ingested' AS tag,
       CAST(n_chars AS DOUBLE) AS n_chars_d
FROM documents ORDER BY doc_id""",
)
def ingest_pipeline(spark, sf_dir):
    """ingest pipeline (§2.8): processor chain compiled to one Catalyst
    projection (gsub + set + convert)."""
    from opensearch_spark import ingest

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text", "n_chars")
    out = ingest.apply_pipeline(
        docs,
        [
            {"gsub": {"field": "text", "pattern": "spark", "replacement": "sprk"}},
            {"set": {"field": "tag", "value": "ingested"}},
            {"convert": {"field": "n_chars", "type": "double", "target_field": "n_chars_d"}},
        ],
    )
    return out.select("doc_id", "text", "tag", "n_chars_d").orderBy("doc_id")


@_q(
    "nested_query",
    """SELECT CAST(user_id AS BIGINT) AS user_id,
       ROUND(sum(value), 4) AS score,
       CAST(count(*) AS BIGINT) AS matched_children
FROM events
WHERE event_type = 'error' AND value > 150
GROUP BY user_id ORDER BY user_id""",
)
def nested_query(spark, sf_dir):
    """``nested`` block-join query (NestedQueryBuilder.java:508): users
    as parents of their event sub-docs; score_mode=sum over matching
    children."""
    from opensearch_spark.query import nested

    ev = load_table(spark, sf_dir, "events")
    nd = nested.nest(ev, ["user_id"], ["event_id", "event_type", "value"])
    out = nested.nested_query(
        nd,
        ["user_id"],
        (F.col("_child.event_type") == "error") & (F.col("_child.value") > 150),
        score_expr=F.col("_child.value"),
        score_mode="sum",
    )
    return out.withColumn("score", F.round(F.col("score"), 4)).orderBy("user_id")


@_q(
    "nested_has_child",
    """SELECT c.c_custkey, c.c_mktsegment,
       ROUND(g.score, 4) AS score, g.matched_children
FROM customer c JOIN (
  SELECT o_custkey, CAST(count(*) AS BIGINT) AS matched_children,
         max(o_totalprice) AS score
  FROM orders WHERE o_totalprice > 150000
  GROUP BY o_custkey HAVING count(*) >= 2
) g ON g.o_custkey = c.c_custkey
ORDER BY c.c_custkey""",
)
def nested_has_child(spark, sf_dir):
    """``has_child`` (parent-join module): customers with >= 2 big
    orders, scored by the max matching order price."""
    from opensearch_spark.query import nested

    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").withColumnRenamed(
        "o_custkey", "c_custkey"
    )
    out = nested.has_child(
        cust,
        orders,
        ["c_custkey"],
        F.col("o_totalprice") > 150000,
        score_expr=F.col("o_totalprice"),
        score_mode="max",
        min_children=2,
    )
    return (
        out.select(
            "c_custkey",
            "c_mktsegment",
            F.round(F.col("score"), 4).alias("score"),
            "matched_children",
        )
        .withColumnRenamed("c_custkey", "c_custkey")
        .orderBy("c_custkey")
    )


@_q(
    "nested_reverse",
    """SELECT CAST(user_id % 5 AS BIGINT) AS key,
       CAST(count(DISTINCT user_id) AS BIGINT) AS doc_count
FROM events WHERE event_type = 'error'
GROUP BY 1 ORDER BY doc_count DESC, key ASC""",
)
def nested_reverse(spark, sf_dir):
    """``reverse_nested`` (NestedAggregationBuilder.java): count PARENT
    docs per cohort bucket for a child-level predicate."""
    from opensearch_spark.query import nested

    ev = load_table(spark, sf_dir, "events").withColumn(
        "cohort", (F.col("user_id") % 5).cast("long")
    )
    nd = nested.nest(ev, ["user_id", "cohort"], ["event_id", "event_type", "value"])
    return nested.reverse_nested_agg(
        nd, ["user_id"], F.col("_child.event_type") == "error", "cohort"
    )


@_q(
    "agg_stats_bucket",
    """WITH b AS (SELECT date_trunc('day', ts) AS key, count(*) AS doc_count FROM events GROUP BY 1)
SELECT CAST(count(*) AS BIGINT) AS count,
       ROUND(CAST(min(doc_count) AS DOUBLE), 6) AS min,
       ROUND(CAST(max(doc_count) AS DOUBLE), 6) AS max,
       ROUND(CAST(sum(doc_count) AS DOUBLE), 4) AS sum,
       ROUND(avg(CAST(doc_count AS DOUBLE)), 6) AS avg
FROM b""",
)
def agg_stats_bucket(spark, sf_dir):
    """``stats_bucket`` over daily buckets."""
    b = aggs.date_histogram(load_table(spark, sf_dir, "events"), "ts", "day")
    return aggs.stats_bucket(b)


@_q(
    "agg_percentiles_bucket",
    """WITH b AS (SELECT date_trunc('day', ts) AS key, count(*) AS doc_count FROM events GROUP BY 1)
SELECT ROUND(CAST(quantile_cont(doc_count, 0.50) AS DOUBLE), 4) AS p50,
       ROUND(CAST(quantile_cont(doc_count, 0.95) AS DOUBLE), 4) AS p95
FROM b""",
)
def agg_percentiles_bucket(spark, sf_dir):
    """``percentiles_bucket`` over daily buckets."""
    b = aggs.date_histogram(load_table(spark, sf_dir, "events"), "ts", "day")
    return aggs.percentiles_bucket(b, percents=(50, 95))


@_q(
    "agg_mad",
    """SELECT ROUND(CAST(quantile_cont(abs(value - (SELECT quantile_cont(value, 0.5) FROM events)), 0.5) AS DOUBLE), 4) AS mad
FROM events""",
)
def agg_mad(spark, sf_dir):
    """``median_absolute_deviation`` exact
    (MedianAbsoluteDeviationAggregator.java)."""
    return aggs.median_absolute_deviation(load_table(spark, sf_dir, "events"), "value")


@_q(
    "agg_global",
    """SELECT 'errors_in_filtered' AS key,
       CAST((SELECT count(*) FROM events WHERE event_type = 'error' AND value > 100) AS BIGINT) AS doc_count
UNION ALL
SELECT 'all_docs', CAST(count(*) AS BIGINT) FROM events""",
)
def agg_global(spark, sf_dir):
    """``global`` agg (GlobalAggregationBuilder.java): escape the query
    context — a filtered count next to the unfiltered corpus count."""
    ev = load_table(spark, sf_dir, "events")
    filtered = ev.filter((F.col("event_type") == "error") & (F.col("value") > 100))
    a = filtered.agg(F.count(F.lit(1)).alias("doc_count")).select(
        F.lit("errors_in_filtered").alias("key"), "doc_count"
    )
    b = ev.agg(F.count(F.lit(1)).alias("doc_count")).select(
        F.lit("all_docs").alias("key"), "doc_count"
    )
    return a.unionByName(b)


# ================================================= sort / pagination

@_q(
    "sort_search_after",
    """SELECT event_id, value FROM events
WHERE value < 150.0 OR (value = 150.0 AND event_id > 500)
ORDER BY value DESC, event_id ASC LIMIT 10""",
)
def sort_search_after(spark, sf_dir):
    """``search_after`` keyset pagination (SearchAfterBuilder.java):
    filter on the sort tuple, then top-k."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(
            (F.col("value") < 150.0)
            | ((F.col("value") == 150.0) & (F.col("event_id") > 500))
        )
        .orderBy(F.desc("value"), F.asc("event_id"))
        .limit(10)
        .select("event_id", "value")
    )


@_q(
    "sort_field",
    """SELECT event_id, value FROM events
ORDER BY value DESC NULLS LAST, event_id ASC LIMIT 20""",
)
def sort_field(spark, sf_dir):
    """field sort with deterministic tie-break (FieldSortBuilder.java)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.orderBy(F.desc_nulls_last("value"), F.asc("event_id"))
        .limit(20)
        .select("event_id", "value")
    )


@_q(
    "sort_collapse",
    """SELECT CAST(user_id AS BIGINT) AS user_id, event_id, value FROM (
  SELECT user_id, event_id, value,
         row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id ASC) AS rn
  FROM events
) WHERE rn = 1 ORDER BY user_id""",
)
def sort_collapse(spark, sf_dir):
    """``collapse``: one best hit per field value (CollapseBuilder.java)."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("value"), F.asc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "value")
        .orderBy("user_id")
    )


# ================================================= dedup

@_q(
    "dedup_exact",
    """SELECT doc_id, md5(text) AS group_key,
       CAST(count(*) OVER (PARTITION BY md5(text)) AS BIGINT) AS group_size,
       CAST(row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS INT) AS dup_rank,
       (row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1) AS is_canonical
FROM documents""",
)
def dedup_exact(spark, sf_dir):
    """Exact dedup by content hash (hash-groupBy)."""
    return dedup.exact_duplicates(load_table(spark, sf_dir, "documents"))


@_q(
    "dedup_fingerprint",
    _PRE
    + """
SELECT doc_id, k AS group_key,
       CAST(count(*) OVER (PARTITION BY k) AS BIGINT) AS group_size,
       CAST(row_number() OVER (PARTITION BY k ORDER BY doc_id) AS INT) AS dup_rank,
       (row_number() OVER (PARTITION BY k ORDER BY doc_id) = 1) AS is_canonical
FROM (SELECT doc_id, md5(array_to_string(toks[1:6], ' ')) AS k FROM __docs)""",
)
def dedup_fingerprint(spark, sf_dir):
    """Near-exact dedup on the first-6-token fingerprint."""
    return dedup.fingerprint_duplicates(load_table(spark, sf_dir, "documents"), prefix=6)


@_q(
    "dedup_ngram_jaccard",
    _PRE
    + """, __sh AS (
  SELECT DISTINCT doc_id, array_to_string(toks[p : p + 2], ' ') AS shingle
  FROM (SELECT doc_id, toks, generate_subscripts(toks, 1) AS p FROM __docs)
  WHERE p + 2 <= len(toks)
),
__sz AS (SELECT doc_id, count(*) AS sz FROM __sh GROUP BY 1),
__inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
  FROM __sh a JOIN __sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b, ROUND(CAST(i AS DOUBLE) / (sa.sz + sb.sz - i), 6) AS jaccard
FROM __inter
JOIN __sz sa ON sa.doc_id = id_a
JOIN __sz sb ON sb.doc_id = id_b
WHERE ROUND(CAST(i AS DOUBLE) / (sa.sz + sb.sz - i), 6) >= 0.8
ORDER BY id_a, id_b""",
)
def dedup_ngram_jaccard(spark, sf_dir):
    """Exact 3-gram Jaccard near-dup pairs (shingle inverted-index join)."""
    return dedup.jaccard_pairs(
        load_table(spark, sf_dir, "documents"), n=3, threshold=0.8
    ).orderBy("id_a", "id_b")


@_q("dedup_minhash")  # LSH recall is probabilistic: rows-only check
def dedup_minhash(spark, sf_dir):
    """MinHash+LSH candidate generation, exact-Jaccard verified."""
    return dedup.minhash_lsh_pairs(
        load_table(spark, sf_dir, "documents"), n=3, threshold=0.8
    ).orderBy("id_a", "id_b")


@_q("dedup_simhash")  # banded Hamming candidates: rows-only check
def dedup_simhash(spark, sf_dir):
    """SimHash near-dup pairs (Hamming <= 3 via pigeonhole banding)."""
    return dedup.simhash_pairs(load_table(spark, sf_dir, "documents")).orderBy(
        "id_a", "id_b"
    )


@_q(
    "dedup_embedding",
    """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       ROUND(list_dot_product(a.e, b.e) /
             (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))), 6) AS cosine
FROM v a JOIN v b ON a.vec_id < b.vec_id
WHERE ROUND(list_dot_product(a.e, b.e) /
      (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))), 6) >= 0.95
ORDER BY id_a, id_b""",
)
def dedup_embedding(spark, sf_dir):
    """Embedding-cosine near-dup pairs (brute-force baseline)."""
    return dedup.embedding_dup_pairs(
        load_table(spark, sf_dir, "embeddings"), threshold=0.95
    ).orderBy("id_a", "id_b")


# ================================================= similarity search

@_q(
    "ann_cosine_topk",
    """WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id < 3),
c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings)
SELECT query_id, CAST(rank AS INT) AS rank, vec_id, cosine FROM (
  SELECT q.query_id, c.vec_id,
         ROUND(list_dot_product(c.cv, q.qv) /
               (sqrt(list_dot_product(c.cv, c.cv)) * sqrt(list_dot_product(q.qv, q.qv))), 6) AS cosine,
         row_number() OVER (
           PARTITION BY q.query_id
           ORDER BY ROUND(list_dot_product(c.cv, q.qv) /
                 (sqrt(list_dot_product(c.cv, c.cv)) * sqrt(list_dot_product(q.qv, q.qv))), 6) DESC,
                 c.vec_id ASC
         ) AS rank
  FROM c CROSS JOIN q
) WHERE rank <= 5""",
)
def ann_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-k (the exact ANN baseline)."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return similarity.cosine_topk(emb, q, k=5)


@_q("ann_ivf_topk")  # approximate probe: rows-only check
def ann_ivf_topk(spark, sf_dir):
    """IVF-partitioned approximate top-k (partition-pruned probes)."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return similarity.ivf_topk(emb, q, k=5, nlist=16, nprobe=4)


@_q(
    "hybrid_rrf",
    _PRE
    + f""", __c1 AS ({_sql_clause({"spark": 1, "join": 1})}),
__bm AS (SELECT doc_id, CAST(row_number() OVER (ORDER BY sc DESC, doc_id ASC) AS INT) AS rank
         FROM __c1 ORDER BY sc DESC, doc_id ASC LIMIT 20),
__q0 AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
__ann AS (
  SELECT vec_id AS doc_id, CAST(rank AS INT) AS rank FROM (
    SELECT c.vec_id,
           row_number() OVER (
             ORDER BY ROUND(list_dot_product(CAST(c.embedding AS DOUBLE[]), q.qv) /
                   (sqrt(list_dot_product(CAST(c.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])))
                    * sqrt(list_dot_product(q.qv, q.qv))), 6) DESC,
             c.vec_id ASC
           ) AS rank
    FROM embeddings c CROSS JOIN __q0 q
  ) WHERE rank <= 20
),
__u AS (
  SELECT doc_id, 1.0 / (60.0 + rank) AS c FROM __bm
  UNION ALL
  SELECT doc_id, 1.0 / (60.0 + rank) AS c FROM __ann
)
SELECT doc_id, ROUND(SUM(c), 6) AS rrf_score
FROM __u GROUP BY doc_id
ORDER BY rrf_score DESC, doc_id ASC
LIMIT 10""",
)
def hybrid_rrf(spark, sf_dir):
    """Hybrid BM25 + vector retrieval, reciprocal rank fusion (k=60):
    lexical top-20 for 'spark join' fused with cosine top-20 around the
    vec_id=0 embedding (doc_id aligns with vec_id in the testdata)."""
    from opensearch_spark.ops import hybrid, similarity
    from opensearch_spark.query import dsl as Q
    from pyspark.sql import Window

    eng = documents_engine(spark, sf_dir)
    scored = eng._score(Q.Match("text", "spark join"))
    dm = eng.index.docmap().select("_docid", "doc_id")
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    bm = (
        scored.join(dm, "_docid")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 20)
        .select("doc_id", "rank")
    )
    emb = load_table(spark, sf_dir, "embeddings")
    q0 = emb.filter(F.col("vec_id") == 0).select(
        F.lit(0).alias("query_id"), "embedding"
    )
    ann = similarity.cosine_topk(emb, q0, k=20).select(
        F.col("vec_id").alias("doc_id"), "rank"
    )
    return hybrid.rrf_fuse([bm, ann], id_col="doc_id", size=10)


# ================================================= text analysis

@_q(
    "text_token_stats",
    _PRE
    + """
SELECT doc_id,
       CAST(len(toks) AS INT) AS n_tokens,
       CAST(len(list_distinct(toks)) AS INT) AS n_distinct,
       ROUND(CASE WHEN len(toks) > 0
             THEN CAST(list_aggregate(list_transform(toks, x -> length(x)), 'sum') AS DOUBLE) / len(toks)
             ELSE 0.0 END, 4) AS mean_token_len
FROM __docs ORDER BY doc_id""",
)
def text_token_stats(spark, sf_dir):
    """Per-doc token statistics (token_count field-type semantics)."""
    return textstats.token_stats(load_table(spark, sf_dir, "documents")).orderBy("doc_id")


_STOP_SQL = "[" + ",".join(f"'{w}'" for w in textstats.QUALITY_STOPWORDS) + "]"

@_q(
    "text_quality",
    _PRE
    + f""", __m AS (
  SELECT doc_id,
         CAST(len(toks) AS DOUBLE) AS n,
         CAST(len(list_filter(toks, t -> list_contains({_STOP_SQL}, t))) AS DOUBLE) AS n_stop,
         CAST(len(list_distinct(toks)) AS DOUBLE) AS uniq
  FROM __docs
),
__r AS (
  SELECT doc_id,
         CASE WHEN n > 0 THEN n_stop / n ELSE 0.0 END AS stop_ratio,
         CASE WHEN n > 0 THEN uniq / n ELSE 0.0 END AS ttr,
         least(n / 64.0, 1.0) AS len_score
  FROM __m
)
SELECT doc_id,
       ROUND(stop_ratio, 6) AS stop_ratio,
       ROUND(ttr, 6) AS type_token_ratio,
       ROUND(len_score, 6) AS length_score,
       ROUND(0.4 * len_score + 0.3 * ttr + 0.3 * (1.0 - abs(stop_ratio - 0.4)), 6) AS quality
FROM __r ORDER BY doc_id""",
)
def text_quality(spark, sf_dir):
    """Heuristic quality scoring (length/stopword/type-token ratios)."""
    return textstats.quality_scores(load_table(spark, sf_dir, "documents")).orderBy(
        "doc_id"
    )


@_q(
    "text_langid",
    _PRE
    + f""", __m AS (
  SELECT doc_id,
         CAST(len(toks) AS DOUBLE) AS n,
         CAST(len(list_filter(toks, t -> list_contains({_STOP_SQL}, t))) AS DOUBLE) AS hit
  FROM __docs
)
SELECT doc_id,
       ROUND(CASE WHEN n > 0 THEN hit / n ELSE 0.0 END, 6) AS en_rate,
       CASE WHEN (CASE WHEN n > 0 THEN hit / n ELSE 0.0 END) >= 0.2 THEN 'en' ELSE 'und' END AS pred_lang
FROM __m ORDER BY doc_id""",
)
def text_langid(spark, sf_dir):
    """Language-ID heuristic (English function-word hit rate)."""
    return textstats.language_id(load_table(spark, sf_dir, "documents")).orderBy("doc_id")


@_q(
    "text_fingerprint",
    _PRE
    + """
SELECT doc_id, md5(array_to_string(list_sort(list_distinct(toks)), ' ')) AS fingerprint
FROM __docs ORDER BY doc_id""",
)
def text_fingerprint(spark, sf_dir):
    """OpenRefine-style fingerprint key (sorted distinct token md5)."""
    return textstats.fingerprints(load_table(spark, sf_dir, "documents")).orderBy("doc_id")
