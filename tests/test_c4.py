"""C4-style cleaning operators (ops/c4.py): line/page filters and the
three-sentence-span corpus dedup (Raffel et al. 2020, §2.2).

Hand-computed pins on tiny planted corpora, plus plan gates: the
line-filter plan must contain zero shuffles and zero Python stages;
the span-dedup plan must contain no cartesian product and no Python.
"""

import hashlib

import pytest
from pyspark.sql import functions as F

from opensearch_spark.ops import c4


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


# --------------------------------------------------------- line filters


def test_line_filters_hand_pinned(spark):
    rows = [
        # doc 0: 3 good lines -> page kept
        (0, ["alpha beta gamma delta epsilon.",
             "one two three four five six!",
             'quoted line with five words"',
             "short line."]),                       # short -> dropped
        # doc 1: javascript line + only 2 good -> page dropped (min_kept)
        (1, ["alpha beta gamma delta epsilon.",
             "enable javascript to view this.",
             "one two three four five?"]),
        # doc 2: good lines but page has a brace -> page dropped
        (2, ["alpha beta gamma delta epsilon.",
             "one two three four five six.",
             "seven eight nine ten eleven.",
             "function() { return 1; }."]),
        # doc 3: lorem ipsum page marker
        (3, ["Lorem ipsum dolor sit amet consectetur.",
             "one two three four five six.",
             "seven eight nine ten eleven."]),
        # doc 4: no terminal punctuation anywhere
        (4, ["alpha beta gamma delta epsilon",
             "one two three four five six"]),
    ]
    df = spark.createDataFrame(rows, "doc_id long, lines array<string>")
    out = {r["doc_id"]: r for r in c4.line_filters(df).collect()}

    assert out[0]["n_lines"] == 4 and out[0]["n_kept"] == 3
    assert out[0]["page_kept"] == 1
    assert out[0]["c4_fp"] == _md5(
        "alpha beta gamma delta epsilon.\n"
        "one two three four five six!\n"
        'quoted line with five words"'
    )
    assert out[1]["n_kept"] == 2 and out[1]["page_kept"] == 0
    assert out[2]["n_kept"] == 4 and out[2]["page_kept"] == 0  # brace
    assert out[3]["n_kept"] == 3 and out[3]["page_kept"] == 0  # lorem ipsum
    assert out[4]["n_kept"] == 0 and out[4]["page_kept"] == 0
    assert out[4]["kept_frac"] == 0.0


def test_line_filters_plan_no_shuffle_no_python(spark):
    df = spark.createDataFrame(
        [(0, ["a b c d e."])], "doc_id long, lines array<string>"
    )
    plan = c4.line_filters(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas", "PythonMapInArrow"):
        assert marker not in plan


# ----------------------------------------------------------- span dedup


def test_span_dedup_hand_pinned(spark):
    # doc 0 and doc 2 share sentences s0,s1,s2 (one duplicated span);
    # doc 1 is unique; doc 3 repeats doc 0's s1..s3 window shifted.
    s = [f"sent number {i} body" for i in range(6)]
    rows = [
        (0, [s[0], s[1], s[2], s[3]]),
        (1, ["u1", "u2", "u3", "u4"]),
        (2, [s[0], s[1], s[2], "tail2"]),
        (3, [s[1], s[2], s[3], "tail3"]),
    ]
    df = spark.createDataFrame(rows, "doc_id long, sents array<string>")
    out = {r["doc_id"]: r for r in c4.span_dedup(df).collect()}

    # doc 0 is the first occurrence of both duplicated spans -> intact
    assert out[0]["n_removed"] == 0
    assert out[0]["span_fp"] == _md5("\n".join([s[0], s[1], s[2], s[3]]))
    # doc 1 untouched
    assert out[1]["n_removed"] == 0
    # doc 2: span (s0,s1,s2) duplicates doc 0's first span -> 3 sentences go
    assert out[2]["n_removed"] == 3
    assert out[2]["span_fp"] == _md5("tail2")
    # doc 3: span (s1,s2,s3) duplicates doc 0's second span
    assert out[3]["n_removed"] == 3
    assert out[3]["span_fp"] == _md5("tail3")
    assert out[3]["span_kept_frac"] == 0.25


def test_span_dedup_overlapping_coverage_union(spark):
    # doc 1 repeats doc 0's sentences 0..3 -> two overlapping duplicate
    # spans (0,1,2) and (1,2,3); coverage union removes 4 sentences once.
    s = [f"x {i} y" for i in range(4)]
    rows = [(0, s + ["tail0"]), (1, s + ["zz"])]
    df = spark.createDataFrame(rows, "doc_id long, sents array<string>")
    out = {r["doc_id"]: r for r in c4.span_dedup(df).collect()}
    assert out[0]["n_removed"] == 0
    assert out[1]["n_removed"] == 4
    assert out[1]["span_fp"] == _md5("zz")


def test_span_dedup_short_and_empty_docs(spark):
    rows = [(0, ["a", "b"]), (1, []), (2, ["a", "b", "c"])]
    df = spark.createDataFrame(rows, "doc_id long, sents array<string>")
    out = {r["doc_id"]: r for r in c4.span_dedup(df).collect()}
    assert out[0]["n_removed"] == 0 and out[0]["n_sents"] == 2
    assert out[1]["n_sents"] == 0 and out[1]["span_fp"] == _md5("")
    assert out[2]["n_removed"] == 0  # 1 span, unique


def test_span_dedup_identical_docs_first_kept(spark):
    # three byte-identical docs: first keeps everything, rest lose all
    s = ["p q r s t", "u v w x y", "m n o p q"]
    df = spark.createDataFrame(
        [(7, s), (8, s), (9, s)], "doc_id long, sents array<string>"
    )
    out = {r["doc_id"]: r for r in c4.span_dedup(df).collect()}
    assert out[7]["n_removed"] == 0
    assert out[8]["n_removed"] == 3 and out[8]["span_fp"] == _md5("")
    assert out[9]["n_removed"] == 3


def test_span_dedup_plan_no_cartesian_no_python(spark):
    df = spark.createDataFrame(
        [(0, ["a", "b", "c"])], "doc_id long, sents array<string>"
    )
    plan = c4.span_dedup(df)._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan and "NestedLoop" not in plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas", "PythonMapInArrow"):
        assert marker not in plan


# ------------------------------------------------- sentence segmentation


def test_sentences_from_tokens_padding(spark):
    df = spark.createDataFrame([(0, "a b c d e f g h i j")], "doc_id long, text string")
    out = df.select(
        c4.sentences_from_tokens(
            F.split("text", " "), sent_tokens=4
        ).alias("s")
    ).collect()[0]["s"]
    assert out == ["a b c d", "e f g h", "i j pad pad"]


def test_sentences_from_tokens_empty(spark):
    df = spark.createDataFrame([(0,)], "doc_id long").withColumn(
        "toks", F.array().cast("array<string>")
    )
    out = df.select(
        c4.sentences_from_tokens(F.col("toks"), sent_tokens=4).alias("s")
    ).collect()[0]["s"]
    assert out == []
