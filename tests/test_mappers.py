"""mapper-size / mapper-murmur3 plugin analogs (ops/mappers.py)."""

import pytest
from pyspark.sql import functions as F


def test_size_field_is_byte_length(spark):
    df = spark.createDataFrame(
        [("a", "héllo"), ("b", None)], "id string, text string"
    )
    out = {r["id"]: r["_size"] for r in
           __import__("opensearch_spark.ops.mappers", fromlist=["x"])
           .with_size_field(df, ["id", "text"]).collect()}
    # é is 2 UTF-8 bytes; NULL counts 0 (reference sizes the source bytes)
    assert out["a"] == 1 + 6
    assert out["b"] == 1


def test_size_field_defaults_to_string_cols(spark):
    from opensearch_spark.ops.mappers import with_size_field

    df = spark.createDataFrame([(1, "ab", "cd")], "n int, s1 string, s2 string")
    assert with_size_field(df).collect()[0]["_size"] == 4
    with pytest.raises(ValueError):
        with_size_field(df.select("n"))


def test_murmur3_field_cardinality_and_nulls(spark):
    from opensearch_spark.ops.mappers import with_murmur3_field

    df = spark.createDataFrame(
        [(i % 7,) for i in range(100)] + [(None,)], "v long"
    ).withColumn("v", F.col("v").cast("string"))
    h = with_murmur3_field(df, "v", out="h")
    rows = h.collect()
    assert sum(1 for r in rows if r["h"] is None) == 1
    # cardinality of hashes == cardinality of values
    assert h.agg(F.countDistinct("h")).collect()[0][0] == 7
    # deterministic across evaluations (7 hashes + the NULL row)
    assert h.select("h").distinct().count() == 8


def test_token_count_field(spark):
    # mapper-extras TokenCountFieldMapper: counts analyzed tokens with
    # the index's own chain; NULL stays NULL
    from opensearch_spark.ops.mappers import with_token_count_field

    df = spark.createDataFrame(
        [("a", "Hello, big WORLD"), ("b", ""), ("c", None)],
        "id string, text string",
    )
    out = {r["id"]: r["n"] for r in
           with_token_count_field(df, "text", out="n").collect()}
    assert out == {"a": 3, "b": 0, "c": None}
    # a stop-filtered chain counts surviving tokens only
    out2 = with_token_count_field(
        df.filter("id = 'a'"), "text", out="n",
        analyzer={"tokenizer": "standard",
                  "filter": ["lowercase", {"type": "stop", "stopwords": ["big"]}]},
    ).collect()[0]["n"]
    assert out2 == 2


def test_default_out_names_have_no_dots(spark):
    # dotted defaults would read as struct-field access downstream
    from opensearch_spark.ops.mappers import (
        with_murmur3_field,
        with_token_count_field,
    )

    df = spark.createDataFrame([("x",)], "v string")
    h = with_murmur3_field(df, "v")
    assert "v_mm3" in h.columns
    assert h.select(F.col("v_mm3")).count() == 1  # resolvable unquoted
    t = with_token_count_field(df, "v")
    assert "v_token_count" in t.columns
