"""Deterministic sampling ops (ops/sampling.py): membership is pure
integer hash math — rerun-stable, partition-layout independent, and
exactly replayable by the SQL oracle (agg_samplers suite)."""

from __future__ import annotations

import pytest

from opensearch_spark.ops import sampling as smp


def test_mixture_quotas_sum_and_bounds():
    counts = {"de": 70, "en": 218, "es": 73, "fr": 64, "zh": 75}
    q = smp.mixture_quotas(counts, alpha=0.5, target=300)
    assert sum(q.values()) == 300
    assert all(0 <= q[k] <= counts[k] for k in counts)
    # alpha=0.5 upweights rare domains: en's share shrinks vs proportional
    assert q["en"] / 300 < counts["en"] / sum(counts.values())


def test_mixture_quotas_alpha_one_is_proportional_ish():
    counts = {"a": 100, "b": 300}
    q = smp.mixture_quotas(counts, alpha=1.0, target=40)
    assert q == {"a": 10, "b": 30}


def test_mixture_quotas_saturation_spills_to_others():
    # domain 'a' can contribute at most 3 rows; remainder flows to 'b'
    q = smp.mixture_quotas({"a": 3, "b": 1000}, alpha=0.5, target=500)
    assert q["a"] == 3
    assert sum(q.values()) == 500


@pytest.mark.spark
def test_hash_split_partition_layout_invariance(spark):
    df1 = spark.range(0, 500, 1, 2).withColumnRenamed("id", "doc_id")
    df2 = spark.range(0, 500, 1, 17).withColumnRenamed("id", "doc_id")
    s1 = {
        (r.doc_id, r.split)
        for r in smp.hash_split(df1, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}).collect()
    }
    s2 = {
        (r.doc_id, r.split)
        for r in smp.hash_split(df2, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}).collect()
    }
    assert s1 == s2  # unlike df.sample(), layout cannot change membership
    names = {s for _, s in s1}
    assert names == {"train", "val", "test"}


@pytest.mark.spark
def test_reservoir_and_mixture_sizes(spark):
    import pyspark.sql.functions as F

    df = (
        spark.range(0, 400)
        .withColumnRenamed("id", "doc_id")
        .withColumn("dom", (F.col("doc_id") % 4).cast("string"))
    )
    rv = smp.reservoir_per_key(df, "dom", "doc_id", 5)
    sizes = {r.dom: r.c for r in rv.groupBy("dom").agg(F.count("*").alias("c")).collect()}
    assert sizes == {"0": 5, "1": 5, "2": 5, "3": 5}

    mx = smp.mixture_sample(df, "dom", "doc_id", alpha=0.5, target=100)
    by = {r.dom: r.c for r in mx.groupBy("dom").agg(F.count("*").alias("c")).collect()}
    assert sum(by.values()) == 100
    # equal counts -> equal quotas
    assert set(by.values()) == {25}
