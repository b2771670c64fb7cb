"""Events-correlation engine (plugins/events-correlation-engine;
ops/correlate.py): banded time join == brute-force window join, and the
plan contains no cartesian/broadcast-nested-loop join."""

import random

import pytest
from pyspark.sql import functions as F

from opensearch_spark.ops.correlate import correlate_events, correlated_ids


def _frames(spark):
    rng = random.Random(7)
    rows_a = [(i, float(rng.randrange(0, 5000))) for i in range(120)]
    rows_b = [(1000 + i, float(rng.randrange(0, 5000))) for i in range(150)]
    a = spark.createDataFrame(rows_a, "event_id long, tsec double").withColumn(
        "ts", F.timestamp_seconds(F.col("tsec"))
    )
    b = spark.createDataFrame(rows_b, "event_id long, tsec double").withColumn(
        "ts", F.timestamp_seconds(F.col("tsec"))
    )
    return a, b, rows_a, rows_b


def test_banded_join_matches_brute_force(spark):
    a, b, rows_a, rows_b = _frames(spark)
    w = 60.0
    pairs = correlate_events({"alpha": a, "beta": b}, window_seconds=w).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    want = {
        (ia, ib)
        for ia, ta in rows_a
        for ib, tb in rows_b
        if abs(ta - tb) <= w
    }
    assert got == want and len(want) > 50
    # no duplicate pairs from the 3-bucket explode
    assert len(pairs) == len(got)
    # correlated_ids covers both sides
    ids_a = {r["id"] for r in correlated_ids(
        correlate_events({"alpha": a, "beta": b}, window_seconds=w), "alpha"
    ).collect()}
    assert ids_a == {ia for ia, _ in want}


def test_correlate_plan_no_cartesian(spark):
    a, b, _, _ = _frames(spark)
    plan = correlate_events(
        {"alpha": a, "beta": b}, window_seconds=60.0
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_correlate_validation(spark):
    a, _, _, _ = _frames(spark)
    with pytest.raises(ValueError, match="two sources"):
        correlate_events({"only": a})
