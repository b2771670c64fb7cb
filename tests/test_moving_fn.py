"""moving_fn pipeline-agg models vs hand-computed references."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from opensearch_spark import aggs

SERIES = [10.0, 12.0, 9.0, 14.0, 20.0, 7.0, 11.0]


@pytest.fixture(scope="module")
def buckets(spark):
    return spark.createDataFrame(
        [(f"k{i:02d}", v) for i, v in enumerate(SERIES)], "key string, doc_count double"
    )


def _trailing(i, w):
    return SERIES[max(0, i - w + 1) : i + 1]


def test_moving_fn_ewma(buckets):
    rows = aggs.moving_fn(buckets, window=3, model="ewma", alpha=0.3).orderBy("key").collect()
    for i, r in enumerate(rows):
        a = _trailing(i, 3)
        s = a[0]
        for x in a[1:]:
            s = 0.3 * x + 0.7 * s
        assert r["moving_fn"] == pytest.approx(round(s, 6))


def test_moving_fn_linear(buckets):
    rows = aggs.moving_fn(buckets, window=4, model="linear").orderBy("key").collect()
    for i, r in enumerate(rows):
        a = np.array(_trailing(i, 4))
        w = np.arange(1, a.size + 1)
        assert r["moving_fn"] == pytest.approx(round(float((a * w).sum() / w.sum()), 6))


def test_moving_fn_holt(buckets):
    rows = aggs.moving_fn(buckets, window=5, model="holt", alpha=0.4, beta=0.2).orderBy("key").collect()
    for i, r in enumerate(rows):
        a = _trailing(i, 5)
        s, b = a[0], (a[1] - a[0]) if len(a) > 1 else 0.0
        for x in a[1:]:
            sp = s
            s = 0.4 * x + 0.6 * (s + b)
            b = 0.2 * (s - sp) + 0.8 * b
        assert r["moving_fn"] == pytest.approx(round(float(s), 6))


def test_bucket_script(buckets):
    out = aggs.bucket_script(
        buckets, "ratio", F.round(F.col("doc_count") / F.lit(10.0), 6)
    ).orderBy("key").collect()
    for r, v in zip(out, SERIES):
        assert r["ratio"] == pytest.approx(round(v / 10.0, 6))
