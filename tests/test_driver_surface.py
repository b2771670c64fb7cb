"""Mirror of the driver's correctness gate: run every ``queries()``
entry on Spark AND its DuckDB oracle on the same parquet tables,
compare row count, column names and values (order-insensitive).

Catches oracle drift locally before the driver does.  Uses sf0.001
(same row counts as the driver's sf0.01 gate).
"""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod
from opensearch_spark.analysis import analyzer as ana

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(path):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def test_oracle_tokenizer_assumption(ddb):
    """The SQL oracles tokenize by splitting on spaces; pin that this
    equals the standard analyzer on the documents corpus."""
    rows = ddb.sql("SELECT text FROM documents").fetchall()
    for (text,) in rows:
        assert ana.tokenize(text) == [t for t in text.split(" ") if t]


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    out = df.copy()
    for c in out.columns:
        if out[c].dtype == object:
            # unify None / NaN and stringify timestamps
            out[c] = out[c].map(lambda v: None if v is None else v)
    cols = sorted(out.columns)
    out = out[cols]
    return out.sort_values(cols, ignore_index=True, na_position="first")


def _compare(name: str, spark_df: pd.DataFrame, oracle_df: pd.DataFrame):
    assert sorted(spark_df.columns) == sorted(oracle_df.columns), (
        f"{name}: column mismatch {list(spark_df.columns)} vs {list(oracle_df.columns)}"
    )
    assert len(spark_df) == len(oracle_df), (
        f"{name}: row count {len(spark_df)} vs {len(oracle_df)}"
    )
    a, b = _norm(spark_df), _norm(oracle_df)
    for c in a.columns:
        av, bv = a[c].tolist(), b[c].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            if isinstance(x, float) and isinstance(y, float):
                if math.isnan(x) and math.isnan(y):
                    continue
                assert x == pytest.approx(y, abs=0, rel=0), (
                    f"{name}: value mismatch col={c} row={i}: {x!r} != {y!r}"
                )
            else:
                assert (x == y) or (pd.isna(x) and pd.isna(y)), (
                    f"{name}: value mismatch col={c} row={i}: {x!r} != {y!r}"
                )


ORACLE_NAMES = sorted(entry_mod.oracle_sql())
ROWS_ONLY = sorted(set(entry_mod.queries()) - set(ORACLE_NAMES))


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_matches_oracle(spark, ddb, name):
    q = entry_mod.queries()[name]
    sdf = q(spark, SF_DIR).toPandas()
    odf = ddb.sql(entry_mod.oracle_sql()[name]).df()
    # timestamps -> string for uniform comparison
    for df in (sdf, odf):
        for c in df.columns:
            if str(df[c].dtype).startswith("datetime"):
                df[c] = df[c].astype(str)
    _compare(name, sdf, odf)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, name):
    df = entry_mod.queries()[name](spark, SF_DIR)
    assert df.count() >= 0  # runs and has a stable schema
    assert len(df.columns) > 0


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert "score" in df.columns
