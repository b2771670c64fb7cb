"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship BM25 match query over an inverted index
built from the sf0.001 ``documents`` table; ``queries``/``oracle_sql``
expose every implemented operator (SURVEY.md §2 plus the training-data
pipeline ops) with DuckDB-runnable oracles — see
``opensearch_spark/driver_surface.py`` for the registry and the float
score-parity contract.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from opensearch_spark import driver_surface


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: BM25 top-10 ``match`` on /root/testdata/sf0.001."""
    return driver_surface.ft_match_or(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(driver_surface.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(driver_surface.ORACLES)
