"""Query DSL, BM25 scoring, and the DataFrame-plan executor."""

from opensearch_spark.query import bm25, dsl  # noqa: F401
from opensearch_spark.query.executor import SearchEngine  # noqa: F401
