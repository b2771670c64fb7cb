"""Inverted-index build, storage layout, codec, and reader."""

from opensearch_spark.index.builder import IndexConfig, build_index  # noqa: F401
from opensearch_spark.index.reader import InvertedIndex  # noqa: F401
