"""Segment merge / compaction invariants (opensearch_spark.index.merge).

The merged index must be a pure re-layout: identical search results,
identical dictionary stats, densely packed blocks, term-clustered files.
Mirrors the reference's merge-policy contract — merging never changes
query semantics (``OpenSearchTieredMergePolicy.java:50-56``).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from opensearch_spark.index.merge import merge_index
from opensearch_spark.index.reader import InvertedIndex
from opensearch_spark.query.executor import SearchEngine

QUERIES = [
    {"match": {"text": "error handling"}},
    {"match": {"text": {"query": "error handling", "operator": "and"}}},
    {"term": {"text": "timeout"}},
    {"match_phrase": {"text": "error handling"}},
    {"match": {"text": "the"}},  # hot stopword-frequency term
    {
        "bool": {
            "must": [{"match": {"text": "error"}}],
            "must_not": [{"term": {"role": "tool"}}],
        }
    },
]


@pytest.fixture(scope="module")
def merged_dir(spark, index_dir, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("merged") / "idx")
    # tiny hot threshold so common terms exercise the salted path
    metrics = merge_index(spark, index_dir, d, hot_blocks=2, doc_window_blocks=4)
    assert metrics["blocks_out"] <= metrics["blocks_in"]
    return d


@pytest.fixture(scope="module")
def merged_engine(spark, merged_dir):
    return SearchEngine(InvertedIndex(spark, merged_dir))


@pytest.mark.parametrize("qi", range(len(QUERIES)))
def test_merge_preserves_results(engine, merged_engine, qi):
    q = QUERIES[qi]
    a = engine.search(q, size=10).collect()
    b = merged_engine.search(q, size=10).collect()
    assert [(r["conv_id"], r["turn_idx"]) for r in a] == [
        (r["conv_id"], r["turn_idx"]) for r in b
    ]
    for ra, rb in zip(a, b):
        assert ra["score"] == pytest.approx(rb["score"], rel=1e-9)


def test_merge_preserves_dictionary(spark, index_dir, merged_dir):
    src = InvertedIndex(spark, index_dir).dictionary().select("term", "df", "total_tf")
    dst = InvertedIndex(spark, merged_dir).dictionary().select("term", "df", "total_tf")
    assert src.exceptAll(dst).count() == 0
    assert dst.exceptAll(src).count() == 0


def test_merge_packs_blocks(spark, index_dir, merged_dir):
    """After compaction every non-final block of a (term, salt) run is
    full (block_size docs) — the dense-packing invariant."""
    idx = InvertedIndex(spark, merged_dir)
    block_size = idx.plan["block_size"]
    post = idx.postings()
    # per (term, salt-run): at most one block below block_size
    runs = (
        post.withColumn("salt", (F.col("block_id") / (1 << 20)).cast("long"))
        .groupBy("term", "salt")
        .agg(
            F.count(F.lit(1)).alias("blocks"),
            F.sum((F.col("n_docs") < block_size).cast("int")).alias("partial"),
        )
    )
    bad = runs.filter(F.col("partial") > 1).count()
    assert bad == 0


def test_merge_decodes_roundtrip(spark, index_dir, merged_dir):
    """Total postings per term agree doc-by-doc between src and dst."""
    src = InvertedIndex(spark, index_dir)
    dst = InvertedIndex(spark, merged_dir)
    terms = ["error", "the", "timeout"]
    a = (
        src.postings_for_terms(terms)
        .orderBy("term", "_docid")
        .select("term", "_docid", "tf", "norm_byte")
        .collect()
    )
    b = (
        dst.postings_for_terms(terms)
        .orderBy("term", "_docid")
        .select("term", "_docid", "tf", "norm_byte")
        .collect()
    )
    assert a == b


def test_merge_positions_roundtrip(spark, index_dir, merged_dir):
    src = InvertedIndex(spark, index_dir)
    dst = InvertedIndex(spark, merged_dir)
    a = (
        src.postings_for_terms(["error"], with_positions=True)
        .orderBy("_docid")
        .select("_docid", "positions")
        .collect()
    )
    b = (
        dst.postings_for_terms(["error"], with_positions=True)
        .orderBy("_docid")
        .select("_docid", "positions")
        .collect()
    )
    assert a == b
