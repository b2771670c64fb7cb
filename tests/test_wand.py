"""Block-max WAND pruning: rank-identity + pruning-rate invariants.

The pruned scorer must return the EXACT same top-k (ids and scores) as
the dense scorer — the safety proof in ``query/wand.py`` — while
skipping a meaningful fraction of block decodes for skewed terms.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opensearch_spark.query import wand

QUERIES = [
    {"match": {"text": "error handling"}},
    {"match": {"text": "timeout"}},
    {"match": {"text": "the"}},  # hot stopword-frequency term
    {"match": {"text": "the error timeout"}},
    {"term": {"text": "handling"}},
]


@pytest.mark.parametrize("qi", range(len(QUERIES)))
def test_pruned_rank_identical(engine, qi):
    q = QUERIES[qi]
    dense = engine.search(q, size=10).collect()
    pruned = engine.search(q, size=10, prune=True).collect()
    assert [(r["conv_id"], r["turn_idx"]) for r in dense] == [
        (r["conv_id"], r["turn_idx"]) for r in pruned
    ]
    for a, b in zip(dense, pruned):
        assert a["score"] == pytest.approx(b["score"], rel=1e-9)


def test_pruning_actually_prunes(engine):
    """On a skewed term mix the metadata pass must drop blocks."""
    out = wand.pruned_match_topk(engine, {"the": 1, "error": 1}, k=10)
    if "_pruned_frac" in out.columns:
        frac = out.select(F.max("_pruned_frac")).collect()[0][0]
        assert frac is not None and frac > 0.0, "no blocks pruned on a skewed query"


@pytest.mark.parametrize("qi", [0, 2, 3])
def test_distributed_prune_path_rank_identical(engine, monkeypatch, qi):
    """Force the no-driver-collect scale path (global-bound prune) and
    assert it is still rank-identical."""
    monkeypatch.setattr(wand, "MAX_DRIVER_META_BLOCKS", 0)
    q = QUERIES[qi]
    dense = engine.search(q, size=10).collect()
    pruned = engine.search(q, size=10, prune=True).collect()
    assert [(r["conv_id"], r["turn_idx"]) for r in dense] == [
        (r["conv_id"], r["turn_idx"]) for r in pruned
    ]
    for a, b in zip(dense, pruned):
        assert a["score"] == pytest.approx(b["score"], rel=1e-9)


def test_pruned_rare_term_fallback(engine):
    """Fewer hits than k -> dense fallback keeps correctness."""
    q = {"match": {"text": "naïve"}}
    dense = engine.search(q, size=10).collect()
    pruned = engine.search(q, size=10, prune=True).collect()
    assert [(r["conv_id"], r["turn_idx"]) for r in dense] == [
        (r["conv_id"], r["turn_idx"]) for r in pruned
    ]
