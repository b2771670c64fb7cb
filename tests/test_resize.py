"""Resize APIs (_clone/_shrink/_split, TransportResizeAction.java):
hardlink + metadata resizes must keep every query result identical —
scoring uses global stats, so segment routing can never change ranks.
"""

import os

import pytest

from opensearch_spark.index.reader import InvertedIndex
from opensearch_spark.index.resize import clone_index, shrink_index, split_index
from opensearch_spark.query.executor import SearchEngine

QUERY = {"match": {"text": "the error"}}


def _topk(engine, **kw):
    rows = engine.search(QUERY, size=10, **kw).collect()
    return [((r["conv_id"], r["turn_idx"]), round(r["score"], 6)) for r in rows]


@pytest.fixture(scope="module")
def source_topk(engine):
    return _topk(engine)


def test_clone_rank_identical(spark, index_dir, engine, source_topk, tmp_path):
    dst = str(tmp_path / "cloned")
    res = clone_index(spark, index_dir, dst)
    assert res["from_segments"] == res["to_segments"]
    assert res["files_linked"] > 0
    eng2 = SearchEngine(InvertedIndex(spark, dst))
    assert _topk(eng2) == source_topk


@pytest.mark.parametrize("target", [4, 2, 1])
def test_shrink_rank_identical(spark, index_dir, engine, source_topk, tmp_path, target):
    dst = str(tmp_path / f"shrunk{target}")
    res = shrink_index(spark, index_dir, dst, target)
    assert res["to_segments"] == target
    idx = InvertedIndex(spark, dst)
    assert idx.plan["n_segments"] == target
    assert _topk(SearchEngine(idx)) == source_topk


def test_split_rank_identical_and_wand(spark, index_dir, source_topk, tmp_path):
    dst = str(tmp_path / "split16")
    res = split_index(spark, index_dir, dst, 16)
    assert res["to_segments"] == 16
    eng2 = SearchEngine(InvertedIndex(spark, dst))
    assert _topk(eng2) == source_topk
    # the WAND pruned path reads block _seg metadata — must stay
    # rank-identical over the resized commit
    assert _topk(eng2, prune=True) == source_topk


def test_factor_validation(spark, index_dir, tmp_path):
    with pytest.raises(ValueError, match="factor"):
        shrink_index(spark, index_dir, str(tmp_path / "bad1"), 3)
    with pytest.raises(ValueError, match="multiple"):
        split_index(spark, index_dir, str(tmp_path / "bad2"), 12)
    with pytest.raises(ValueError, match="multiple"):
        split_index(spark, index_dir, str(tmp_path / "bad3"), 8)


def test_target_occupied(spark, index_dir, tmp_path):
    dst = str(tmp_path / "occupied")
    clone_index(spark, index_dir, dst)
    with pytest.raises(ValueError, match="already holds"):
        clone_index(spark, index_dir, dst)


def test_resize_is_independent_of_source(spark, index_dir, source_topk, tmp_path):
    # tombstones appended to the clone must not leak into the source:
    # new delete files are new inodes, hardlinks only share history
    from opensearch_spark.index.lifecycle import delete_by_query

    dst = str(tmp_path / "indep")
    clone_index(spark, index_dir, dst)
    eng2 = SearchEngine(InvertedIndex(spark, dst))
    top_id = source_topk[0][0]
    n = delete_by_query(
        eng2,
        {"bool": {"filter": [
            {"term": {"conv_id": top_id[0]}},
            {"term": {"turn_idx": top_id[1]}},
        ]}},
    )
    assert n == 1
    after = _topk(eng2)
    assert top_id not in [i for i, _ in after]
    # source unchanged (fresh engine avoids any cached frames)
    src_eng = SearchEngine(InvertedIndex(spark, index_dir))
    assert _topk(src_eng) == source_topk


def test_resize_refuses_incremental(spark, index_dir, tmp_path):
    import json

    dst = str(tmp_path / "fake_incremental")
    clone_index(spark, index_dir, dst)
    plan_path = os.path.join(dst, "plan.json")
    with open(plan_path) as f:
        plan = json.load(f)
    plan["incremental"] = True
    with open(plan_path, "w") as f:
        json.dump(plan, f)
    with pytest.raises(ValueError, match="incremental"):
        shrink_index(spark, dst, str(tmp_path / "bad4"), 4)
