"""Index aliases (AliasMetadata.java / IndicesAliasesRequest.java) and
the _validate/query entry point (TransportValidateQueryAction)."""

from __future__ import annotations

import pandas as pd
import pytest

from opensearch_spark.aliases import AliasRegistry
from opensearch_spark.index.builder import IndexConfig, build_index
from opensearch_spark.index.reader import InvertedIndex
from opensearch_spark.query.executor import SearchEngine


def _build(spark, path, rows):
    pdf = pd.DataFrame(
        {
            "conv_id": [r[0] for r in rows],
            "turn_idx": [r[1] for r in rows],
            "role": [r[2] for r in rows],
            "text": [r[3] for r in rows],
        }
    )
    build_index(spark, spark.createDataFrame(pdf), path, IndexConfig(n_segments=2))
    return path


def test_alias_fanout_and_filter(spark, tmp_path):
    a = _build(spark, str(tmp_path / "ia"), [
        ("a1", 0, "user", "alpha error handling"),
        ("a2", 0, "tool", "alpha error retry"),
    ])
    b = _build(spark, str(tmp_path / "ib"), [
        ("b1", 0, "user", "beta error handling"),
    ])
    reg = AliasRegistry(spark, str(tmp_path / "aliases.json"))
    reg.add("logs", a, filter={"term": {"role": "user"}}, is_write_index=True)
    reg.add("logs", b)

    hits = reg.search("logs", {"match": {"text": "error"}}, size=10).collect()
    ids = sorted(r["conv_id"] for r in hits)
    # a2 is excluded by the alias filter on index a; b has no filter
    assert ids == ["a1", "b1"]
    assert reg.write_index("logs") == a

    # registry persists (cluster-state analog)
    reg2 = AliasRegistry(spark, str(tmp_path / "aliases.json"))
    assert [e["index"] for e in reg2.resolve("logs")] == [a, b]
    reg2.remove("logs", b)
    assert [e["index"] for e in reg2.resolve("logs")] == [a]
    reg2.remove("logs", a)
    with pytest.raises(KeyError):
        reg2.resolve("logs")


def test_validate_query(spark, tmp_path):
    idx = _build(spark, str(tmp_path / "iv"), [("c", 0, "user", "hello world")])
    eng = SearchEngine(InvertedIndex(spark, idx))
    ok = eng.validate({"match": {"text": "hello"}}, explain=True)
    assert ok["valid"] is True and "hello" in ok["explanation"]
    bad = eng.validate({"no_such_query": {"x": 1}})
    assert bad["valid"] is False and "no_such_query" in bad["error"]
    # a parse-able query over a missing field is invalid too
    missing = eng.validate({"term": {"nope_field": "x"}})
    assert missing["valid"] is False


def test_profile(spark, tmp_path):
    idx = _build(spark, str(tmp_path / "ip"), [
        ("c", 0, "user", "hello world"), ("d", 0, "user", "hello there"),
    ])
    eng = SearchEngine(InvertedIndex(spark, idx))
    p = eng.profile({"match": {"text": "hello"}}, size=5)
    assert p["hits"] == 2
    assert set(p["breakdown_ms"]) == {"parse_rewrite", "build_plan", "execute"}
    assert p["took_ms"] >= p["breakdown_ms"]["execute"]
    assert "hello" in p["query"]


def test_search_pipeline(spark, tmp_path):
    """modules/search-pipeline-common: filter_query + oversample request
    processors; collapse + truncate_hits + rename_field response
    processors (one class each in SearchPipelineCommonModulePlugin.java)."""
    from opensearch_spark.query.searchpipeline import SearchPipeline

    idx = _build(spark, str(tmp_path / "isp"), [
        ("c1", 0, "user", "error handling path"),
        ("c1", 1, "tool", "error handling again"),
        ("c2", 0, "user", "error retry"),
        ("c3", 0, "tool", "nothing here"),
    ])
    eng = SearchEngine(InvertedIndex(spark, idx))
    pipe = SearchPipeline.from_spec({
        "request_processors": [
            {"filter_query": {"query": {"term": {"role": "user"}}}},
            {"oversample": {"sample_factor": 3}},
        ],
        "response_processors": [
            {"collapse": {"field": "conv_id"}},
            {"truncate_hits": {}},          # back to the original size
            {"rename_field": {"field": "score", "target_field": "_score"}},
        ],
    })
    rows = pipe.run(eng, {"match": {"text": "error"}}, size=2,
                    source_cols=["conv_id", "turn_idx", "role"]).collect()
    # tool turns filtered out; one best hit per conv; truncated to 2
    assert len(rows) <= 2
    assert all(r["role"] == "user" for r in rows)
    assert len({r["conv_id"] for r in rows}) == len(rows)
    assert "_score" in rows[0].asDict()

    import pytest as _pt
    with _pt.raises(ValueError):
        SearchPipeline.from_spec({"request_processors": [{"nope": {}}]})


def test_search_pipeline_script_processor(spark, engine):
    # ScriptRequestProcessor.java analog: restricted arithmetic over
    # request attributes, driver-side, no eval
    from opensearch_spark.query.searchpipeline import (
        SearchPipeline,
        _eval_request_script,
    )

    pipe = SearchPipeline.from_spec(
        {"request_processors": [{"script": {"source": "size = size * 2 + 1"}}]}
    )
    rows = pipe.run(engine, {"match": {"text": "the"}}, size=3).collect()
    assert len(rows) == 7
    assert _eval_request_script("size = size // 2", {"size": 9, "from": 0})["size"] == 4
    import pytest as _pt

    with _pt.raises(ValueError, match="single assignment"):
        _eval_request_script("size = 1; size = 2", {"size": 1, "from": 0})
    with _pt.raises(ValueError, match="may only assign"):
        _eval_request_script("query = 0", {"size": 1, "from": 0})
    with _pt.raises(ValueError, match="unsupported"):
        _eval_request_script("size = __import__('os')", {"size": 1, "from": 0})


def test_script_processor_from_keyword_and_clamp(spark, engine):
    from opensearch_spark.query.searchpipeline import (
        SearchPipeline,
        _eval_request_script,
    )
    import pytest as _pt

    # 'from' is a Python keyword: unparsable, but still the promised
    # ValueError (not SyntaxError)
    with _pt.raises(ValueError, match="unparsable"):
        _eval_request_script("from = from + 10", {"size": 5})
    # negative result clamps to 0 hits instead of crashing the search
    pipe = SearchPipeline.from_spec(
        {"request_processors": [{"script": {"source": "size = size - 100"}}]}
    )
    assert pipe.run(engine, {"match": {"text": "the"}}, size=3).collect() == []
