"""Dynamic mapping inference (index/mapping.py) vs the reference's
DocumentParser.createBuilderFromDynamicValue semantics
(DocumentParser.java:711-829, :534-566, :228-246)."""

import json

import pytest
from pyspark.sql import functions as F

from opensearch_spark.index import mapping as M


# ------------------------------------------------------------ scalar rules


def test_scalar_inference_reference_table():
    # DocumentParser.java:783-801: int-family -> long, float-family ->
    # float; :803-806 boolean; :716-781 strings
    assert M._infer_scalar(3) == {"type": "long"}
    assert M._infer_scalar(3.5) == {"type": "float"}
    assert M._infer_scalar(True) == {"type": "boolean"}
    assert M._infer_scalar(None) is None
    t = M._infer_scalar("hello world")
    assert t["type"] == "text"
    assert t["fields"]["keyword"] == {"type": "keyword", "ignore_above": 256}


def test_string_numeric_detection_off_by_default():
    # numeric_detection defaults OFF (RootObjectMapper) -> "42" is text
    assert M._infer_scalar("42")["type"] == "text"
    assert M._infer_scalar("42", numeric_detection=True) == {"type": "long"}
    assert M._infer_scalar("4.25", numeric_detection=True) == {"type": "float"}


def test_date_detection_formats_and_pure_number_refusal():
    # DocumentParser.java:747-751 — refuse pure numbers as dates
    assert M._infer_scalar("2024")["type"] == "text"
    d = M._infer_scalar("2024-03-05")
    assert d == {"type": "date", "format": "strict_date_optional_time"}
    assert M._infer_scalar("2024-03-05T10:11:12.5Z")["type"] == "date"
    assert M._infer_scalar("2024/03/05") == {"type": "date", "format": "yyyy/MM/dd"}
    assert (
        M._infer_scalar("2024/03/05 10:11:12")["format"] == "yyyy/MM/dd HH:mm:ss"
    )
    # detection off -> text
    assert M._infer_scalar("2024-03-05", date_detection=False)["type"] == "text"
    # non-date strings stay text
    assert M._infer_scalar("2024-13-99x")["type"] == "text"


# ------------------------------------------------------------ union lattice


def test_union_lattice():
    j = lambda a, b: M._join_specs({"type": a}, {"type": b}, "f")["type"]
    assert j("long", "float") == "float"
    assert j("float", "long") == "float"
    assert j("long", "text") == "text"
    assert j("date", "text") == "text"
    assert j("boolean", "text") == "text"
    for a, b in [("boolean", "long"), ("date", "long"), ("boolean", "date")]:
        with pytest.raises(M.MappingConflictError):
            j(a, b)


def test_object_scalar_conflict_and_object_merge():
    o = {"type": "object", "properties": {"a": {"type": "long"}}}
    with pytest.raises(M.MappingConflictError):
        M._join_specs(o, {"type": "long"}, "f")
    o2 = {"type": "object", "properties": {"a": {"type": "float"},
                                           "b": {"type": "boolean"}}}
    out = M._join_specs(o, o2, "f")
    assert out["properties"]["a"]["type"] == "float"
    assert out["properties"]["b"]["type"] == "boolean"


def test_date_format_union():
    a = {"type": "date", "format": "strict_date_optional_time"}
    b = {"type": "date", "format": "yyyy/MM/dd"}
    assert M._join_specs(a, b, "f")["format"] == (
        "strict_date_optional_time||yyyy/MM/dd"
    )


# ------------------------------------------------------------ per-doc walk


def test_infer_doc_nested_arrays_nulls():
    props = M.infer_doc(
        {
            "n": 7,
            "x": 1.25,
            "ok": False,
            "ts": "2024-01-02",
            "note": "free text",
            "gone": None,
            "tags": ["a", "b"],
            "nums": [1, 2.5],
            "meta": {"k": "v", "depth": {"z": 9}},
            "objs": [{"u": 1}, {"w": "s"}],
        }
    )
    assert props["n"] == {"type": "long"}
    assert props["x"] == {"type": "float"}
    assert props["ok"] == {"type": "boolean"}
    assert props["ts"]["type"] == "date"
    assert props["note"]["type"] == "text"
    assert "gone" not in props  # null never creates a mapping
    assert props["tags"]["type"] == "text" and props["tags"]["_array"]
    assert props["nums"] == {"type": "float", "_array": True}  # long∪float
    assert props["meta"]["type"] == "object"
    assert props["meta"]["properties"]["depth"]["properties"]["z"]["type"] == "long"
    op = props["objs"]
    assert op["_array"] and op["properties"]["u"]["type"] == "long"
    assert op["properties"]["w"]["type"] == "text"


# ------------------------------------------------------------ dynamic modes


def _m(dynamic):
    return M.Mappings({"known": {"type": "long"}}, dynamic)


def test_dynamic_true_false_strict():
    new = {"known": {"type": "long"}, "fresh": {"type": "boolean"}}
    assert "fresh" in _m("true").merge(new).properties
    # false: new path dropped, known kept
    f = _m("false").merge(new)
    assert "fresh" not in f.properties and "known" in f.properties
    with pytest.raises(M.StrictDynamicMappingError):
        _m("strict").merge(new)
    # strict with only known paths is fine
    assert _m("strict").merge({"known": {"type": "long"}}).properties


def test_merge_type_change_rejected():
    with pytest.raises(M.MappingConflictError):
        _m("true").merge({"known": {"type": "boolean"}})


# ------------------------------------------------------------ views


def test_to_dict_strips_internal_and_flat_paths():
    props = M.infer_doc({"a": [1], "o": {"b": "x"}})
    mm = M.Mappings(props)
    d = mm.to_dict()
    assert "_array" not in json.dumps(d)
    assert d["properties"]["a"] == {"type": "long"}
    flat = mm.flat()
    assert flat["o.b"]["type"] == "text"
    assert "o" not in flat


def test_spark_schema_types():
    mm = M.Mappings(
        M.infer_doc({"n": 1, "x": 1.5, "b": True, "ts": "2024-01-01",
                     "s": "t", "arr": [1], "o": {"k": "v"}})
    )
    sch = mm.spark_schema()
    by = {f.name: f.dataType.simpleString() for f in sch.fields}
    assert by == {
        "n": "bigint", "x": "double", "b": "boolean", "ts": "string",
        "s": "string", "arr": "array<bigint>", "o": "struct<k:string>",
    }


# ------------------------------------------------------------ distributed


@pytest.fixture(scope="module")
def jdocs(spark):
    rows = []
    for i in range(200):
        d = {"doc_id": i, "text": f"alpha beta doc {i}", "n": i}
        if i % 17 == 3:
            d["num"] = i + 0.5  # forces float by widening
        else:
            d["num"] = i
        if i % 5 == 0:
            d["extra"] = "only sometimes"
        d["flag"] = i % 3 == 0
        d["ts"] = f"2024-01-{(i % 28) + 1:02d}"
        d["meta"] = {"k": f"v{i % 4}"}
        rows.append((json.dumps(d),))
    return spark.createDataFrame(rows, "j string")


def test_infer_mappings_distributed_matches_local(spark, jdocs):
    mm = M.infer_mappings(jdocs, json_col="j")
    # local re-derivation over the same docs
    acc = {}
    for r in jdocs.collect():
        acc = M.merge_properties(acc, M.infer_doc(json.loads(r["j"])))
    assert mm.to_dict() == M.Mappings(acc).to_dict()
    flat = mm.flat()
    assert flat["doc_id"]["type"] == "long"
    assert flat["num"]["type"] == "float"      # widened by i%17==3 docs
    assert flat["extra"]["type"] == "text"     # present in some docs only
    assert flat["flag"]["type"] == "boolean"
    assert flat["ts"]["type"] == "date"
    assert flat["meta.k"]["type"] == "text"


def test_infer_partition_order_independent(spark, jdocs):
    a = M.infer_mappings(jdocs.repartition(13), json_col="j").to_dict()
    b = M.infer_mappings(jdocs.coalesce(1), json_col="j").to_dict()
    assert a == b


# ------------------------------------------------------------ end-to-end


def test_create_from_json_typed_queries(spark, jdocs, tmp_path):
    from opensearch_spark.index.reader import InvertedIndex
    from opensearch_spark.query.executor import SearchEngine
    from opensearch_spark.index.builder import IndexConfig

    d = str(tmp_path / "jsonidx")
    _, mm = M.create_index_from_json(
        spark, jdocs, d, json_col="j", id_fields=("doc_id",),
        config=IndexConfig(n_segments=2, dictionary_partitions=1),
    )
    assert mm.flat()["text"]["type"] == "text"
    eng = SearchEngine(InvertedIndex(spark, d))
    # typed range over the INFERRED long field
    hits = eng.search(
        {"bool": {"filter": [{"range": {"n": {"gte": 190}}}],
                  "must": [{"match": {"text": "alpha"}}]}},
        size=100,
    ).collect()
    assert sorted(r["doc_id"] for r in hits) == list(range(190, 200))
    # term over the inferred boolean field
    cnt = eng.search(
        {"bool": {"filter": [{"term": {"flag": True}}],
                  "must": [{"match": {"text": "alpha"}}]}},
        size=1000,
    ).count()
    assert cnt == len([i for i in range(200) if i % 3 == 0])
    # date range over the inferred (converted) timestamp field
    dr = eng.search(
        {"bool": {"filter": [{"range": {"ts": {"gte": "2024-01-27"}}}],
                  "must": [{"match": {"text": "alpha"}}]}},
        size=1000,
    ).count()
    assert dr == len([i for i in range(200) if (i % 28) + 1 >= 27])
    # GET _mapping round-trips
    got = M.get_mapping(d)
    assert got == mm.to_dict()


def test_append_strict_and_false_modes(spark, tmp_path):
    base = [(json.dumps({"doc_id": i, "text": f"t {i}", "n": i}),)
            for i in range(10)]
    extra = [(json.dumps({"doc_id": 99, "text": "t 99", "n": 99,
                          "rogue": "x"}),)]
    bdf = spark.createDataFrame(base, "j string")
    edf = spark.createDataFrame(extra, "j string")
    mm = M.infer_mappings(bdf, json_col="j")
    # strict: the appended batch introduces `rogue` -> rejected
    with pytest.raises(M.StrictDynamicMappingError):
        M.Mappings(mm.properties, "strict").merge(
            M.infer_mappings(edf, json_col="j").properties
        )
    # false: rogue dropped from mapping AND from the typed frame
    m2 = M.Mappings(mm.properties, "false").merge(
        M.infer_mappings(edf, json_col="j").properties
    )
    assert "rogue" not in m2.properties
    typed = M.typed_frame(edf, m2, json_col="j")
    assert "rogue" not in typed.columns
    # ...but it survives verbatim in _source
    assert json.loads(typed.collect()[0]["_source"])["rogue"] == "x"


# ----------------------- scaled_float (mapper-extras, r5) -----------------


def test_scaled_float_index_and_query(spark, tmp_path):
    """ScaledFloatFieldMapper parity: values store as round(v*factor)
    longs, term/terms/range queries scale their operands (quantization
    makes 3.004 and 2.996 equal under factor 100), docvalue fetch
    decodes back, and the dynamic pass's inferred float/long merges
    INTO an explicit scaled_float without conflict."""
    import json as _json

    from opensearch_spark.index.mapping import (
        Mappings,
        create_index_from_json,
    )
    from opensearch_spark.query.executor import SearchEngine
    from opensearch_spark.index.reader import InvertedIndex

    docs = [
        {"doc_id": 1, "text": "alpha row", "price": 3.004},
        {"doc_id": 2, "text": "beta row", "price": 2.996},
        {"doc_id": 3, "text": "gamma row", "price": 3.06},
        {"doc_id": 4, "text": "delta row", "price": 10},
    ]
    df = spark.createDataFrame(
        [(_json.dumps(d),) for d in docs], "_source string"
    )
    explicit = Mappings(
        {"price": {"type": "scaled_float", "scaling_factor": 100.0}}
    )
    d = str(tmp_path / "sfidx")
    _, merged = create_index_from_json(
        spark, df, d, id_fields=("doc_id",), mappings=explicit
    )
    assert merged.flat()["price"]["type"] == "scaled_float"
    assert merged.scaled_fields() == {"price": 100.0}

    eng = SearchEngine(InvertedIndex(spark, d))
    ids = lambda rows: sorted(r["doc_id"] for r in rows)

    # term 3.0: round(3.004*100)=300 == round(2.996*100), so BOTH match
    got = eng.search({"term": {"price": 3.0}}, size=10).collect()
    assert ids(got) == [1, 2]
    # terms scale each operand
    got = eng.search({"terms": {"price": [3.0, 10.0]}}, size=10).collect()
    assert ids(got) == [1, 2, 4]
    # range gt 3.0 -> lo = ceil(nextUp(300.0)) = 301 -> only 306, 1000
    got = eng.search(
        {"bool": {"filter": [{"range": {"price": {"gt": 3.0}}}]}}, size=10
    ).collect()
    assert ids(got) == [3, 4]
    # lte 3.0 -> hi = floor(300.0) = 300
    got = eng.search(
        {"bool": {"filter": [{"range": {"price": {"lte": 3.0}}}]}}, size=10
    ).collect()
    assert ids(got) == [1, 2]
    # docvalue fetch decodes scaled/factor
    got = eng.search(
        {"term": {"price": 3.06}}, size=10,
        docvalue_fields={"price": None},
    ).collect()
    assert [r["price"] for r in got] == [3.06]


# ----------------------- flat_object (r5) ---------------------------------


def test_flat_object_term_exists(spark, tmp_path):
    """flat_object analog (FlatObjectFieldMapper: leaf paths+values as
    terms): a MapType docmap column answers term/terms/exists on
    `field.dotted.path` and bare `field` (any leaf value)."""
    from opensearch_spark.index.builder import IndexConfig, build_index
    from opensearch_spark.index.reader import InvertedIndex
    from opensearch_spark.query.executor import SearchEngine

    rows = [
        (1, "alpha doc", {"issue.labels": "bug", "issue.priority": "high"}),
        (2, "beta doc", {"issue.labels": "feature"}),
        (3, "gamma doc", {"other": "bug"}),
        (4, "delta doc", {}),
        (5, "epsilon doc", None),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, attrs map<string,string>"
    )
    d = str(tmp_path / "foidx")
    build_index(spark, df, d,
                IndexConfig(n_segments=1, id_cols=("doc_id",),
                            dictionary_partitions=1))
    eng = SearchEngine(InvertedIndex(spark, d))
    ids = lambda q: sorted(
        r["doc_id"] for r in eng.search(q, size=10).collect()
    )

    assert ids({"term": {"attrs.issue.labels": "bug"}}) == [1]
    assert ids({"terms": {"attrs.issue.labels": ["bug", "feature"]}}) == [1, 2]
    # bare field: any leaf VALUE matches
    assert ids({"term": {"attrs": "bug"}}) == [1, 3]
    assert ids({"bool": {"filter": [{"exists": {"field": "attrs.issue.priority"}}]}}) == [1]
    # bare exists: any key present
    assert ids({"bool": {"filter": [{"exists": {"field": "attrs"}}]}}) == [1, 2, 3]
    # miss path
    assert ids({"term": {"attrs.issue.nope": "bug"}}) == []


# ----------------------- constant_keyword (r5) ----------------------------


def test_constant_keyword(spark, tmp_path):
    """ConstantKeywordFieldMapper: queries resolve at plan time against
    the mapping constant (term/terms/prefix/wildcard via the
    '*'-glob simpleMatch, exists always true); a doc carrying a
    DIFFERENT value is rejected at build."""
    import json as _json

    import pytest as _pt

    from opensearch_spark.index.mapping import (
        Mappings, create_index_from_json,
    )
    from opensearch_spark.index.reader import InvertedIndex
    from opensearch_spark.query.executor import SearchEngine

    docs = [
        {"doc_id": 1, "text": "alpha row", "env": "prod"},
        {"doc_id": 2, "text": "beta row"},          # absent -> constant
    ]
    df = spark.createDataFrame(
        [(_json.dumps(d),) for d in docs], "_source string"
    )
    d = str(tmp_path / "ckidx")
    create_index_from_json(
        spark, df, d, id_fields=("doc_id",),
        mappings=Mappings(
            {"env": {"type": "constant_keyword", "value": "prod"}}
        ),
    )
    eng = SearchEngine(InvertedIndex(spark, d))
    ids = lambda q: sorted(
        r["doc_id"] for r in eng.search(q, size=10).collect()
    )
    assert ids({"term": {"env": "prod"}}) == [1, 2]     # match ALL
    assert ids({"term": {"env": "dev"}}) == []          # match NONE
    assert ids({"terms": {"env": ["dev", "pr*"]}}) == [1, 2]  # glob
    assert ids({"prefix": {"env": "pro"}}) == [1, 2]
    assert ids({"wildcard": {"env": "p*d"}}) == [1, 2]
    assert ids({"bool": {"filter": [{"exists": {"field": "env"}}]}}) == [1, 2]

    # plan-time resolution: the predicate is a literal, no column read
    from opensearch_spark.query import dsl as Q
    pred = eng._predicate(Q.Term(field="env", value="prod"))
    assert "true" in pred._jc.toString().lower()

    # mismatching value rejected at build
    bad = spark.createDataFrame(
        [(_json.dumps({"doc_id": 3, "text": "x", "env": "dev"}),)],
        "_source string",
    )
    with _pt.raises(Exception, match="constant keyword"):
        create_index_from_json(
            spark, bad, str(tmp_path / "ckbad"), id_fields=("doc_id",),
            mappings=Mappings(
                {"env": {"type": "constant_keyword", "value": "prod"}}
            ),
        )


# ----------------------- ip field (r5) ------------------------------------


def test_ip_field_term_cidr_range(spark, tmp_path):
    """IpFieldMapper parity: values canonicalize to the v6-mapped form
    whose order equals address order — term (exact + CIDR), range, and
    docvalue decode; IPv4 and IPv6 coexist without interleaving."""
    import json as _json

    from opensearch_spark.index.mapping import (
        Mappings, create_index_from_json,
    )
    from opensearch_spark.index.reader import InvertedIndex
    from opensearch_spark.query.executor import SearchEngine

    docs = [
        {"doc_id": 1, "text": "a row", "addr": "10.0.0.5"},
        {"doc_id": 2, "text": "b row", "addr": "10.0.3.200"},
        {"doc_id": 3, "text": "c row", "addr": "10.1.0.1"},
        {"doc_id": 4, "text": "d row", "addr": "192.168.1.9"},
        {"doc_id": 5, "text": "e row", "addr": "2001:db8::1"},
        {"doc_id": 6, "text": "f row"},
    ]
    df = spark.createDataFrame(
        [(_json.dumps(d),) for d in docs], "_source string"
    )
    d = str(tmp_path / "ipidx")
    create_index_from_json(
        spark, df, d, id_fields=("doc_id",),
        mappings=Mappings({"addr": {"type": "ip"}}),
    )
    eng = SearchEngine(InvertedIndex(spark, d))
    ids = lambda q: sorted(
        r["doc_id"] for r in eng.search(q, size=10).collect()
    )

    assert ids({"term": {"addr": "10.0.3.200"}}) == [2]
    # CIDR in a term (InetAddressPoint.newPrefixQuery)
    assert ids({"term": {"addr": "10.0.0.0/16"}}) == [1, 2]
    assert ids({"term": {"addr": "10.0.0.0/8"}}) == [1, 2, 3]
    assert ids({"terms": {"addr": ["192.168.0.0/16", "2001:db8::/32"]}}) == [4, 5]
    assert ids({"bool": {"filter": [
        {"range": {"addr": {"gte": "10.0.3.0", "lt": "10.2.0.0"}}}
    ]}}) == [2, 3]
    # v6 upper region excludes every v4-mapped doc
    assert ids({"bool": {"filter": [
        {"range": {"addr": {"gte": "::1:0:0:0"}}}
    ]}}) == [5]
    assert ids({"bool": {"filter": [{"exists": {"field": "addr"}}]}}) == [1, 2, 3, 4, 5]
    # docvalue decode returns the textual address
    got = eng.search({"term": {"addr": "2001:db8::1"}}, size=10,
                     docvalue_fields={"addr": None}).collect()
    assert [r["addr"] for r in got] == ["2001:db8::1"]
    got4 = eng.search({"term": {"addr": "10.0.0.5"}}, size=10,
                      docvalue_fields={"addr": None}).collect()
    assert [r["addr"] for r in got4] == ["10.0.0.5"]


# ------------------ match_only_text / wildcard types (r5) -----------------


def test_match_only_text_scores_idf_sum(spark, tmp_path):
    """match_only_text (MatchOnlyTextFieldMapper): DOCS-only indexing
    means freq=1 and no norms, so BM25's tf part collapses and a
    matched term contributes exactly its idf — scores are
    length-independent and repeat-count-independent."""
    import json as _json

    from opensearch_spark.index.mapping import (
        Mappings, create_index_from_json,
    )
    from opensearch_spark.index.reader import InvertedIndex
    from opensearch_spark.query.executor import SearchEngine

    docs = [
        {"doc_id": 1, "text": "spark spark spark spark"},     # tf=4
        {"doc_id": 2, "text": "spark"},                        # tf=1, short
        {"doc_id": 3, "text": "spark plus many other words here now"},
        {"doc_id": 4, "text": "nothing relevant"},
    ]
    df = spark.createDataFrame(
        [(_json.dumps(d),) for d in docs], "_source string"
    )
    d = str(tmp_path / "motidx")
    create_index_from_json(
        spark, df, d, id_fields=("doc_id",),
        mappings=Mappings({"text": {"type": "match_only_text"}}),
    )
    eng = SearchEngine(InvertedIndex(spark, d))
    assert eng.similarity.name == "match_only"
    rows = eng.search({"match": {"text": "spark"}}, size=10).collect()
    scores = {r["doc_id"]: r["score"] for r in rows}
    assert set(scores) == {1, 2, 3}
    # tf and length have NO effect: all three scores identical
    assert len({round(s, 6) for s in scores.values()}) == 1


def test_wildcard_type_keyword_semantics(spark, tmp_path):
    import json as _json

    from opensearch_spark.index.mapping import (
        Mappings, create_index_from_json,
    )
    from opensearch_spark.index.reader import InvertedIndex
    from opensearch_spark.query.executor import SearchEngine

    docs = [
        {"doc_id": 1, "text": "a row", "path": "/var/log/app.log"},
        {"doc_id": 2, "text": "b row", "path": "/var/log/db.err"},
        {"doc_id": 3, "text": "c row", "path": "/home/user/x.log"},
    ]
    df = spark.createDataFrame(
        [(_json.dumps(d),) for d in docs], "_source string"
    )
    d = str(tmp_path / "wcidx")
    create_index_from_json(
        spark, df, d, id_fields=("doc_id",),
        mappings=Mappings({"path": {"type": "wildcard"}}),
    )
    eng = SearchEngine(InvertedIndex(spark, d))
    ids = lambda q: sorted(
        r["doc_id"] for r in eng.search(q, size=10).collect()
    )
    assert ids({"wildcard": {"path": "/var/log/*.log"}}) == [1]
    assert ids({"wildcard": {"path": "*.log"}}) == [1, 3]
    assert ids({"prefix": {"path": "/var"}}) == [1, 2]
    assert ids({"term": {"path": "/home/user/x.log"}}) == [3]


def test_ip_range_agg_over_mapped_hex(spark):
    """ip_range agg consumes BOTH dotted-quad columns and the 32-hex
    canonical storage an explicit ip mapping writes (r5): same buckets
    either way; true IPv6 rows fall out of the v4 arithmetic."""
    from opensearch_spark import aggs
    from opensearch_spark.index.mapping import ip_canonical_hex

    ips = ["10.0.0.5", "10.0.3.200", "10.1.0.1", "192.168.1.9"]
    dotted = spark.createDataFrame([(s,) for s in ips], "addr string")
    hexed = spark.createDataFrame(
        [(ip_canonical_hex(s),) for s in ips + ["2001:db8::1"]],
        "addr string",
    )
    ranges = [(None, "10.1.0.0"), ("10.1.0.0", None)]
    a = {r["key"]: r["doc_count"]
         for r in aggs.ip_range_agg(dotted, "addr", ranges).collect()}
    b = {r["key"]: r["doc_count"]
         for r in aggs.ip_range_agg(hexed, "addr", ranges).collect()}
    assert a == b == {"*-10.1.0.0": 2, "10.1.0.0-*": 2}
