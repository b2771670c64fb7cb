"""Plan-quality gates: the physical plans must keep the properties the
100 TB design depends on — predicate pushdown into the Parquet scans,
column pruning (binary posting columns unread for metadata passes),
broadcast of the tiny per-term stats, and no full-corpus scan for a
term-filtered query.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def test_postings_term_filter_pushdown(engine):
    """The term filter must reach the Parquet scan (PushedFilters), so a
    query reads only matching row groups."""
    blocks = engine.index.postings().filter(F.col("term").isin(["error", "timeout"]))
    plan = _formatted(blocks)
    assert "PushedFilters" in plan
    assert "In(term" in plan.replace(" ", "") or "In(term," in plan


def test_metadata_pass_prunes_binary_columns(engine):
    """WAND's bounds pass must not read the packed binary columns."""
    meta = (
        engine.index.postings()
        .filter(F.col("term") == "error")
        .select("term", "block_id", "base_doc", "max_tf", "min_norm")
    )
    plan = _formatted(meta)
    schema_line = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert schema_line, plan
    rs = schema_line[0]
    for col in ("docs_bin", "tfs_bin", "norms_bin", "pos_bin"):
        assert col not in rs, f"{col} read in metadata-only pass:\n{rs}"


def test_docmap_filter_pushdown(engine):
    dm = engine.index.docmap().filter(F.col("role") == "user").select("_docid")
    plan = _formatted(dm)
    # cached (InMemoryRelation) or raw scan: either must not read text
    if "ReadSchema" in plan:
        rs = [l for l in plan.splitlines() if "ReadSchema" in l][0]
        assert "text" not in rs


def test_term_stats_inline_small_broadcast_large(engine):
    """Per-term stats (idf/df/ttf) are plan-time literals: small queries
    inline them as CASE expressions — NO broadcast exchange, so scoring
    is one job, not two (r3 job-count cut).  Large expansion sets
    (wildcard/fuzzy) keep the broadcast join: a 10k-branch CASE would
    blow up codegen."""
    from pyspark.sql import functions as F

    from opensearch_spark.query import dsl as Q
    from opensearch_spark.query.executor import INLINE_STATS_MAX_TERMS

    scored = engine._score(Q.Match("text", "error handling"))
    plan = _formatted(scored)
    assert "BroadcastExchange" not in plan, plan
    assert "CASE WHEN" in plan

    terms = [
        r["term"]
        for r in engine.index.dictionary()
        .select("term")
        .limit(INLINE_STATS_MAX_TERMS + 8)
        .collect()
    ]
    assert len(terms) > INLINE_STATS_MAX_TERMS
    big = engine._score_terms_or({t: 1 for t in terms}, required=1)
    plan = _formatted(big)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_search_plan_no_cartesian(engine):
    from opensearch_spark.query import dsl as Q

    df = engine.search({"match": {"text": "error handling"}}, size=10)
    plan = _formatted(df)
    assert "CartesianProduct" not in plan


def test_wand_metadata_threshold_prunes_binaries(engine):
    """The metadata-only WAND threshold scan must keep the packed
    binary columns unread (achievable scores come from max_tf +
    max_tf_norm alone)."""
    meta = (
        engine.index.postings()
        .filter(F.col("term") == "error")
        .select("term", "max_tf", "max_tf_norm")
    )
    plan = _formatted(meta)
    schema_line = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert schema_line, plan
    for col in ("docs_bin", "tfs_bin", "norms_bin", "pos_bin"):
        assert col not in schema_line[0]


def test_multifield_no_cartesian(spark):
    """cross_fields multi_match must not produce a cartesian product —
    per-field clause frames union and hash-aggregate on (term, docid)."""
    import os
    import tempfile

    from opensearch_spark.docs_index import documents_multi_engine
    from opensearch_spark.query import dsl as Q

    sf = "/root/testdata/sf0.001"
    if not os.path.isdir(sf):
        pytest.skip("driver testdata absent")
    meng = documents_multi_engine(spark, sf)
    out = meng.score_multi_match(
        Q.MultiMatch("spark join", [("text", 1.0), ("title", 2.0)], type="cross_fields")
    )
    plan = _formatted(out)
    assert "CartesianProduct" not in plan


def test_minhash_verify_no_full_shingle_self_join(spark):
    """minhash_lsh_pairs verification must explode the candidate set and
    probe the shingle table (cands ⋈ id_a, then ⋈ (id_b, shingle)) —
    NEVER equi-join shingles to shingles on the bare shingle key, which
    materializes the quadratic self-join LSH exists to avoid (Catalyst
    cannot push a pair-key semi-join below a shingle-keyed join)."""
    import os
    import re

    from opensearch_spark.ops import dedup

    sf = "/root/testdata/sf0.001"
    if not os.path.isdir(sf):
        pytest.skip("driver testdata absent")
    docs = spark.read.parquet(os.path.join(sf, "documents.parquet"))
    out = dedup.minhash_lsh_pairs(docs, threshold=0.5)
    plan = _formatted(out)
    assert "CartesianProduct" not in plan
    # every join that touches the shingle column must also key on a doc id
    for m in re.finditer(r"Left keys \[(\d+)\]: \[([^\]]*)\]", plan):
        keys = m.group(2)
        if "shingle" in keys:
            assert "id_" in keys, f"bare shingle-keyed join in plan:\n{keys}"
    assert not re.search(r"Left keys \[1\]: \[shingle#", plan)


def test_jaccard_no_cartesian_and_broadcast_sizes(spark):
    """The ppjoin candidate plan must join prefixes on the shingle key
    (hash join) with broadcast size/hot frames — never a cartesian."""
    import os

    from opensearch_spark.ops import dedup

    sf = "/root/testdata/sf0.001"
    if not os.path.isdir(sf):
        pytest.skip("driver testdata absent")
    docs = spark.read.parquet(os.path.join(sf, "documents.parquet"))
    out = dedup.jaccard_pairs(docs, threshold=0.8)
    plan = _formatted(out)
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_geo_bbox_predicate_pushdown(spark):
    """geo_bounding_box compiles to plain lat/lon comparisons that
    Catalyst pushes into the docmap parquet scan (PushedFilters) —
    spatial filtering costs row-group pruning, not a full scan."""
    import os

    if not os.path.isdir("/root/testdata/sf0.001"):
        pytest.skip("driver testdata absent")
    from opensearch_spark.docs_index import docset, documents_engine

    eng = documents_engine(spark, "/root/testdata/sf0.001")
    df = docset(
        eng,
        {
            "geo_bounding_box": {
                "location": {
                    "top_left": {"lat": 60.0, "lon": 150.0},
                    "bottom_right": {"lat": 20.0, "lon": -150.0},
                }
            }
        },
    )
    plan = _formatted(df)
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert pushed, plan
    line = pushed[0]
    assert "lat" in line and "lon" in line, line


def test_index_sort_keyset_filter_pushdown(spark, tmp_path):
    """With index_sort on ts, a search_after keyset page on a ts field
    sort must push the ts bound into the docmap parquet scan — that is
    the pruning index sorting buys (deep pages skip whole row groups of
    already-returned time ranges)."""
    from opensearch_spark.index.builder import IndexConfig, build_index
    from opensearch_spark.index.reader import InvertedIndex
    from opensearch_spark.query.executor import SearchEngine
    from opensearch_spark.transcripts import generate

    d = str(tmp_path / "sorted_gate")
    build_index(
        spark,
        generate(spark, 60, partitions=2),
        d,
        IndexConfig(n_segments=4, index_sort=["ts"]),
    )
    eng = SearchEngine(InvertedIndex(spark, d))  # NOT persisted: raw scan
    page1 = eng.search(
        {"match": {"text": "error"}}, size=5, sort=[("ts", "asc")]
    ).collect()
    assert page1
    after = [page1[-1]["ts"], page1[-1]["conv_id"], page1[-1]["turn_idx"]]
    df = eng.search(
        {"match": {"text": "error"}},
        size=5,
        sort=[("ts", "asc")],
        search_after=after,
    )
    plan = _formatted(df)
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l and "ts" in l]
    assert pushed, plan


def test_decontaminate_broadcasts_benchmark_grams(spark):
    """decontaminate must join the corpus gram stream against a
    BROADCAST benchmark gram set (eval suites are small; the corpus is
    huge) — never a shuffle of corpus grams against benchmark grams on
    the gram key, and never a cartesian."""
    import os

    from opensearch_spark.ops import dedup

    sf = "/root/testdata/sf0.001"
    if not os.path.isdir(sf):
        pytest.skip("driver testdata absent")
    docs = spark.read.parquet(os.path.join(sf, "documents.parquet"))
    from pyspark.sql import functions as F

    bench = docs.filter(F.col("doc_id") % 97 == 0)
    out = dedup.decontaminate(docs, bench, n=5)
    plan = _formatted(out)
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_terms_shard_model_single_raw_scan(spark):
    """The two-phase shard terms agg must touch the raw table ONCE
    (one groupBy over (shard, key)); everything downstream — window,
    error accounting, merge — runs over the pre-aggregated frame.  No
    cartesian anywhere; the tiny totals frame is broadcast."""
    import os

    from opensearch_spark import aggs

    sf = "/root/testdata/sf0.001"
    if not os.path.isdir(sf):
        pytest.skip("driver testdata absent")
    ev = spark.read.parquet(os.path.join(sf, "events.parquet"))
    buckets, meta = aggs.terms_shard_model(
        ev, "user_id", "event_id", size=5, shard_size=6, n_shards=8
    )
    for df in (buckets, meta):
        plan = _formatted(df)
        assert "CartesianProduct" not in plan
        # raw parquet scanned exactly once per output frame
        assert plan.count("events.parquet") <= 2, plan


def test_mixture_sample_row_path_is_hash_window(spark):
    """mixture_sample's row path must be one window over the domain
    column with pure integer hash ordering — no Python UDFs, no
    cartesian; quotas ride the plan as a CASE literal."""
    import os

    from opensearch_spark.ops import sampling as smp

    sf = "/root/testdata/sf0.001"
    if not os.path.isdir(sf):
        pytest.skip("driver testdata absent")
    docs = spark.read.parquet(os.path.join(sf, "documents.parquet"))
    out = smp.mixture_sample(docs, "lang", "doc_id", alpha=0.5, target=300)
    plan = _formatted(out)
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Window" in plan


def test_minhash_md5_mode_keeps_candidate_probe_order(spark):
    """The md5 (oracle) hash mode must keep the verify-stage join order
    fix: candidates explode first, shingles probe second — never the
    quadratic shingle self-join (r2 VERDICT #1)."""
    import os

    from opensearch_spark.ops import dedup

    sf = "/root/testdata/sf0.001"
    if not os.path.isdir(sf):
        pytest.skip("driver testdata absent")
    docs = spark.read.parquet(os.path.join(sf, "documents.parquet"))
    out = dedup.minhash_lsh_pairs(docs, n=3, threshold=0.8, hash_fn="md5")
    plan = _formatted(out)
    assert "CartesianProduct" not in plan


def test_derived_predicate_keeps_mapped_pushdown(engine):
    """A derived-field predicate (computed column, not pushable) must not
    drag the mapped-column conjunct out of the parquet scan: Catalyst
    splits the conjunction and still pushes the role filter down."""
    with engine.derived_fields({"tl": "length(text)"}):
        dm = (
            engine.docmap()
            .filter((F.col("tl") > 50) & (F.col("role") == "user"))
            .select("_docid")
        )
        plan = _formatted(dm)
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    if pushed:  # raw parquet scan (not an InMemoryRelation)
        assert any("role" in l for l in pushed), plan


def test_exact_phrase_scorer_has_no_python_eval(engine):
    """r4 (VERDICT #9): the slop-0 phrase frequency lowers to JVM
    higher-order functions (map_from_entries + filter/array_contains) —
    the scoring stage must contain NO Python eval node.  The only
    Python in the plan is the posting-block Arrow decode (MapInPandas),
    which is shared by every query type."""
    df = engine.search({"match_phrase": {"text": "error handling"}}, size=5)
    plan = _formatted(df)
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_routed_search_prunes_segment(engine):
    """Routed search (_search?routing=): the _seg predicate must reach
    the postings Parquet scan, and the routed result set must be
    exactly the unrouted hits living in that segment with IDENTICAL
    scores (global term stats — the dfs_query_then_fetch contract)."""
    from opensearch_spark.query.executor import SearchEngine

    # pick the routing value of a known hit
    full = engine.search({"match": {"text": "error"}}, size=50).collect()
    assert full
    rkey = full[0]["conv_id"]
    ridx = engine.index.routed(rkey)
    # plan gate: pushed _seg equality on the postings scan
    plan = _formatted(ridx.postings().filter(F.col("term") == "error"))
    assert "PushedFilters" in plan
    assert "EqualTo(_seg" in plan.replace(" ", ""), plan
    # correctness: routed == unrouted ∩ segment, scores identical
    reng = SearchEngine(ridx)
    routed = {
        (r["conv_id"], r["turn_idx"]): r["score"]
        for r in reng.search({"match": {"text": "error"}}, size=50).collect()
    }
    assert (full[0]["conv_id"], full[0]["turn_idx"]) in routed
    seg_ids = {
        (r["conv_id"], r["turn_idx"])
        for r in ridx.docmap().select("conv_id", "turn_idx").collect()
    }
    expected = {
        (r["conv_id"], r["turn_idx"]): r["score"]
        for r in full
        if (r["conv_id"], r["turn_idx"]) in seg_ids
    }
    # every routed hit present in the unrouted set scores identically
    for k, v in routed.items():
        if k in expected:
            assert v == pytest.approx(expected[k], rel=1e-9)
    # and the top routed hits are exactly the segment's unrouted hits
    assert set(expected) <= set(routed) or len(routed) == 50


def test_fuzzy_length_band_pushdown(engine):
    """Fuzzy expansion must push the |len(term)-len(q)| <= d band and
    any prefix_length prefix into the dictionary parquet scan, and the
    band must not change the expanded term set (it is a necessary
    condition for the edit distance)."""
    from opensearch_spark.query import dsl as Q

    q = Q.Fuzzy("text", "erorr", fuzziness=2, prefix_length=1,
                transpositions=False)
    frame = engine._expansion_frame(q)
    plan = _formatted(frame)
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert pushed, plan
    line = pushed[0].replace(" ", "")
    assert "GreaterThanOrEqual(tlen" in line, line
    assert "LessThanOrEqual(tlen" in line, line
    assert "StringStartsWith(term,e)" in line, line
    # band == no-band results
    got = sorted(r["term"] for r in frame.collect())
    unbanded = sorted(
        r["term"]
        for r in engine.index.dictionary()
        .filter(
            (F.levenshtein(F.col("term"), F.lit("erorr")) <= 2)
            & F.col("term").startswith("e")
        )
        .collect()
    )
    assert got == unbanded and got, got


def test_wildcard_regexp_literal_prefix_pushdown(engine):
    """Wildcard/regexp with a literal prefix must push a StartsWith
    into the dictionary scan (the FST common-prefix seek analog) with
    the full pattern still applied on survivors."""
    from opensearch_spark.query import dsl as Q
    from opensearch_spark.query.executor import _literal_prefix

    # prefix extraction unit semantics
    assert _literal_prefix("err*", "*?\\") == "err"
    assert _literal_prefix("er?or", "*?\\") == "er"
    assert _literal_prefix("err.*", ".?*+{}[]()|\\^$", quantified=True) == "err"
    # a regexp quantifier modifies the previous literal -> dropped
    assert _literal_prefix("errk*", ".?*+{}[]()|\\^$", quantified=True) == "err"
    # alternation anywhere kills the prefix (may bypass the head)
    assert _literal_prefix("err|ok", ".?*+{}[]()|\\^$", quantified=True) == ""

    for q in (Q.Wildcard("text", "err*r"), Q.Regexp("text", "err[aeiou]r")):
        frame = engine._expansion_frame(q)
        plan = _formatted(frame)
        pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
        assert pushed, plan
        assert "StringStartsWith(term,err)" in pushed[0].replace(" ", ""), pushed[0]
        assert frame.count() > 0  # the corpus has err* terms ("error")


def test_scaled_float_predicate_pushes_long_equality(spark, tmp_path):
    """scaled_float term/range must reach the docmap parquet scan as
    LONG comparisons (the stored representation) — quantization happens
    plan-side, not row-side, so row-group stats prune."""
    import json as _json

    from opensearch_spark.index.mapping import (
        Mappings, create_index_from_json,
    )
    from opensearch_spark.index.reader import InvertedIndex
    from opensearch_spark.query.executor import SearchEngine
    from opensearch_spark.query import dsl as Q

    df = spark.createDataFrame(
        [(_json.dumps({"doc_id": i, "text": "t x", "price": i * 0.5}),)
         for i in range(1, 30)],
        "_source string",
    )
    d = str(tmp_path / "sfp")
    create_index_from_json(
        spark, df, d, id_fields=("doc_id",),
        mappings=Mappings(
            {"price": {"type": "scaled_float", "scaling_factor": 100.0}}
        ),
    )
    eng = SearchEngine(InvertedIndex(spark, d))
    pred = eng._predicate(Q.Term(field="price", value=3.0))
    scan = eng.docmap().filter(pred)
    plan = _formatted(scan)
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert pushed, plan
    flat = pushed[0].replace(" ", "")
    assert "EqualTo(price,300)" in flat, pushed[0]
    rng = eng._predicate(Q.Range(field="price", gt=3.0, lte=10.0))
    plan2 = _formatted(eng.docmap().filter(rng))
    pushed2 = [l for l in plan2.splitlines() if "PushedFilters" in l][0]
    f2 = pushed2.replace(" ", "")
    assert "GreaterThanOrEqual(price,301)" in f2 and \
        "LessThanOrEqual(price,1000)" in f2, pushed2
