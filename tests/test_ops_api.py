"""Operational APIs: _stats / _cat/indices (IndicesStatsResponse.java,
RestIndicesAction.java), the request cache (IndicesRequestCache.java),
and query-insights top-N (TopQueriesService.java).
"""

import pytest

from opensearch_spark.index.reader import InvertedIndex
from opensearch_spark.index.stats_api import cat_indices, index_stats
from opensearch_spark.query.executor import SearchEngine
from opensearch_spark.query.insights import QueryInsights
from opensearch_spark.query.request_cache import RequestCache

QUERY = {"match": {"text": "error handling"}}


def test_index_stats_counts(spark, index_dir, engine):
    s = index_stats(spark, index_dir)
    n = engine.index.stats["n_docs"]
    assert s["docs"]["count"] + s["docs"]["deleted"] == n
    assert s["segments"]["count"] >= 1
    assert s["segments"]["n_segments_routing"] == engine.index.plan["n_segments"]
    assert s["store"]["size_in_bytes"] > s["store"]["postings_in_bytes"] > 0
    assert s["build"]["avgdl"] == engine.index.stats["avgdl"]


def test_stats_reflect_deletes_and_resize(spark, index_dir, tmp_path):
    from opensearch_spark.index.lifecycle import delete_by_query
    from opensearch_spark.index.resize import shrink_index

    dst = str(tmp_path / "stats_clone")
    shrink_index(spark, index_dir, dst, 2)
    eng = SearchEngine(InvertedIndex(spark, dst))
    before = index_stats(spark, dst)
    n_del = delete_by_query(eng, {"term": {"role": "tool"}})
    after = index_stats(spark, dst)
    assert n_del > 0
    assert after["docs"]["deleted"] == n_del
    assert after["docs"]["count"] == before["docs"]["count"] - n_del
    assert after["segments"]["n_segments_routing"] == 2
    assert after["resized"][0]["op"] == "shrink"


def test_cat_indices(spark, index_dir, tmp_path):
    rows = cat_indices(
        spark, {"main": index_dir, "missing": str(tmp_path / "nope")}
    )
    by_name = {r["index"]: r for r in rows}
    assert by_name["main"]["health"] == "green"
    assert by_name["main"]["docs.count"] > 0
    assert by_name["missing"]["health"] == "red"


def test_request_cache_hit_and_identity(spark, index_dir):
    eng = SearchEngine(InvertedIndex(spark, index_dir))
    cache = RequestCache(eng)
    r1 = cache.search(QUERY, size=10).collect()
    assert cache.stats == {"hits": 0, "misses": 1, "evictions": 0}
    r2 = cache.search(QUERY, size=10).collect()
    assert cache.stats["hits"] == 1
    assert r1 == r2
    # different request -> different key
    cache.search(QUERY, size=5).collect()
    assert cache.stats["misses"] == 2


def test_request_cache_hit_runs_no_engine_search(spark, index_dir, monkeypatch):
    eng = SearchEngine(InvertedIndex(spark, index_dir))
    cache = RequestCache(eng)
    cache.search(QUERY, size=10)
    calls = {"n": 0}
    real = eng.search

    def counting(*a, **k):
        calls["n"] += 1
        return real(*a, **k)

    monkeypatch.setattr(eng, "search", counting)
    cache.search(QUERY, size=10)
    assert calls["n"] == 0  # served from cached bytes, engine untouched


def test_request_cache_invalidated_by_commit_change(spark, index_dir, tmp_path):
    from opensearch_spark.index.lifecycle import delete_by_query
    from opensearch_spark.index.resize import clone_index

    dst = str(tmp_path / "cache_clone")
    clone_index(spark, index_dir, dst)
    eng = SearchEngine(InvertedIndex(spark, dst))
    cache = RequestCache(eng)
    r1 = cache.search(QUERY, size=10).collect()
    top = (r1[0]["conv_id"], r1[0]["turn_idx"])
    delete_by_query(
        eng,
        {"bool": {"filter": [
            {"term": {"conv_id": top[0]}},
            {"term": {"turn_idx": top[1]}},
        ]}},
    )
    r2 = cache.search(QUERY, size=10).collect()
    # the reader changed: the hit was NOT served stale
    assert cache.stats["hits"] == 0 and cache.stats["misses"] == 2
    assert top not in [(r["conv_id"], r["turn_idx"]) for r in r2]


def test_request_cache_eviction(spark, index_dir):
    eng = SearchEngine(InvertedIndex(spark, index_dir))
    cache = RequestCache(eng, max_entries=2)
    for sz in (1, 2, 3):
        cache.search(QUERY, size=sz)
    assert cache.stats["evictions"] == 1
    assert len(cache._entries) == 2


def test_query_insights(spark, index_dir):
    eng = SearchEngine(InvertedIndex(spark, index_dir))
    ins = QueryInsights(capacity=5)
    for q in ("error handling", "spark", "the"):
        ins.measure(eng, {"match": {"text": q}}, size=5)
    assert len(ins) == 3
    top = ins.top_queries(n=2)
    assert len(top) == 2
    assert top[0]["took_ms"] >= top[1]["took_ms"]
    by_hits = ins.top_queries(n=3, metric="hits")
    assert by_hits[0]["hits"] >= by_hits[-1]["hits"]
    with pytest.raises(ValueError):
        ins.top_queries(metric="cpu")
    # capacity bound
    for i in range(10):
        ins.record(f"q{i}", took_ms=i)
    assert len(ins) == 5


def test_dir_bytes_hadoop_fs_uri(spark, index_dir):
    """URI paths route through the Hadoop FileSystem getContentSummary
    (object-storage path of the stats API); file:// over the same
    local directory must agree byte-for-byte with the os.walk path."""
    from opensearch_spark.index.builder import _paths
    from opensearch_spark.index.stats_api import _dir_bytes

    postings = _paths(index_dir)["postings"]
    import os

    visible = 0  # LocalFileSystem is a ChecksumFileSystem: .crc sidecars hidden
    for dp, _dirs, files in os.walk(postings):
        visible += sum(
            os.path.getsize(os.path.join(dp, f)) for f in files
            if not f.startswith(".")
        )
    via_fs = _dir_bytes("file://" + postings, spark)
    assert visible == via_fs > 0
    assert _dir_bytes("file:///nonexistent/osps-xyz", spark) == 0
    with pytest.raises(ValueError, match="SparkSession is required"):
        _dir_bytes("file://" + postings)


def test_index_stats_over_hadoop_fs_uri(spark, index_dir):
    """r4 review: _stats must work end-to-end on a URI index path
    (object-storage analog — exercised via file:// + LocalFileSystem),
    not just route _dir_bytes.  docs/segments/build groups must agree
    with the local-path result; store sizes agree up to hidden
    checksum sidecars (LocalFileSystem hides dotfiles, os.walk sees
    them)."""
    import os

    from opensearch_spark.index.stats_api import index_stats

    local = index_stats(spark, index_dir)
    via_uri = index_stats(spark, "file://" + index_dir)
    assert via_uri["docs"] == local["docs"]
    assert via_uri["segments"] == local["segments"]
    assert via_uri["build"] == local["build"]
    hidden = 0
    for dp, _dirs, files in os.walk(index_dir):
        hidden += sum(
            os.path.getsize(os.path.join(dp, f))
            for f in files if f.startswith(".")
        )
    assert via_uri["store"]["size_in_bytes"] > 0
    assert (
        via_uri["store"]["size_in_bytes"]
        == local["store"]["size_in_bytes"] - hidden
    ) or via_uri["store"]["size_in_bytes"] == local["store"]["size_in_bytes"]
import numpy as np
import pytest


def test_semantic_dedup(spark):
    """SemDeDup: planted near-dup pairs inside well-separated clusters;
    within each dup group the member LEAST similar to the centroid
    survives; solo members always keep."""
    from opensearch_spark.ops.dedup import semantic_dedup

    rng = np.random.default_rng(7)
    rows = []
    # two orthogonal cluster directions in R^8
    d0 = np.eye(8)[0]
    d1 = np.eye(8)[1]
    vid = 0
    for base in (d0, d1):
        for j in range(6):
            v = base + rng.normal(0, 0.2, 8)    # clustered, below dup cosine
            rows.append((vid, [float(x) for x in v / np.linalg.norm(v)]))
            vid += 1
    # plant an exact triple dup of doc 0's vector (ids 100, 101)
    v0 = np.array(rows[0][1])
    for did in (100, 101):
        rows.append((did, [float(x) for x in v0]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = semantic_dedup(df, nlist=2, threshold=0.995).collect()
    by_id = {r["id"]: r for r in out}
    assert len(by_id) == len(rows)
    trio = [by_id[0], by_id[100], by_id[101]]
    assert sum(r["keep"] for r in trio) == 1        # one survivor
    # survivor = least centroid-similar, tie -> min id (exact dups tie)
    mn = min(r["centroid_cos"] for r in trio)
    surv = [r for r in trio if r["keep"]][0]
    assert surv["centroid_cos"] == mn
    # everything else survives
    others = [r for r in out if r["id"] not in (0, 100, 101)]
    assert all(r["keep"] for r in others)
    # the tight cluster members share a cell with the dup trio
    assert len({r["cell"] for r in trio}) == 1


def test_language_id_multi(spark):
    """Stopword-profile multilingual langid (textstats.language_id_multi):
    one columnar pass, 12 profiles, distinct-hit scoring."""
    from opensearch_spark.ops import textstats

    df = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog and runs"),
            (1, "le chat est sur la table et il ne veut pas descendre"),
            (2, "der hund und die katze sind nicht im haus aber auch"),
            (3, "el perro y el gato están en la casa pero no aquí"),
            (4, "hän asuu taloissa ja on ollut siellä mutta ei nyt"),
            (5, "xyzzy plugh abracadabra"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["pred_lang_multi"]
        for r in textstats.language_id_multi(df).collect()
    }
    assert got[0] == "en"
    assert got[1] == "fr"
    assert got[2] == "de"
    assert got[3] == "es"
    assert got[4] == "fi"
    assert got[5] == "und"  # below min_hits everywhere
