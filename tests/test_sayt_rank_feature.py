"""search_as_you_type (index/sayt.py) and rank_feature (mapper-extras
RankFeatureQueryBuilder.java analog) engine behavior."""

from __future__ import annotations

import math
import os

import pytest

from opensearch_spark.index.sayt import build_search_as_you_type, sayt_query


@pytest.fixture(scope="module")
def sayt_engine(spark, tmp_path_factory):
    from opensearch_spark.index.builder import IndexConfig

    root = str(tmp_path_factory.mktemp("sayt"))
    docs = spark.createDataFrame(
        [
            (0, "quick brown fox jumps"),
            (1, "quick brown dog"),
            (2, "brown fox trots"),
            (3, "slow green turtle"),
        ],
        "doc_id long, body string",
    )
    return build_search_as_you_type(
        spark,
        docs,
        root,
        "body",
        base=IndexConfig(n_segments=2, id_cols=("doc_id",), routing_col="doc_id"),
    )


def test_sayt_subfields_have_shingle_terms(sayt_engine):
    e2 = sayt_engine.engines["body._2gram"]
    assert e2.index.analyze("quick brown f") == ["quick brown", "brown f"]
    e3 = sayt_engine.engines["body._3gram"]
    assert e3.index.analyze("quick brown f") == ["quick brown f"]


def test_sayt_prefix_of_phrase_ranks_phrase_docs_first(sayt_engine):
    rows = sayt_engine.topk(sayt_query("body", "quick brown fo"), k=4).collect()
    ids = [r.doc_id for r in rows]
    # doc 0 completes "quick brown fo*" in every subfield; doc 1 matches
    # the terms + 2gram but not the "quick brown fo" prefix shingle
    assert ids[0] == 0
    assert 1 in ids
    assert 3 not in ids


def test_sayt_single_token_is_pure_prefix(sayt_engine):
    rows = sayt_engine.topk(sayt_query("body", "bro"), k=4).collect()
    assert sorted(r.doc_id for r in rows) == [0, 1, 2]


def test_rank_feature_functions(spark, tmp_path):
    from opensearch_spark.index.builder import IndexConfig, build_index
    from opensearch_spark.index.reader import InvertedIndex
    from opensearch_spark.query.executor import SearchEngine

    docs = spark.createDataFrame(
        [(i, f"doc {i}", float(10 * (i + 1))) for i in range(5)],
        "doc_id long, body string, pagerank double",
    )
    d = os.path.join(str(tmp_path), "rf")
    build_index(
        spark, docs, d,
        IndexConfig(n_segments=2, id_cols=("doc_id",), routing_col="doc_id", text_col="body"),
    )
    eng = SearchEngine(InvertedIndex(spark, d))

    sat = {
        r.doc_id: r.score
        for r in eng.search(
            {"rank_feature": {"field": "pagerank", "saturation": {"pivot": 20.0}}},
            size=5,
        ).collect()
    }
    assert sat[0] == pytest.approx(10 / 30)
    assert sat[4] == pytest.approx(50 / 70)

    logs = {
        r.doc_id: r.score
        for r in eng.search(
            {"rank_feature": {"field": "pagerank", "log": {"scaling_factor": 2.0}}},
            size=5,
        ).collect()
    }
    assert logs[1] == pytest.approx(math.log(2.0 + 20.0))

    sig = {
        r.doc_id: r.score
        for r in eng.search(
            {
                "rank_feature": {
                    "field": "pagerank",
                    "sigmoid": {"pivot": 20.0, "exponent": 2.0},
                }
            },
            size=5,
        ).collect()
    }
    assert sig[0] == pytest.approx(100.0 / (100.0 + 400.0))

    # default saturation pivot = geometric mean of the feature
    dflt = {
        r.doc_id: r.score
        for r in eng.search({"rank_feature": {"field": "pagerank"}}, size=5).collect()
    }
    gm = math.exp(sum(math.log(10.0 * (i + 1)) for i in range(5)) / 5)
    assert dflt[2] == pytest.approx(30.0 / (30.0 + gm), rel=1e-6)

    # min_score (SearchSourceBuilder.minScore): drops hits below the cut
    cut = sat[2]
    kept = eng.search(
        {"rank_feature": {"field": "pagerank", "saturation": {"pivot": 20.0}}},
        size=5,
        min_score=cut,
    ).collect()
    assert sorted(r.doc_id for r in kept) == [2, 3, 4]


def test_rank_features_map_field(spark, tmp_path):
    """rank_features (plural, RankFeaturesFieldMapper): the field is a
    map of feature name -> positive value and `field.name` addresses
    one feature; docs missing the feature don't match."""
    from opensearch_spark.index.builder import IndexConfig, build_index
    from opensearch_spark.index.reader import InvertedIndex
    from opensearch_spark.query.executor import SearchEngine

    docs = spark.createDataFrame(
        [(0, "doc zero", {"politics": 10.0, "sports": 1.0}),
         (1, "doc one", {"politics": 40.0}),
         (2, "doc two", {"sports": 5.0})],
        "doc_id long, body string, topics map<string,double>",
    )
    d = os.path.join(str(tmp_path), "rfs")
    build_index(
        spark, docs, d,
        IndexConfig(n_segments=1, id_cols=("doc_id",), text_col="body"),
    )
    eng = SearchEngine(InvertedIndex(spark, d))
    rows = eng.search(
        {"rank_feature": {"field": "topics.politics",
                          "saturation": {"pivot": 10.0}}},
        size=10,
    ).collect()
    got = {r.doc_id: round(r.score, 6) for r in rows}
    # saturation: v/(v+pivot) -> doc1 40/50=0.8, doc0 10/20=0.5; doc2 absent
    assert got == {1: 0.8, 0: 0.5}
