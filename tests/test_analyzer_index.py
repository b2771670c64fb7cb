"""End-to-end: indexes built with custom analysis chains.

Covers the reference's per-field ``analyzer`` / ``search_analyzer``
mapping settings (``TextFieldMapper.java``): a stemmed index matches
inflected query forms, and an edge_ngram index with a standard
search_analyzer gives search-as-you-type prefix recall
(``EdgeNGramTokenFilterFactory.java``).
"""

from __future__ import annotations

import pandas as pd

from opensearch_spark.index.builder import IndexConfig, build_index
from opensearch_spark.index.reader import InvertedIndex
from opensearch_spark.query.dsl import Match
from opensearch_spark.query.executor import SearchEngine


def _docs(spark, rows):
    pdf = pd.DataFrame(
        {
            "conv_id": [r[0] for r in rows],
            "turn_idx": [r[1] for r in rows],
            "text": [r[2] for r in rows],
        }
    )
    return spark.createDataFrame(pdf)


def _engine(spark, tmp_path, name, cfg, rows):
    idx = str(tmp_path / name)
    build_index(spark, _docs(spark, rows), idx, cfg)
    return SearchEngine(InvertedIndex(spark, idx))


def test_stemmer_index_matches_inflections(spark, tmp_path):
    rows = [
        ("c1", 0, "the ponies were motoring happily"),
        ("c2", 0, "a formal relational condition"),
        ("c3", 0, "nothing relevant here"),
    ]
    cfg = IndexConfig(
        n_segments=2,
        analyzer={
            "tokenizer": "standard",
            "filter": ["lowercase", {"type": "stemmer", "language": "english"}],
        },
    )
    eng = _engine(spark, tmp_path, "stem_idx", cfg, rows)
    # query inflections stem to the same terms ("pony" -> poni, "motored"
    # -> motor) so the stemmed doc matches
    hits = eng.search(Match("text", "pony motored", operator="and"), size=5).collect()
    assert [h["conv_id"] for h in hits] == ["c1"]
    # and the non-stemmed surface form still matches through the shared chain
    hits = eng.search(Match("text", "relations"), size=5).collect()
    assert [h["conv_id"] for h in hits] == ["c2"]


def test_edge_ngram_search_as_you_type(spark, tmp_path):
    rows = [
        ("c1", 0, "wildcard performance tuning"),
        ("c2", 0, "performer on stage"),
        ("c3", 0, "unrelated words"),
    ]
    cfg = IndexConfig(
        n_segments=2,
        analyzer={
            "tokenizer": "standard",
            "filter": [
                "lowercase",
                {"type": "edge_ngram", "min_gram": 2, "max_gram": 8},
            ],
        },
        search_analyzer="standard",
    )
    eng = _engine(spark, tmp_path, "edge_idx", cfg, rows)
    # the query side analyzes "perf" as one whole token; the index side
    # stored prefix grams, so both performance docs match
    hits = eng.search(Match("text", "perf"), size=5).collect()
    assert sorted(h["conv_id"] for h in hits) == ["c1", "c2"]
    # longer prefix only matches the longer word's grams
    hits = eng.search(Match("text", "performa"), size=5).collect()
    assert [h["conv_id"] for h in hits] == ["c1"]


def test_shingle_index_phrase_as_term(spark, tmp_path):
    rows = [
        ("c1", 0, "new york is big"),
        ("c2", 0, "york new haven"),
    ]
    cfg = IndexConfig(
        n_segments=1,
        analyzer={
            "tokenizer": "standard",
            "filter": ["lowercase", {"type": "shingle"}],
        },
    )
    eng = _engine(spark, tmp_path, "shingle_idx", cfg, rows)
    # the 2-shingle "new york" is a single indexed term; the search side
    # shares the chain, so an AND match requires the shingle term itself —
    # c2 has both unigrams but not the shingle
    hits = eng.search(
        Match("text", "new york", operator="and"), size=5
    ).collect()
    assert [h["conv_id"] for h in hits] == ["c1"]


def test_plan_roundtrips_analyzer_spec(spark, tmp_path):
    cfg = IndexConfig(
        n_segments=1,
        analyzer={"tokenizer": "whitespace", "filter": ["lowercase"]},
        search_analyzer="whitespace",
    )
    idx = str(tmp_path / "plan_idx")
    build_index(spark, _docs(spark, [("c1", 0, "A b")]), idx, cfg)
    rd = InvertedIndex(spark, idx)
    assert rd.plan["analyzer"] == cfg.analyzer
    assert rd.plan["search_analyzer"] == "whitespace"
    # search_analyzer wins: whitespace does NOT lowercase
    assert rd.analyze("A b") == ["A", "b"]
