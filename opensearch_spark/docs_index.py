"""Bridge: build/cache the inverted index over a testdata ``documents``
table and hand out a ``SearchEngine`` for it.

The driver's correctness harness calls each query with ``(spark,
sf_dir)``; the index for a given ``sf_dir`` is built once into a
versioned cache directory (resume-safe: the builder skips completed
segments) and reused across queries in the same run.
"""

from __future__ import annotations

import os
import re
import tempfile
from typing import Dict

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from opensearch_spark.index.builder import IndexConfig, build_index
from opensearch_spark.index.reader import InvertedIndex
from opensearch_spark.query.executor import SearchEngine

# bump when index layout or the derived-docs shape changes: stale cached
# indexes are keyed away instead of misread
_LAYOUT_VERSION = "v9"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # pin the session to UTC so timestamp rendering matches the
    # timezone-naive oracle (DuckDB reads parquet micros as naive)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def documents_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The documents table plus two derived columns: ``src_alt`` is NULL
    for every 7th doc (so exists/must_not queries exercise real null
    semantics — the raw table has no nullable columns) and ``req_terms``
    is a small per-doc integer driving ``terms_set``'s dynamic
    minimum-should-match."""
    return (
        load_table(spark, sf_dir, "documents")
        .withColumn(
            "src_alt",
            F.when(F.col("doc_id") % 7 == 0, F.lit(None).cast("string")).otherwise(
                F.col("source")
            ),
        )
        .withColumn("req_terms", (F.lit(1) + F.col("doc_id") % 3).cast("int"))
        # deterministic geo_point pair (SURVEY §2.2 geo family; the raw
        # table has no coordinates): pure integer arithmetic on doc_id
        # so the DuckDB oracle reproduces the DOUBLES bit-exactly —
        # lat in [-90, 90), lon in [-180, 180), scattered by coprime
        # multipliers
        .withColumn(
            "lat",
            ((F.col("doc_id") * 7919 % 18000) / F.lit(100.0) - F.lit(90.0)).cast(
                "double"
            ),
        )
        .withColumn(
            "lon",
            ((F.col("doc_id") * 104729 % 36000) / F.lit(100.0) - F.lit(180.0)).cast(
                "double"
            ),
        )
        # a second ANALYZED text field for multi-field search: the doc's
        # first 4 tokens (a synthetic "title" — genuinely contributing
        # terms, deterministically derived so the DuckDB oracle can
        # rebuild it: array_to_string(toks[1:4], ' '))
        .withColumn(
            "title",
            F.array_join(
                F.slice(F.filter(F.split(F.col("text"), " "), lambda x: x != ""), 1, 4),
                " ",
            ),
        )
        # r5 session 3: carry the doc's embedding vector into the docmap
        # (vec_id aligns with doc_id per TESTDATA.md) so the `knn`
        # query scores straight off stored doc values — the left join
        # keeps the docmap complete if a doc has no vector
        .join(
            load_table(spark, sf_dir, "embeddings").select(
                F.col("vec_id").alias("doc_id"), "embedding"
            ),
            "doc_id",
            "left",
        )
    )


_ENGINES: Dict[str, SearchEngine] = {}


def docs_index_dir(sf_dir: str) -> str:
    slug = re.sub(r"\W+", "_", os.path.abspath(sf_dir)).strip("_")
    return os.path.join(
        tempfile.gettempdir(), f"osps_docs_index_{_LAYOUT_VERSION}", slug
    )


def documents_engine(spark: SparkSession, sf_dir: str) -> SearchEngine:
    idx_dir = docs_index_dir(sf_dir)
    eng = _ENGINES.get(idx_dir)
    if eng is not None and eng.spark is spark:
        return eng
    if not os.path.exists(os.path.join(idx_dir, "stats.json")):
        build_index(
            spark,
            documents_df(spark, sf_dir),
            idx_dir,
            IndexConfig(
                n_segments=8,
                id_cols=("doc_id",),
                routing_col="doc_id",
                text_col="text",
                dictionary_partitions=2,
            ),
        )
    eng = SearchEngine(InvertedIndex(spark, idx_dir))
    _ENGINES[idx_dir] = eng
    return eng


def documents_multi_engine(spark: SparkSession, sf_dir: str):
    """Per-field engines over aligned docids (SURVEY.md §1.2 text
    fields; ``query/multifield.py``): ``text`` reuses the main index,
    ``title`` gets its own field-partitioned index directory
    (``<cache>/field=title``) built from the SAME docs + routing so
    docids align.  The production layout would point the title index's
    docmap at the shared one (plan ``docmap_dir``, as ``merge_index``
    does); locally the duplicate docmap is kilobytes."""
    from opensearch_spark.query.multifield import MultiFieldEngine

    text_eng = documents_engine(spark, sf_dir)
    title_dir = os.path.join(docs_index_dir(sf_dir), "field=title")
    key = title_dir
    eng = _ENGINES.get(key)
    if eng is None or eng.spark is not spark:
        if not os.path.exists(os.path.join(title_dir, "stats.json")):
            build_index(
                spark,
                documents_df(spark, sf_dir),
                title_dir,
                IndexConfig(
                    n_segments=8,
                    id_cols=("doc_id",),
                    routing_col="doc_id",
                    text_col="title",
                    dictionary_partitions=2,
                ),
            )
        eng = SearchEngine(InvertedIndex(spark, title_dir))
        _ENGINES[key] = eng
    return MultiFieldEngine({"text": text_eng, "title": eng}, "text")


def documents_sayt_engine(spark: SparkSession, sf_dir: str):
    """search_as_you_type bundle over documents.text: the cached main
    index as the root field plus ``text._2gram`` / ``text._3gram``
    shingle subfield indexes (``index/sayt.py``;
    SearchAsYouTypeFieldMapper.java), all docid-aligned."""
    from opensearch_spark.index.sayt import build_search_as_you_type

    key = os.path.join(docs_index_dir(sf_dir), "_sayt")
    eng = _ENGINES.get(key)
    if eng is not None and eng.spark is spark:
        return eng
    meng = build_search_as_you_type(
        spark,
        documents_df(spark, sf_dir),
        docs_index_dir(sf_dir),
        "text",
        base=IndexConfig(
            n_segments=8,
            id_cols=("doc_id",),
            routing_col="doc_id",
            dictionary_partitions=2,
        ),
        root_engine=documents_engine(spark, sf_dir),
    )
    _ENGINES[key] = meng
    return meng


def topk(engine: SearchEngine, query, k: int = 10, round_dp: int = 4) -> DataFrame:
    """Driver-comparable top-k: scores rounded to ``round_dp`` decimals
    BEFORE ordering, ties broken by doc id — so the Spark plan and the
    SQL oracle pick identical boundary rows even when raw float scores
    differ in the last ulp (summation-order noise)."""
    from opensearch_spark.query import dsl as Q

    q = Q.from_dict(query) if isinstance(query, dict) else query
    scored = engine._score(q)
    dm = engine.index.docmap().select("_docid", *engine.id_cols)
    order = [F.desc("score")] + [F.asc(c) for c in engine.id_cols]
    return (
        scored.join(dm, "_docid")
        .withColumn("score", F.round(F.col("score"), round_dp))
        .orderBy(*order)
        .limit(k)
        .select(*engine.id_cols, "score")
    )


def docset(engine: SearchEngine, query, derived=None) -> DataFrame:
    """Driver-comparable docset with constant scores (filter context).

    ``derived`` = query-time derived fields
    (``SearchEngine.derived_fields``); the plan is built inside the
    scope, so the returned frame embeds the derived expressions."""
    import contextlib

    from opensearch_spark.query import dsl as Q

    q = Q.from_dict(query) if isinstance(query, dict) else query
    with engine.derived_fields(derived) if derived else contextlib.nullcontext():
        scored = engine._score(q)
    dm = engine.index.docmap().select("_docid", *engine.id_cols)
    return (
        scored.join(dm, "_docid")
        .withColumn("score", F.round(F.col("score"), 4))
        .select(*engine.id_cols, "score")
        .orderBy(*[F.asc(c) for c in engine.id_cols])
    )
