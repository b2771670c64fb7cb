"""Multi-field text search: per-field postings + real ``multi_match``.

The reference indexes every analyzed field into its own postings
(``index/mapper/TextFieldMapper.java:110-112``; per-field posting
formats via ``PerFieldMappingPostingFormatCodec.java``) with per-field
norms and collection statistics.  The Spark-native expression of
"per-field postings" is a **field-partitioned index layout**: one index
directory per text field (``<root>/field=<name>/``), each with its own
dictionary, norms and stats — reading one field's postings touches only
that field's files (partition pruning by construction), and per-field
``avgdl``/``doc_count`` are exact.  Doc IDs align across the per-field
indexes because every field index is built from the same docs with the
same routing and id-sort (``builder.build_index`` assigns docids by
segment offset + stable id order, independent of the text column).

``multi_match`` (``MultiMatchQueryBuilder.java``, 902 LoC; engine
``index/search/MultiMatchQuery.java``):

- ``best_fields``: dis_max over per-field match scores + tie_breaker.
- ``most_fields``: sum of per-field match scores.
- ``cross_fields`` (term-centric): each analyzed term is ONE clause
  that matches if the term occurs in ANY field; the clause score is the
  max over fields of the per-field BM25 term score (x field boost).
  Documented deviation: Lucene's BlendedTermQuery rewrites df/ttf to
  the max across fields before scoring; we score each field with its
  own statistics and take the max — same matching set, near-identical
  ranking, and exactly reproducible by the SQL oracle.
"""

from __future__ import annotations

from collections import Counter
from typing import Dict, List, Optional, Sequence, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from opensearch_spark.query import dsl as Q
from opensearch_spark.query.executor import SearchEngine


class MultiFieldEngine:
    """A bundle of per-field :class:`SearchEngine` handles over aligned
    docids.  ``default_field`` supplies the docmap/id columns."""

    def __init__(self, engines: Dict[str, SearchEngine], default_field: str):
        self.engines = engines
        self.default_field = default_field
        self.spark = engines[default_field].spark
        self.id_cols = engines[default_field].id_cols

    @property
    def default(self) -> SearchEngine:
        return self.engines[self.default_field]

    def score_multi_match(self, q: Q.MultiMatch) -> DataFrame:
        """(_docid, score) for a multi_match over indexed text fields."""
        fields: List[Tuple[str, float]] = [(f, b) for f, b in q.fields]
        for f, _ in fields:
            if f not in self.engines:
                raise ValueError(f"field {f!r} has no per-field index")
        if q.type == "cross_fields":
            return self._cross_fields(q, fields)
        parts = []
        for i, (f, boost) in enumerate(fields):
            eng = self.engines[f]
            sub = eng._score(Q.Match(f, q.query, operator=q.operator, boost=boost))
            parts.append(sub.withColumn("cid", F.lit(i)))
        from functools import reduce

        unioned = reduce(DataFrame.unionByName, parts)
        grouped = unioned.groupBy("_docid").agg(
            F.max("score").alias("best"), F.sum("score").alias("total")
        )
        if q.type == "most_fields":
            score = F.col("total")
        else:  # best_fields
            score = F.col("best") + F.lit(float(q.tie_breaker)) * (
                F.col("total") - F.col("best")
            )
        return grouped.select(
            "_docid", (score * F.lit(float(q.boost))).alias("score")
        )

    def _cross_fields(self, q: Q.MultiMatch, fields) -> DataFrame:
        """Term-centric blending: per (term, doc) take the best field's
        BM25 score, then combine terms like a match query (sum +
        minimum_should_match over distinct matched terms)."""
        tokens = self.default.index.analyze(q.query)
        if not tokens:
            return self.default._empty_scored()
        weights = dict(Counter(tokens))
        parts = []
        for f, boost in fields:
            per = self.engines[f]._per_term_scores(weights)
            if per is None:
                continue
            parts.append(
                per.withColumn("s", F.col("s").cast("double") * F.lit(float(boost)))
            )
        if not parts:
            return self.default._empty_scored()
        from functools import reduce

        unioned = reduce(DataFrame.unionByName, parts)
        # best field per (term, doc), then sum term clauses per doc
        per_term = unioned.groupBy("term", "_docid").agg(
            F.max("s").alias("ts"), F.max("weight").alias("weight")
        )
        required = len(tokens) if q.operator == "and" else 1
        grouped = per_term.groupBy("_docid").agg(
            F.sum(F.col("ts") * F.col("weight")).alias("score"),
            F.sum("weight").alias("matched"),
        )
        return (
            grouped.filter(F.col("matched") >= F.lit(int(required)))
            .select("_docid", (F.col("score") * F.lit(float(q.boost))).alias("score"))
        )

    def topk(self, q: Q.MultiMatch, k: int = 10, round_dp: int = 4) -> DataFrame:
        """Driver-comparable top-k (same contract as docs_index.topk)."""
        scored = self.score_multi_match(q)
        eng = self.default
        dm = eng.index.docmap().select("_docid", *eng.id_cols)
        order = [F.desc("score")] + [F.asc(c) for c in eng.id_cols]
        return (
            scored.join(dm, "_docid")
            .withColumn("score", F.round(F.col("score"), round_dp))
            .orderBy(*order)
            .limit(k)
            .select(*eng.id_cols, "score")
        )
