"""Percolator: reverse search — store queries, stream documents
through them (``modules/percolator/``; SURVEY.md §2.10).

Stored queries are compiled ONCE to Catalyst column predicates over the
analyzed token array (JVM-side: ``array_contains`` / ``array_intersect``
/ windowed ``slice`` equality for phrases — no per-row Python), so a
percolation pass over a micro-batch is a single projection + filter per
stored query.  Use ``percolate`` on any DataFrame, or wire it into
``writeStream.foreachBatch`` / as a stateless streaming transform.
"""

from __future__ import annotations

from collections import Counter
from functools import reduce
from typing import Dict, List, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from opensearch_spark.analysis import analyzer as ana
from opensearch_spark.query import dsl as Q


class Percolator:
    def __init__(
        self,
        queries: Dict[str, dict],
        text_col: str = "text",
        stopwords=None,
    ):
        self.text_col = text_col
        self.stop_cfg = stopwords
        self._stop = ana.resolve_stopwords(stopwords)
        self.queries = {
            qid: (Q.from_dict(spec) if isinstance(spec, dict) else spec)
            for qid, spec in queries.items()
        }

    # ---- query-side analysis (same analyzer as indexing) ----

    def _analyze(self, text: str) -> List[str]:
        return ana.tokenize(text, self._stop)

    # ---- predicate compilation ----

    def predicate(self, q) -> Column:
        """Compile a DSL node to a boolean Column over a document row
        that has a ``_tokens`` array column."""
        toks = F.col("_tokens")
        if isinstance(q, Q.Match):
            terms = self._analyze(q.query)
            if not terms:
                return F.lit(False)  # zero_terms_query=NONE
            uniq = sorted(set(terms))
            arr = F.array(*[F.lit(t) for t in uniq])
            n_matched = F.size(F.array_intersect(toks, arr))
            if q.operator == "and":
                return n_matched == F.lit(len(uniq))
            return n_matched >= F.lit(int(q.minimum_should_match or 1))
        if isinstance(q, Q.MatchPhrase):
            terms = self._analyze(q.query)
            if not terms:
                return F.lit(False)
            n = len(terms)
            lit = F.array(*[F.lit(t) for t in terms])
            idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(0)))
            return F.exists(idx, lambda i: F.slice(toks, i, n) == lit)
        if isinstance(q, Q.Term):
            if q.field == self.text_col:
                return F.array_contains(toks, str(q.value))
            return F.col(q.field) == F.lit(q.value)
        if isinstance(q, Q.Terms):
            if q.field == self.text_col:
                arr = F.array(*[F.lit(str(v)) for v in q.values])
                return F.size(F.array_intersect(toks, arr)) > 0
            return F.col(q.field).isin(list(q.values))
        if isinstance(q, Q.Range):
            c = F.col(q.field)
            conds = []
            if q.gt is not None:
                conds.append(c > F.lit(q.gt))
            if q.gte is not None:
                conds.append(c >= F.lit(q.gte))
            if q.lt is not None:
                conds.append(c < F.lit(q.lt))
            if q.lte is not None:
                conds.append(c <= F.lit(q.lte))
            return reduce(lambda a, b: a & b, conds) if conds else F.lit(True)
        if isinstance(q, Q.Exists):
            return F.col(q.field).isNotNull()
        if isinstance(q, Q.Prefix):
            if q.field == self.text_col:
                return F.exists(toks, lambda t: t.startswith(q.value))
            return F.col(q.field).startswith(q.value)
        if isinstance(q, Q.MatchAll):
            return F.lit(True)
        if isinstance(q, Q.MatchNone):
            return F.lit(False)
        if isinstance(q, Q.Bool):
            pred = F.lit(True)
            for sub in list(q.must) + list(q.filter):
                pred = pred & self.predicate(sub)
            shoulds = [self.predicate(s) for s in q.should]
            if shoulds:
                msm = q.minimum_should_match
                if msm is None:
                    msm = 1 if not (q.must or q.filter) else 0
                if msm > 0:
                    cnt = reduce(
                        lambda a, b: a + b,
                        [F.when(s, 1).otherwise(0) for s in shoulds],
                    )
                    pred = pred & (cnt >= F.lit(int(msm)))
            for sub in q.must_not:
                pred = pred & ~F.coalesce(self.predicate(sub), F.lit(False))
            return pred
        if isinstance(q, Q.ConstantScore):
            return self.predicate(q.filter)
        raise TypeError(f"percolator: unsupported node {type(q).__name__}")

    # ---- evaluation ----

    def percolate(self, docs: DataFrame, id_cols: Optional[List[str]] = None) -> DataFrame:
        """All (query_id, doc) matches for a (micro-)batch of docs."""
        tok_udf = ana.make_tokenize_udf(
            None if self._stop is None else sorted(self._stop)
        )
        d = docs.withColumn("_tokens", tok_udf(F.col(self.text_col)))
        keep = id_cols or [c for c in docs.columns]
        parts = []
        for qid, q in self.queries.items():
            parts.append(
                d.filter(F.coalesce(self.predicate(q), F.lit(False))).select(
                    F.lit(qid).alias("query_id"), *keep
                )
            )
        return reduce(DataFrame.unionByName, parts)

    def stream(self, stream_df: DataFrame, id_cols: Optional[List[str]] = None) -> DataFrame:
        """Stateless streaming transform: percolate a streaming frame
        (usable directly as a writeStream source)."""
        return self.percolate(stream_df, id_cols)
