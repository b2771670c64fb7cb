"""Index reader: typed access to the index tables + block decoding.

The decode path is the analog of Lucene's postings enumeration: block rows
for the query's terms are scanned (Parquet predicate pushdown prunes by the
``term`` column — blocks are written term-sorted so row-group min/max stats
make this effective), then unpacked Arrow-native in a ``mapInArrow``
into (term, doc_id, tf, norm_byte[, positions]) rows for scoring; the
positions column is built as one ListArray from flat values + offsets,
so the decode does per-BLOCK Python and per-POSTING numpy only.
"""

from __future__ import annotations

import json
import os
from functools import cached_property
from typing import Dict, List, Optional, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from opensearch_spark.analysis import analyzer as ana
from opensearch_spark.index import codec
from opensearch_spark.index.builder import _paths


class InvertedIndex:
    """Handle to an index directory produced by ``build_index``."""

    def __init__(self, spark: SparkSession, index_dir: str):
        self.spark = spark
        self.index_dir = index_dir
        self.paths = _paths(index_dir)

    @cached_property
    def plan(self) -> Dict:
        with open(self.paths["plan"]) as f:
            return json.load(f)

    @cached_property
    def stats(self) -> Dict:
        with open(self.paths["stats"]) as f:
            return json.load(f)

    @cached_property
    def stopwords(self):
        return ana.resolve_stopwords(self.plan["stopwords"])

    # ---- raw tables ----

    def persist(self) -> "InvertedIndex":
        """Pin the index tables in executor memory/disk (the reference's
        filesystem-cache-resident postings; BASELINE.md measures query
        latency warm).  Returns self."""
        from pyspark import StorageLevel

        self.__dict__["_postings_df"] = (
            self.spark.read.parquet(self.paths["postings"])
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        self.__dict__["_docmap_df"] = self.docmap().persist(StorageLevel.MEMORY_AND_DISK)
        self.__dict__["_dictionary_df"] = (
            self.dictionary().persist(StorageLevel.MEMORY_AND_DISK)
        )
        # materialize
        self.__dict__["_postings_df"].count()
        self.__dict__["_docmap_df"].count()
        self.__dict__["_dictionary_df"].count()
        return self

    def unpersist(self) -> "InvertedIndex":
        """Release the pinned tables (the cache-eviction twin of
        :meth:`persist`) — benches that walk multiple index sizes in
        one JVM must drop the previous size's cache or the unroll of
        the next one OOMs the shared local heap."""
        for key in ("_postings_df", "_docmap_df", "_dictionary_df"):
            df = self.__dict__.pop(key, None)
            if df is not None:
                df.unpersist()
        return self

    def postings(self) -> DataFrame:
        cached = self.__dict__.get("_postings_df")
        if cached is not None:
            return self._routed_filter(cached)
        path = self.paths["postings"]
        if not os.path.exists(path):
            # all-empty text field -> zero posting rows -> the _row=p
            # partition was never written; degrade to an empty frame
            # with the unified dataset's schema (builder finalize has
            # the matching guard)
            return self._routed_filter(
                self.spark.read.parquet(self.paths["data"])
                .filter(F.col("_row") == "p")
                .drop("_row")
            )
        return self._routed_filter(self.spark.read.parquet(path))

    # ---- routed search (custom routing -> one-segment pruning) ----

    def _routed_filter(self, df: DataFrame) -> DataFrame:
        seg = self.__dict__.get("_route_seg")
        if seg is None:
            return df
        return df.filter(F.col("_seg") == F.lit(int(seg)))

    def segment_view(self, seg: int) -> "InvertedIndex":
        """A view of this index restricted to one routing segment: the
        postings, docmap and block-metadata scans all carry a pushed
        ``_seg`` predicate, so parquet row-group stats prune everything
        but that segment's files (the build writes per-segment, so the
        column is file-clustered)."""
        v = InvertedIndex(self.spark, self.index_dir)
        v.__dict__["_route_seg"] = int(seg)
        return v

    def routed(self, routing_value) -> "InvertedIndex":
        """Routed search (``_search?routing=`` /
        ``OperationRouting.java:449-475``): hash the routing key with
        the SAME function the builder routes docs by
        (``builder._route_expr``: xxhash64 mod n_segments, literal cast
        to the routing column's type) and restrict the query to that
        one segment.  Term statistics stay GLOBAL (the
        dfs_query_then_fetch contract), so a routed hit scores
        identically to the same doc in an unrouted search — only the
        scan is pruned.  At cluster scale this is the 1-of-N-shards
        fan-out saving custom routing exists for."""
        n = int(self.plan["n_segments"])
        rc = self.plan.get("routing_col")
        lit = F.lit(routing_value)
        dm = self.docmap()
        if rc and rc in dm.columns:
            lit = lit.cast(dm.schema[rc].dataType)
        seg = (
            self.spark.range(1)
            .select(F.pmod(F.xxhash64(lit), F.lit(n)).cast("int").alias("s"))
            .collect()[0]["s"]
        )
        return self.segment_view(seg)

    def block_meta(self) -> DataFrame:
        """Block METADATA columns (no packed binaries), pinned in
        executor memory/disk on first use — the analog of Lucene
        holding skip-list / block-max metadata in heap while postings
        stay on disk (Lucene90PostingsReader skip data + block-max
        impacts; what BMW reads before touching a posting block).  Size
        is ~postings/block_size rows of 7 scalar columns — well under
        1% of the postings bytes — and it turns every WAND metadata
        pass (bounds, achievable threshold, prune predicate) into an
        in-memory columnar scan instead of a parquet walk per
        aggregation.  Lazy: the first pruned query pays the one-time
        materialization."""
        cached = self.__dict__.get("_block_meta_df")
        if cached is not None:
            return cached
        from pyspark import StorageLevel

        post = self.postings()
        cols = ["term", "block_id", "base_doc", "last_doc", "max_tf", "min_norm"]
        if "max_tf_norm" in post.columns:
            cols.append("max_tf_norm")
        if "_seg" in post.columns:
            meta = post.select("_seg", *cols)
        else:
            # merged/compacted layout (merge._PACK_SCHEMA) has no
            # segment column; one global pseudo-segment keeps the
            # segment-aligned bound SAFE (degrades to the global bound —
            # coarser, never wrong)
            meta = post.select(*cols).withColumn("_seg", F.lit(0))
        meta = meta.persist(StorageLevel.MEMORY_AND_DISK)
        self.__dict__["_block_meta_df"] = meta
        return meta

    def docmap(self) -> DataFrame:
        cached = self.__dict__.get("_docmap_df")
        if cached is not None:
            return cached
        # a merged/compacted index references the source docmap instead
        # of copying it (opensearch_spark.index.merge.merge_index)
        d = self.plan.get("docmap_dir") or self.paths["docmap"]
        return self._routed_filter(self.spark.read.parquet(d))

    def dictionary(self) -> DataFrame:
        cached = self.__dict__.get("_dictionary_df")
        if cached is not None:
            return cached
        d = self.spark.read.parquet(self.paths["dictionary"])
        if self.plan.get("incremental"):
            # streaming builds append per-batch deltas; aggregate on read
            # (collapsed to dense rows by merge_index compaction)
            d = d.groupBy("term").agg(
                F.sum("df").cast("long").alias("df"),
                F.sum("total_tf").cast("long").alias("total_tf"),
                F.sum("n_blocks").cast("int").alias("n_blocks"),
            )
        if "tlen" not in d.columns:
            # pre-tlen layouts and incremental delta aggregates: derive
            # the length column (no row-group stats, semantics identical)
            d = d.withColumn("tlen", F.length("term").cast("int"))
        return d

    # ---- query-side helpers ----

    @cached_property
    def _search_chain(self):
        """Resolved query-side chain when the plan carries a custom
        analyzer.  ``search_analyzer`` wins over ``analyzer``
        (TextFieldMapper's search_analyzer mapping setting); None keeps
        the standard fast path."""
        spec = self.plan.get("search_analyzer") or self.plan.get("analyzer")
        if spec is None:
            return None
        from opensearch_spark.analysis import chain

        return chain.Analyzer.from_spec(spec)

    def analyze(self, text: str) -> List[str]:
        """Analyze query text with the index's analyzer config (the query
        and index sides must share the analyzer — MatchQuery semantics,
        unless a ``search_analyzer`` override is configured)."""
        sc = self._search_chain
        if sc is not None:
            return sc.tokens(text)
        return ana.tokenize(text, self.stopwords)

    def term_stats(self, terms: Sequence[str]) -> pd.DataFrame:
        """df/total_tf for the given terms (tiny: collected to the driver,
        then broadcast into the scoring plan — the DFS phase analog).
        Per-term results are memoized driver-side (the reference caches
        term statistics in the query cache; an immutable index makes
        this always-valid)."""
        if not terms:
            return pd.DataFrame({"term": [], "df": [], "total_tf": [], "n_blocks": []})
        cache = self.__dict__.setdefault("_term_stats_cache", {})
        want = sorted(set(terms))
        missing = [t for t in want if t not in cache]
        if missing:
            rows = (
                self.dictionary()
                .filter(F.col("term").isin(missing))
                .select("term", "df", "total_tf", "n_blocks")
                .collect()
            )
            for r in rows:
                cache[r["term"]] = (int(r["df"]), int(r["total_tf"]), int(r["n_blocks"]))
            for t in missing:
                cache.setdefault(t, None)  # negative cache: absent term
        hit = [(t, cache[t]) for t in want if cache[t] is not None]
        return pd.DataFrame(
            {
                "term": [t for t, _ in hit],
                "df": [v[0] for _, v in hit],
                "total_tf": [v[1] for _, v in hit],
                "n_blocks": [v[2] for _, v in hit],
            }
        )

    def postings_for_terms(
        self, terms: Sequence[str], with_positions: bool = False
    ) -> DataFrame:
        """Decode posting blocks for ``terms`` -> DataFrame
        (term, _docid, tf, norm_byte[, positions array]).

        The ``term isin`` filter is pushed down into the Parquet scan of
        the block table; only matching blocks are decoded.
        """
        terms = sorted(set(terms))
        if not terms:
            return self._empty_postings(with_positions)
        blocks = self.postings().filter(F.col("term").isin(terms))
        return self.decode_blocks(blocks, with_positions)

    def decode_blocks(
        self, blocks: DataFrame, with_positions: bool = False
    ) -> DataFrame:
        """Unpack an arbitrary block-row DataFrame (e.g. a WAND-pruned
        subset) into per-posting rows."""
        cols = ["term", "base_doc", "n_docs", "docs_bin", "tfs_bin", "norms_bin"]
        if with_positions:
            cols.append("pos_bin")
        blocks = blocks.select(*cols)

        fields = [
            T.StructField("term", T.StringType()),
            T.StructField("_docid", T.LongType()),
            T.StructField("tf", T.IntegerType()),
            T.StructField("norm_byte", T.IntegerType()),
        ]
        if with_positions:
            fields.append(T.StructField("positions", T.ArrayType(T.LongType())))
        schema = T.StructType(fields)

        bc = codec.get_codec(self.plan.get("codec", "varint"))
        out_names = [f.name for f in fields]

        def decode(batches):
            # Arrow-native decode: per-BLOCK Python (thousands of rows),
            # per-POSTING numpy only.  The positions column is assembled
            # as ONE ListArray from flat values + offsets — no per-doc
            # Python list slicing and no pandas object-column round-trip
            # (that slicing was ~55% of a position query's wall time on
            # a 4M-turn corpus).
            import pyarrow as pa

            for rb in batches:
                nb = rb.num_rows
                if nb == 0:
                    continue
                names = rb.schema.names
                col = lambda nm: rb.column(names.index(nm))
                terms_b = col("term").to_pylist()
                bases = col("base_doc").to_pylist()
                nds = col("n_docs").to_pylist()
                docs_bins = col("docs_bin").to_pylist()
                tfs_bins = col("tfs_bin").to_pylist()
                norms_bins = col("norms_bin").to_pylist()
                pos_bins = col("pos_bin").to_pylist() if with_positions else None
                doc_p, tf_p, norm_p, term_p = [], [], [], []
                pv_p, pl_p = [], []
                pv_total = 0

                def flush():
                    arrays = [
                        pa.array(np.concatenate(term_p), type=pa.string()),
                        pa.array(np.concatenate(doc_p), type=pa.int64()),
                        pa.array(np.concatenate(tf_p), type=pa.int32()),
                        pa.array(np.concatenate(norm_p), type=pa.int32()),
                    ]
                    if with_positions:
                        lens = np.concatenate(pl_p)
                        offsets = np.concatenate(([0], np.cumsum(lens))).astype(
                            np.int32
                        )
                        arrays.append(
                            pa.ListArray.from_arrays(
                                pa.array(offsets, type=pa.int32()),
                                pa.array(np.concatenate(pv_p), type=pa.int64()),
                            )
                        )
                    return pa.RecordBatch.from_arrays(arrays, names=out_names)

                for j in range(nb):
                    n = int(nds[j])
                    gaps = bc.decode(docs_bins[j], n).astype(np.int64)
                    docs = np.cumsum(gaps) + np.int64(bases[j])
                    tfs = bc.decode(tfs_bins[j], n).astype(np.int64)
                    norms = np.frombuffer(norms_bins[j], dtype=np.uint8)
                    doc_p.append(docs)
                    tf_p.append(tfs.astype(np.int32))
                    norm_p.append(norms.astype(np.int32))
                    term_p.append(np.repeat(terms_b[j], n))
                    if with_positions:
                        npos = int(tfs.sum())
                        deltas = bc.decode(pos_bins[j], npos)
                        pv_p.append(
                            codec.positions_from_deltas(deltas, tfs).astype(
                                np.int64
                            )
                        )
                        pl_p.append(tfs)
                        pv_total += npos
                        # ListArray offsets are int32: flush well before
                        # 2^31 total positions (also bounds memory)
                        if pv_total >= (1 << 28):
                            yield flush()
                            doc_p, tf_p, norm_p, term_p = [], [], [], []
                            pv_p, pl_p = [], []
                            pv_total = 0
                if doc_p:
                    yield flush()

        return blocks.mapInArrow(decode, schema=schema)

    def _empty_postings(self, with_positions: bool) -> DataFrame:
        fields = "term string, _docid long, tf int, norm_byte int"
        if with_positions:
            fields += ", positions array<long>"
        return self.spark.createDataFrame([], fields)
