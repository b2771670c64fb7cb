"""Document lifecycle: soft deletes, delete-by-query, reindex,
update-by-query (SURVEY.md §2.1).

The reference deletes documents with tombstones (Lucene soft deletes)
that hide docs from search immediately but leave postings untouched
until a merge expunges them; ``_delete_by_query`` /
``_update_by_query`` / ``_reindex`` are scroll+bulk jobs over that
machinery (``modules/reindex/.../Reindexer.java``,
``AbstractAsyncBulkByScrollAction.java``).  Spark-first mapping:

- **tombstones**: a ``deletes/`` parquet of ``_docid`` rows next to the
  index; the reader anti-joins it lazily.  Corpus statistics (df, N,
  avgdl) intentionally do NOT change until compaction — exactly the
  reference's semantics where deleted docs still count until merge.
- **expunge**: ``merge_index`` drops tombstoned postings during the
  repack and rewrites the docmap/stats without them.
- **reindex / update_by_query**: read -> transform -> rebuild (or
  delete + stream-append) — plain DataFrame jobs.
"""

from __future__ import annotations

import json
import os
import time
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from opensearch_spark.index.builder import IndexConfig, build_index, _paths


def deletes_dir(index_dir: str) -> str:
    return os.path.join(index_dir, "deletes")


def delete_by_query(engine, query) -> int:
    """Soft-delete every doc matching ``query`` (tombstone append).
    Returns the number of newly deleted docs.  Idempotent: re-running
    the same delete appends already-deleted ids which the distinct
    read-side union ignores."""
    ddir = deletes_dir(engine.index.index_dir)
    matched = engine._score_with_deletes_applied(query).select("_docid")
    n = matched.count()
    matched.write.mode("append").parquet(ddir)
    with open(os.path.join(ddir, f"_delete-{int(time.time()*1000)}.json"), "w") as f:
        json.dump({"deleted": n}, f)
    return n


def tombstone_docids(spark: SparkSession, index_dir: str) -> Optional[DataFrame]:
    """The tombstone set (the DELETED ``_docid`` rows), or None when
    nothing was ever deleted.  (Renamed from the r2 ``live_docids`` —
    that name said the opposite of what it returns and invited an
    inverted join; the alias below keeps old callers working.)"""
    ddir = deletes_dir(index_dir)
    if not os.path.isdir(ddir):
        return None
    files = [f for f in os.listdir(ddir) if f.endswith(".parquet") or "part-" in f]
    if not files:
        return None
    return spark.read.parquet(ddir).select("_docid").distinct()


def reindex(
    spark: SparkSession,
    src_docs: DataFrame,
    dst_index_dir: str,
    cfg: Optional[IndexConfig] = None,
    transform: Optional[Callable[[DataFrame], DataFrame]] = None,
) -> dict:
    """``_reindex``: read source docs, optionally transform, build the
    destination index (scroll-read + bulk-write collapses to one
    DataFrame job; Iceberg snapshot reads give the PIT semantics)."""
    if transform is not None:
        src_docs = transform(src_docs)
    return build_index(spark, src_docs, dst_index_dir, cfg or IndexConfig())


def update_by_query(
    spark: SparkSession,
    engine,
    query,
    transform: Callable[[DataFrame], DataFrame],
    dst_index_dir: str,
    cfg: Optional[IndexConfig] = None,
) -> dict:
    """``_update_by_query``: rebuild the index with ``transform`` applied
    to the docs matching ``query`` (non-matching docs unchanged).  An
    immutable-segment design updates by rewrite — the reference does the
    same via delete+reindex of each hit.

    Soft-deleted docs are EXCLUDED from the rebuild (r3 fix): the
    reference's scroll+bulk only ever sees live docs, so a tombstoned
    doc must not be resurrected by an unrelated update — the rewritten
    index starts with no tombstones and no deleted content."""
    dm = engine.index.docmap()
    dels = tombstone_docids(spark, engine.index.index_dir)
    if dels is not None:
        dm = dm.join(F.broadcast(dels), "_docid", "anti")
    matched = engine._score_with_deletes_applied(query).select("_docid")
    src_cols = engine.index.plan.get("input_fields") or [
        c for c in dm.columns if not c.startswith("_") and c not in ("dl", "norm_byte")
    ]
    hit = dm.join(matched, "_docid", "semi").select(*src_cols)
    miss = dm.join(matched, "_docid", "anti").select(*src_cols)
    new_docs = transform(hit).select(*src_cols).unionByName(miss)
    return build_index(spark, new_docs, dst_index_dir, cfg or IndexConfig())


# backwards-compatible alias for the r2 name (misleading; prefer tombstone_docids)
live_docids = tombstone_docids
