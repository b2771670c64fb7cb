"""Resize APIs: ``_clone`` / ``_shrink`` / ``_split`` without reindexing.

Reference: ``action/admin/indices/shrink/TransportResizeAction.java``
(one transport action, ``ResizeType.java`` CLONE/SHRINK/SPLIT) +
``cluster/metadata/IndexMetadata.java:743-749`` (``routingFactor =
routingNumShards / numberOfShards`` — shard counts across a resize must
stay factor-related so routing remains consistent) +
``index/shard/ShardSplittingQuery.java`` (split recovers each target
shard from a full copy of its source shard and deletes the docs whose
new routing lands elsewhere — data files are reused, never reindexed).

Spark mapping.  Our "shard" is the routing segment (``builder._route_expr``:
``pmod(xxhash64(routing_col), n_segments)``) and query semantics never
depend on which segment a doc landed in — scoring uses GLOBAL stats
(SURVEY.md §4.6), the posting-block ``_seg`` column only drives WAND's
segment-aligned score bounds (any partition of the docs gives correct,
merely differently-tight bounds), and tombstones key on global docids.
So the whole resize family is **O(file-count) metadata**: hardlink every
file of the index commit into the target directory and rewrite
``plan.json`` with the new logical segment count.

* ``clone``: same segment count, new index identity.
* ``shrink`` to a factor ``n`` of ``N``: docs with ``hash % N == s``
  have ``hash % n == s % n`` (``n`` divides ``N``), so the existing
  physical layout IS a valid — finer — partition of the new routing.
  The reference's equivalent invariant is routingFactor integrality.
* ``split`` to a multiple: each new routing class is a subset of
  exactly one old segment (``hash % N == t % N`` for target class
  ``t``), the same containment ``ShardSplittingQuery`` relies on; the
  physical blocks simply stay at the coarser granularity.

At 100 TB this matters: the reference resizes terabyte shards by
hardlink + per-shard delete instead of reindexing, and this port keeps
that property — zero data bytes moved, one JSON rewrite.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Dict

from pyspark.sql import SparkSession

from opensearch_spark.index.builder import _paths
from opensearch_spark.index.snapshot import _walk_index


def _load_plan(index_dir: str) -> Dict:
    with open(_paths(index_dir)["plan"]) as f:
        return json.load(f)


def _hardlink_commit(src_dir: str, dst_dir: str) -> int:
    """Hardlink every file of the source index commit into ``dst_dir``
    (copy across devices).  Excludes transient members (``_pits``,
    snapshot working dirs) by construction — ``_walk_index`` enumerates
    only the commit: data, dictionary, manifests, deletes, plan, stats."""
    if os.path.exists(os.path.join(dst_dir, "plan.json")):
        raise ValueError(f"resize target {dst_dir!r} already holds an index")
    n = 0
    for rel in _walk_index(src_dir):
        src = os.path.join(src_dir, rel)
        dst = os.path.join(dst_dir, rel)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        try:
            os.link(src, dst)
        except OSError:
            shutil.copyfile(src, dst)
        n += 1
    return n


def _resize(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    op: str,
    target_segments: int,
) -> Dict:
    plan = _load_plan(src_dir)
    n = int(plan["n_segments"])
    t = int(target_segments)
    if t < 1:
        raise ValueError(f"target_segments must be >= 1, got {t}")
    if plan.get("incremental"):
        # appends compute their segment-id range from n_segments
        # (streaming/incremental.py seg_base); changing the modulus under
        # an appendable index would let a future batch collide with
        # committed segment ids — the reference likewise requires the
        # resize source to be read-only (TransportResizeAction blocks
        # writes before resizing)
        raise ValueError("cannot resize an incremental (appendable) index")
    if op == "shrink" and n % t != 0:
        raise ValueError(
            f"shrink target {t} must be a factor of {n} "
            "(IndexMetadata.getRoutingFactor integrality)"
        )
    if op == "split" and (t % n != 0 or t <= n):
        raise ValueError(
            f"split target {t} must be a multiple of (and greater than) {n}"
        )
    if op == "clone" and t != n:
        raise ValueError(f"clone keeps the segment count ({n}), got {t}")
    files = _hardlink_commit(src_dir, dst_dir)
    plan["n_segments"] = t
    resized = plan.get("resized", [])
    resized.append({"op": op, "from": n, "to": t, "source": os.path.abspath(src_dir)})
    plan["resized"] = resized
    p = _paths(dst_dir)
    tmp = p["plan"] + ".tmp"
    # the hardlinked plan.json shares its inode with the source — never
    # write through it; replace the link atomically
    os.unlink(p["plan"])
    with open(tmp, "w") as f:
        json.dump(plan, f, indent=1)
    os.replace(tmp, p["plan"])
    return {"op": op, "from_segments": n, "to_segments": t, "files_linked": files}


def clone_index(spark: SparkSession, src_dir: str, dst_dir: str) -> Dict:
    """``_clone`` (ResizeType.CLONE): a new index identity over the same
    commit — hardlinked files, independent future mutations (tombstone
    appends / compactions in either directory create new files and
    never write through shared inodes)."""
    return _resize(spark, src_dir, dst_dir, "clone", _load_plan(src_dir)["n_segments"])


def shrink_index(
    spark: SparkSession, src_dir: str, dst_dir: str, target_segments: int
) -> Dict:
    """``_shrink`` (ResizeType.SHRINK): reduce the routing segment count
    to a factor of the current one without touching data files."""
    return _resize(spark, src_dir, dst_dir, "shrink", target_segments)


def split_index(
    spark: SparkSession, src_dir: str, dst_dir: str, target_segments: int
) -> Dict:
    """``_split`` (ResizeType.SPLIT): raise the routing segment count to
    a multiple of the current one without touching data files
    (ShardSplittingQuery's containment property: every new routing class
    is a subset of one old segment)."""
    return _resize(spark, src_dir, dst_dir, "split", target_segments)
