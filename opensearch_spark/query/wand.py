"""Block-max WAND-style pruning for bulk top-k scoring.

The reference prunes posting blocks whose impact upper bound cannot
reach the current k-th score (Lucene block-max WAND via
``TopDocsCollectorContext.java:350-374`` with the ``totalHitsThreshold``
default 10000; SURVEY.md §4.4).  Catalyst has no mid-scan top-k
termination, so we re-express the idea as a *two-pass bulk* algorithm
over block metadata — a data-layout optimization, not a Catalyst rule:

Pass 0 (metadata only): per-block upper bound
    ``ub_t(b) = score(max_tf_b, dl(min_norm_b))``
  and per-term global bound ``gub_t = max_b ub_t(b)`` — computed
  JVM-side from the block columns (max_tf, min_norm); the packed binary
  columns are never touched (Parquet column pruning keeps them unread).

Pass 1 (sample): decode only the top few blocks per term by ``ub``;
  their per-doc partial sums are LOWER bounds of true scores (missing
  terms only add).  ``t`` = k-th best partial sum.

Pass 2 (prune + exact): decode only blocks with
    ``ub_t(b) + sum_{t' != t} gub_t' >= t``.

Safety proof (rank-identical top-k): if a block is pruned, every doc in
it has true score ``< t`` even with maximal help from all other terms.
Contrapositive: any doc with true score ``>= t`` has ALL its blocks
kept, so its pass-2 score is exact.  Pass 1 guarantees at least k docs
with true score ``>= t``.  Hence the top-k of the pass-2 docs with
score ``>= t`` is the exact top-k, exactly scored.  Docs with a pruned
contribution may be under-scored but are filtered by ``>= t`` and
provably below rank k.

At 100 TB this is the difference between decoding a stopword's
billion-doc posting list and decoding a few hundred blocks: the prune
predicate is evaluated on block *metadata* (tiny columnar scan), and
skipped blocks never leave Parquet.
"""

from __future__ import annotations

import math
from typing import Dict, List, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from opensearch_spark.query import bm25


def block_bounds_df(index, terms: List[str], idf_by_term: Dict[str, float], avgdl: float,
                    k1: float, b: float) -> DataFrame:
    """Block metadata + upper-bound score, no binary columns touched."""
    idf_map = F.create_map(
        *[x for t in terms for x in (F.lit(t), F.lit(float(idf_by_term[t])))]
    )
    post = index.postings()
    if "_seg" not in post.columns:
        # merged/compacted layout (merge._PACK_SCHEMA) has no segment
        # column; one global pseudo-segment keeps the segment-aligned
        # bound SAFE (it degrades to the global bound — coarser, never
        # wrong; the asymmetric rare-bucket bound is unaffected)
        post = post.withColumn("_seg", F.lit(0))
    blocks = (
        post.filter(F.col("term").isin(list(terms)))
        .select("term", "_seg", "block_id", "base_doc", "last_doc", "max_tf", "min_norm")
    )
    dl_ub = bm25.norm_decode_col(F.col("min_norm"))
    ub = bm25.term_score_col(
        F.col("max_tf"), idf_map[F.col("term")], dl_ub, avgdl, k1, b
    ).cast("double")
    return blocks.withColumn("ub", ub)


def metadata_threshold(engine, present, weights, idf_by_term, avgdl, k: int):
    """Rank-safe top-k threshold from BLOCK METADATA ALONE — no posting
    decode, no binary-column IO.

    Each block stores ``(max_tf, max_tf_norm)`` where ``max_tf_norm`` is
    the norm byte of a real doc attaining ``max_tf``; hence
    ``score(max_tf, dl(max_tf_norm))`` is ACHIEVABLE — some doc in the
    block scores at least that from this term alone (OR semantics: other
    terms only add).  Blocks of one term hold disjoint docs, so the k-th
    largest achievable score over a single term's blocks certifies k
    distinct docs with true score >= it.  t = max over terms of that
    k-th value.  Returns None when the column is absent (pre-upgrade
    index) or no term has >= k blocks — callers fall back to the
    decode-sample threshold."""
    from pyspark.sql import Window

    post = engine.index.postings()
    if "max_tf_norm" not in post.columns:
        return None
    idf_map = F.create_map(
        *[x for t in present for x in (F.lit(t), F.lit(float(idf_by_term[t])))]
    )
    w_map = F.create_map(
        *[x for t in present for x in (F.lit(t), F.lit(float(weights[t])))]
    )
    blocks = post.filter(F.col("term").isin(list(present))).select(
        "term", "max_tf", "max_tf_norm"
    )
    ach = (
        bm25.term_score_col(
            F.col("max_tf"),
            idf_map[F.col("term")],
            bm25.norm_decode_col(F.col("max_tf_norm")),
            avgdl,
            engine.k1,
            engine.b,
        ).cast("double")
        * w_map[F.col("term")]
    )
    w = Window.partitionBy("term").orderBy(F.desc("a"))
    kth = (
        blocks.withColumn("a", ach)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == F.lit(int(k)))
        .agg(F.max("a").alias("t"))
        .collect()
    )
    t = kth[0]["t"] if kth else None
    return float(t) if t is not None else None


def pruned_match_topk(
    engine,
    weights: Dict[str, int],
    k: int = 10,
    sample_blocks_per_term: int = 4,
) -> DataFrame:
    """Rank-identical top-k for an OR match using block-max pruning.

    Returns (_docid, score) of the exact top-k candidate superset:
    every returned doc is exactly scored and the true top-k is a prefix
    of this frame ordered by (score desc, _docid) — identical semantics
    to the unpruned scorer restricted to score >= t.
    Falls back to the dense scorer when the sample yields < k docs.
    """
    terms = sorted(weights)
    stats = engine.index.term_stats(terms)
    if stats.empty:
        return engine._empty_scored()
    N = engine.index.stats["doc_count"]
    avgdl = engine.index.stats["avgdl"]
    idf_by_term = {
        t: float(bm25.idf(int(df_), N)) for t, df_ in zip(stats["term"], stats["df"])
    }
    present = [t for t in terms if t in idf_by_term]
    if not present:
        return engine._empty_scored()

    bounds = block_bounds_df(engine.index, present, idf_by_term, avgdl, engine.k1, engine.b)
    n_blocks_total = int(stats["n_blocks"].sum()) if "n_blocks" in stats else 0
    if n_blocks_total > MAX_DRIVER_META_BLOCKS:
        return _pruned_distributed(
            engine, present, weights, idf_by_term, avgdl, bounds, k, sample_blocks_per_term
        )
    # one metadata row per (term, block): collected driver-side — only
    # below MAX_DRIVER_META_BLOCKS; bigger queries take the distributed
    # global-bound path above (no large collect, JVM-side prune filter)
    meta = bounds.select("term", "block_id", "base_doc", "last_doc", "ub").collect()
    import numpy as np

    per: Dict[str, dict] = {}
    for t in present:
        rows = sorted(
            ((r["base_doc"], r["last_doc"], r["ub"], r["block_id"]) for r in meta if r["term"] == t)
        )
        per[t] = {
            "base": np.array([x[0] for x in rows], dtype=np.int64),
            "last": np.array([x[1] for x in rows], dtype=np.int64),
            "ub": np.array([x[2] for x in rows], dtype=np.float64),
            "bid": np.array([x[3] for x in rows], dtype=np.int64),
        }

    t_thresh = metadata_threshold(engine, present, weights, idf_by_term, avgdl, k)
    if t_thresh is None:
        # fallback (pre-upgrade index / tiny posting lists): decode the
        # top-ub sample blocks to establish the threshold
        sample_keys = []
        for t in present:
            order = np.argsort(-per[t]["ub"], kind="stable")[:sample_blocks_per_term]
            sample_keys.extend(
                (t, int(per[t]["bid"][i]), int(per[t]["base"][i])) for i in order
            )
        scored_sample = _score_blocks(engine, present, weights, idf_by_term, avgdl, sample_keys)
        sample_top = (
            scored_sample.orderBy(F.desc("score")).limit(k).collect()
        )
        if len(sample_top) < k:
            # not enough candidates to establish a threshold: dense scoring
            return engine._score_terms_or(weights, required=1)
        t_thresh = float(sample_top[-1]["score"])

    # doc-range-aligned prune predicate (the block-max WAND alignment):
    # a block of term t is kept only if its own bound plus the max bound
    # of each OTHER term's blocks OVERLAPPING its docID range reaches t.
    # Blocks of one term are doc-disjoint and sorted, so the overlap set
    # is a contiguous slice found with two binary searches.
    keep = []
    for t in present:
        bt = per[t]
        align = np.zeros(bt["ub"].size, dtype=np.float64)
        for t2 in present:
            if t2 == t:
                continue
            b2 = per[t2]
            lo = np.searchsorted(b2["last"], bt["base"], side="left")
            hi = np.searchsorted(b2["base"], bt["last"], side="right")
            contrib = np.zeros(bt["ub"].size, dtype=np.float64)
            for i in range(bt["ub"].size):
                if lo[i] < hi[i]:
                    contrib[i] = b2["ub"][lo[i] : hi[i]].max()
            align += contrib * weights[t2]
        total_ub = bt["ub"] * weights[t] + align
        kept = np.nonzero(total_ub >= t_thresh)[0]
        keep.extend((t, int(bt["bid"][i]), int(bt["base"][i])) for i in kept)
    pruned_frac = 1.0 - (len(keep) / max(1, len(meta)))
    if len(keep) / max(1, len(meta)) > MAX_KEPT_FRACTION:
        # little to prune: the two-pass plan can't win — dense scorer
        return engine._score_terms_or(weights, required=1)
    out = _score_blocks(engine, present, weights, idf_by_term, avgdl, keep)
    out = out.filter(F.col("score") >= F.lit(t_thresh))
    # expose the prune rate for benchmarks/tests
    out = out.withColumn("_pruned_frac", F.lit(float(pruned_frac)))
    return out


# above this many block-metadata rows the fine-grained driver-side
# overlap sweep is skipped in favor of the distributed segment-aligned
# prune (no driver materialization of block metadata)
MAX_DRIVER_META_BLOCKS = 4_096

# if the threshold keeps more than this fraction of blocks, pruning
# cannot recoup its second pass — bail to the dense scorer
MAX_KEPT_FRACTION = 0.5

# terms with at most this many posting blocks are "rare": decoded fully
# (cheap) so their exact per-doc scores can bound the frequent terms'
# blocks — the asymmetric WAND split (rare terms drive, frequent terms
# get pruned), the bulk analog of Lucene advancing the frequent
# iterator to the next rare-term candidate
RARE_DECODE_MAX_BLOCKS = 8_192

# a frequent-term block spanning more than this many doc-range buckets
# keeps the conservative global rare bound instead of exploding bucket
# rows (only ever loosens the bound — rank safety is unaffected)
MAX_BUCKET_SPAN = 32

# diagnostics of the most recent distributed prune (blocks kept/total,
# whether the cost gate bailed) — read by bench/tests
LAST_PRUNE_STATS: dict = {}

# kept-key frames above this row count are semi-joined with a shuffle
# instead of broadcast (a driver collect of millions of keys would
# defeat the point of the distributed path)
MAX_BROADCAST_KEPT_KEYS = 1_000_000


def _pruned_distributed(
    engine, present, weights, idf_by_term, avgdl, bounds: DataFrame, k: int,
    sample_blocks_per_term: int,
) -> DataFrame:
    """Scale path: no per-block driver collect — the doc-range
    alignment is done at SEGMENT granularity entirely in-plan.

    Doc IDs are segment-contiguous (builder: segment offset + local
    ordinal), so a posting block never spans segments and every block
    of another term that can overlap block b's doc range lives in the
    SAME segment.  Hence per-(term, segment) max bounds
    ``gub_{t,g} = max ub over t's blocks in segment g`` give a prune
    predicate that is strictly tighter than the global-bound variant
    and still rank-safe:

        keep b (term t, segment g)  iff
        ub_b * w_t + sum_{t' != t} w_t' * gub_{t',g}  >=  t_thresh

    The per-(term, segment) table is |terms| x n_segments rows — a
    broadcast-joined metadata aggregate, never collected.  Pass 2
    decodes only kept blocks; every returned doc is exactly scored and
    docs with a pruned contribution are provably below t_thresh (the
    same safety proof as the module docstring, with segment-max in
    place of range-max)."""
    from pyspark.sql import Window

    t_thresh = metadata_threshold(engine, present, weights, idf_by_term, avgdl, k)
    if t_thresh is None:
        # fallback: decode-sample threshold (pre-upgrade index layout)
        w = Window.partitionBy("term").orderBy(F.desc("ub"), F.asc("block_id"))
        sample_blocks = (
            bounds.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= sample_blocks_per_term)
            .drop("_rn", "ub")
        )
        sample_scored = _score_block_frame(engine, present, weights, idf_by_term, avgdl, sample_blocks)
        sample_top = sample_scored.orderBy(F.desc("score")).limit(k).collect()
        if len(sample_top) < k:
            return engine._score_terms_or(weights, required=1)
        t_thresh = float(sample_top[-1]["score"])

    w_map = F.create_map(*[x for t in present for x in (F.lit(t), F.lit(float(weights[t])))])

    # ---- asymmetric split: decode RARE terms fully, prune FREQUENT ----
    # rare terms (small posting lists) are decoded exactly; their
    # per-doc partial scores, max-aggregated over doc-range buckets,
    # bound what any doc inside a frequent-term block's range can gain
    # from the rare terms — the bulk analog of Lucene's WAND advancing
    # 'the' to the next 'zebra' candidate.  This is where real pruning
    # comes from on multi-term queries: a frequent block survives only
    # if its OWN bound plus the best rare score IN ITS DOC RANGE reaches
    # the threshold.
    n_blocks_by_term = {}
    try:
        st = engine.index.term_stats(present)
        n_blocks_by_term = {
            t: int(nb) for t, nb in zip(st["term"], st["n_blocks"])
        }
    except Exception:
        pass
    # the split is RELATIVE: a term is "rare" when decoding it is cheap
    # both absolutely (<= RARE_DECODE_MAX_BLOCKS) and relative to the
    # query (< total/4 blocks) — so 'the error' classifies 'the' as
    # frequent at ANY corpus size, and balanced queries (no asymmetry
    # to exploit) fall through to the homogeneous segment-bound path
    total_blocks = sum(n_blocks_by_term.values()) or 1
    rare_cut = min(RARE_DECODE_MAX_BLOCKS, max(64, total_blocks // 4))
    rare = [t for t in present if n_blocks_by_term.get(t, 0) <= rare_cut]
    freq = [t for t in present if t not in set(rare)]

    rare_scored = None
    if rare and freq:
        n_docs_total = int(engine.index.stats.get("n_docs") or 0)
        bucket_w = max(1024, n_docs_total // 65_536)
        rare_blocks = bounds.filter(F.col("term").isin(rare)).select(
            "term", "block_id", "base_doc"
        )
        from pyspark import StorageLevel

        # small by construction (<= RARE_DECODE_MAX_BLOCKS * 128 rows);
        # used twice (bucket maxima + final union) — persist, tracked in
        # the engine's bounded LRU so repeated queries can't accumulate
        # pinned blocks for the life of the session
        rare_scored = engine._pinned.pin(
            _score_block_frame(
                engine, rare, {t: weights[t] for t in rare}, idf_by_term, avgdl, rare_blocks
            ).persist(StorageLevel.MEMORY_AND_DISK)
        )
        rb = (
            rare_scored.groupBy(
                (F.col("_docid") / F.lit(bucket_w)).cast("long").alias("_bkt")
            )
            .agg(F.max("score").alias("rmax"))
        )
        # global rare bound folded in lazily (1-row cross join) — no
        # separate driver action
        rg = rb.agg(F.coalesce(F.max("rmax"), F.lit(0.0)).alias("_rg"))

        fb = bounds.filter(F.col("term").isin(freq))
        span = (F.col("last_doc") / bucket_w).cast("long") - (
            F.col("base_doc") / bucket_w
        ).cast("long")
        narrow = fb.filter(span <= MAX_BUCKET_SPAN)
        wide = (
            fb.filter(span > MAX_BUCKET_SPAN)
            .join(F.broadcast(rg))
            .withColumn("rbound", F.col("_rg"))
            .drop("_rg")
        )
        exploded = narrow.withColumn(
            "_bkt",
            F.explode(
                F.sequence(
                    (F.col("base_doc") / bucket_w).cast("long"),
                    (F.col("last_doc") / bucket_w).cast("long"),
                )
            ),
        )
        narrow_b = (
            exploded.join(F.broadcast(rb), "_bkt", "left")
            .groupBy("term", "_seg", "block_id", "base_doc", "last_doc", "ub")
            .agg(F.coalesce(F.max("rmax"), F.lit(0.0)).alias("rbound"))
        )
        fbounds = narrow_b.unionByName(
            wide.select("term", "_seg", "block_id", "base_doc", "last_doc", "ub", "rbound")
        )
        # other FREQUENT terms still contribute via segment-aligned gubs
        gub_ts = fbounds.groupBy("term", "_seg").agg(F.max("ub").alias("gub"))
        seg_tot = (
            gub_ts.withColumn("wgub", F.col("gub") * w_map[F.col("term")])
            .groupBy("_seg")
            .agg(F.sum("wgub").alias("seg_total"))
        )
        aligned = fbounds.join(F.broadcast(gub_ts), ["term", "_seg"]).join(
            F.broadcast(seg_tot), "_seg"
        )
        keep_pred = (
            F.col("ub") * w_map[F.col("term")]
            + (F.col("seg_total") - F.col("gub") * w_map[F.col("term")])
            + F.col("rbound")
        ) >= F.lit(t_thresh)
    else:
        # homogeneous query (all rare or all frequent): per-(term,
        # segment) bounds; align(t, g) = seg_total(g) - w_t * gub_{t,g}
        gub_ts = bounds.groupBy("term", "_seg").agg(F.max("ub").alias("gub"))
        seg_tot = (
            gub_ts.withColumn("wgub", F.col("gub") * w_map[F.col("term")])
            .groupBy("_seg")
            .agg(F.sum("wgub").alias("seg_total"))
        )
        aligned = (
            bounds.join(F.broadcast(gub_ts), ["term", "_seg"])
            .join(F.broadcast(seg_tot), "_seg")
        )
        keep_pred = (
            F.col("ub") * w_map[F.col("term")]
            + (F.col("seg_total") - F.col("gub") * w_map[F.col("term")])
        ) >= F.lit(t_thresh)
    # metadata-only cost gate: when the threshold prunes little (uniform
    # impact distributions — e.g. a lone hot term whose blocks all look
    # alike), pass 2 would decode ~everything and pay the two-pass
    # overhead for nothing; bail to the single-pass dense scorer.
    frac_row = aligned.agg(
        F.sum(F.when(keep_pred, 1).otherwise(0)).alias("kept"),
        F.count(F.lit(1)).alias("total"),
    ).collect()[0]
    kept_n, total_n = int(frac_row["kept"]), int(frac_row["total"])
    LAST_PRUNE_STATS.clear()
    LAST_PRUNE_STATS.update(
        {"kept_blocks": kept_n, "total_blocks": total_n, "bailed": False}
    )
    if total_n == 0 or kept_n / total_n > MAX_KEPT_FRACTION:
        LAST_PRUNE_STATS["bailed"] = True
        if rare_scored is not None:
            # the dense fallback never reads the rare partials — drop
            # the pinned cache instead of leaking it per bailed query
            rare_scored.unpersist(blocking=False)
        return engine._score_terms_or(weights, required=1)
    kept = aligned.filter(keep_pred).select("term", "block_id", "base_doc")
    # broadcast the kept-key frame only while it is provably small
    # (kept_n is known from the gate); above the cap a plain semi-join
    # shuffles the 3 key columns — never the packed binaries — instead
    # of collecting millions of rows to the driver
    bcast = kept_n <= MAX_BROADCAST_KEPT_KEYS
    if rare_scored is not None:
        f_out = _score_block_frame(
            engine, freq, {t: weights[t] for t in freq}, idf_by_term, avgdl, kept,
            broadcast_keys=bcast,
        )
        out = (
            f_out.unionByName(rare_scored.select("_docid", "score"))
            .groupBy("_docid")
            .agg(F.sum("score").alias("score"))
        )
    else:
        out = _score_block_frame(
            engine, present, weights, idf_by_term, avgdl, kept, broadcast_keys=bcast
        )
    return out.filter(F.col("score") >= F.lit(t_thresh))


def _score_block_frame(
    engine, terms, weights, idf_by_term, avgdl, keys_df: DataFrame,
    broadcast_keys: bool = True,
) -> DataFrame:
    """Decode + exactly score the block rows identified by ``keys_df``
    (term, block_id, base_doc) without collecting them.  With
    ``broadcast_keys`` the 3-column key frame is broadcast so the
    posting scan — whose rows carry the packed binary columns — is
    never shuffled; callers turn it off when the kept set is large
    (the semi-join then shuffles keys, still never the binaries)."""
    keys = keys_df.select("term", "block_id", "base_doc")
    if broadcast_keys:
        keys = F.broadcast(keys)
    blocks = (
        engine.index.postings()
        .filter(F.col("term").isin(list(terms)))
        .join(keys, ["term", "block_id", "base_doc"], "semi")
    )
    return _score_decoded(engine, terms, weights, idf_by_term, avgdl, blocks)


def _score_decoded(engine, terms, weights, idf_by_term, avgdl, blocks: DataFrame) -> DataFrame:
    decoded = engine.index.decode_blocks(blocks)
    w_map = F.create_map(
        *[x for t in terms for x in (F.lit(t), F.lit(int(weights[t])))]
    )
    idf_map = F.create_map(
        *[x for t in terms for x in (F.lit(t), F.lit(float(idf_by_term[t])))]
    )
    per = decoded.withColumn("dl", bm25.norm_decode_col(F.col("norm_byte"))).withColumn(
        "s",
        bm25.term_score_col(
            F.col("tf"), idf_map[F.col("term")], F.col("dl"), avgdl, engine.k1, engine.b
        ),
    )
    return per.groupBy("_docid").agg(
        F.sum(F.col("s").cast("double") * w_map[F.col("term")]).alias("score")
    )


def _score_blocks(engine, terms, weights, idf_by_term, avgdl, keys) -> DataFrame:
    """Decode + exactly score a specific set of (term, block_id,
    base_doc) blocks; per-doc score = sum over decoded contributions."""
    spark = engine.spark
    if not keys:
        return engine._empty_scored()
    keys_df = spark.createDataFrame(
        [(t, int(bid), int(bd)) for t, bid, bd in keys],
        "term string, block_id int, base_doc long",
    )
    blocks = (
        engine.index.postings()
        .filter(F.col("term").isin(list(terms)))
        .join(F.broadcast(keys_df), ["term", "block_id", "base_doc"], "semi")
    )
    decoded = engine.index.decode_blocks(blocks)
    w_map = F.create_map(
        *[x for t in terms for x in (F.lit(t), F.lit(int(weights[t])))]
    )
    idf_map = F.create_map(
        *[x for t in terms for x in (F.lit(t), F.lit(float(idf_by_term[t])))]
    )
    per = decoded.withColumn("dl", bm25.norm_decode_col(F.col("norm_byte"))).withColumn(
        "s",
        bm25.term_score_col(
            F.col("tf"), idf_map[F.col("term")], F.col("dl"), avgdl, engine.k1, engine.b
        ),
    )
    return per.groupBy("_docid").agg(
        F.sum(F.col("s").cast("double") * w_map[F.col("term")]).alias("score")
    )
