"""Deduplication operators for web-scale corpora.

Five strategies, all deterministic so runs are reproducible and
resumable:

- **exact**: group by a content hash (`md5`), keep the smallest id
  per group.  One shuffle on the hash; at 100 TB this is the cheapest
  possible dedup (map-side partial distinct does most of the work).
- **n-gram Jaccard**: exact token-shingle Jaccard over all pairs that
  share at least one shingle.  The shingle self-join is the classic
  "inverted index join" — it shuffles on the shingle key, so hot
  shingles are frequency-capped (``max_shingle_df``) at scale, exactly
  like stopword-pruning a posting list.
- **MinHash + LSH**: 64 permutations banded into 16 bands of 4; band
  buckets become join keys so candidate generation is a hash join, not
  an all-pairs product.  Candidates are then verified with exact
  Jaccard (precision 1.0; recall is the standard LSH S-curve).
- **SimHash**: 64-bit weighted fingerprint; near-dup = Hamming
  distance <= k, found by pigeonhole banding (k+1 bands, exact match
  on one band is necessary), then verified on the full fingerprint.
- **embedding cosine**: near-dup pairs in embedding space (see
  ``opensearch_spark.ops.similarity`` for the top-k variant).

Mirrors the reference engine's shingle/minhash machinery conceptually
(OpenSearch exposes them as analysis filters: ``ShingleTokenFilterFactory``,
``MinHashTokenFilter`` in ``modules/analysis-common``) but as corpus-level
dedup operators rather than per-field analyzers.
"""

from __future__ import annotations

from typing import Iterator, Optional, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from opensearch_spark.analysis import analyzer as ana


def tokens_col(text_col: str = "text"):
    """Standard-analyzer tokens as an ``array<string>`` column."""
    return ana.make_tokenize_udf(None)(F.col(text_col))


# --------------------------------------------------------------- exact

def exact_duplicates(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exact dedup by content hash.

    Returns ``(id, group_key, group_size, dup_rank, is_canonical)``;
    the canonical doc of each group is the one with the smallest id.
    One shuffle (on the hash); rank via a window over the hash key.
    """
    h = F.md5(F.col(text_col).cast("binary")).alias("group_key")
    w = Window.partitionBy("group_key").orderBy(F.asc(id_col))
    return (
        df.select(F.col(id_col), h)
        .withColumn("group_size", F.count(F.lit(1)).over(Window.partitionBy("group_key")))
        .withColumn("dup_rank", F.row_number().over(w))
        .withColumn("is_canonical", (F.col("dup_rank") == 1))
    )


def fingerprint_duplicates(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", prefix: int = 6
) -> DataFrame:
    """Near-exact dedup on a normalized fingerprint: md5 of the first
    ``prefix`` analyzer tokens.  Catches boilerplate/prefix duplicates
    that byte-exact hashing misses."""
    toks = tokens_col(text_col)
    key = F.md5(F.array_join(F.slice(toks, 1, prefix), " ").cast("binary"))
    d = df.select(F.col(id_col), key.alias("group_key"))
    w = Window.partitionBy("group_key").orderBy(F.asc(id_col))
    return (
        d.withColumn("group_size", F.count(F.lit(1)).over(Window.partitionBy("group_key")))
        .withColumn("dup_rank", F.row_number().over(w))
        .withColumn("is_canonical", (F.col("dup_rank") == 1))
    )


# ------------------------------------------------------------ shingles

def shingle_sets(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """``(id, shingle)`` distinct token n-gram shingles per document.

    Shingling is a JVM-side transform (no Python): slide over the token
    array with ``transform`` + ``slice`` and explode the distinct set.
    """
    toks = tokens_col(text_col)
    d = df.select(F.col(id_col).alias("_id"), toks.alias("_toks"))
    # guard the short-doc case: sequence(1, 0) DESCENDS in Spark and the
    # resulting slice(start=0) throws — docs with < n tokens must yield
    # an empty shingle set (CaseWhen short-circuits per row)
    grams = F.when(
        F.size("_toks") >= n,
        F.transform(
            F.sequence(F.lit(1), F.size("_toks") - (n - 1)),
            lambda i: F.array_join(F.slice("_toks", i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        d.withColumn("shingle", F.explode(F.array_distinct(grams)))
        .select(F.col("_id").alias(id_col), "shingle")
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: Optional[str] = None,
    bench_text_col: Optional[str] = None,
    min_hits: int = 1,
    exclude_self: bool = True,
) -> DataFrame:
    """Benchmark DECONTAMINATION: flag corpus documents that share at
    least ``min_hits`` distinct token ``n``-grams with any benchmark
    document — the published LLM training-data hygiene step (GPT-3
    appendix C / Llama: 13-gram overlap against held-out eval sets;
    pick ``n`` to match the eval suite's answer length).

    Plan (the 100 TB shape): the benchmark gram set is SMALL (eval
    suites are thousands of docs, not billions) — build it once and
    BROADCAST it against the streaming corpus gram set, count distinct
    shared grams per corpus doc, and left-join the counts back.  The
    corpus is never shuffled against itself and never self-joined; the
    only corpus-keyed exchanges are the per-doc hit count and the
    final count join, both on ``id_col``.

    ``exclude_self`` ignores grams whose benchmark doc id equals the
    corpus doc id, so a benchmark member sitting in the corpus is
    judged only against OTHER benchmark docs (set False when the two
    tables use unrelated id spaces).

    Returns the corpus with ``contam_hits`` (int, distinct shared
    grams) and ``contaminated`` (boolean, hits >= min_hits) appended.
    """
    bid = bench_id_col or id_col
    btx = bench_text_col or text_col
    bg = shingle_sets(benchmark, id_col=bid, text_col=btx, n=n).select(
        F.col(bid).alias("_bench_id"), "shingle"
    )
    cg = shingle_sets(corpus, id_col=id_col, text_col=text_col, n=n)
    joined = cg.join(F.broadcast(bg), "shingle")
    if exclude_self:
        joined = joined.filter(F.col("_bench_id") != F.col(id_col))
    hits = joined.groupBy(id_col).agg(
        F.countDistinct("shingle").alias("contam_hits")
    )
    return (
        corpus.join(hits, id_col, "left")
        .withColumn(
            "contam_hits", F.coalesce(F.col("contam_hits"), F.lit(0)).cast("int")
        )
        .withColumn("contaminated", F.col("contam_hits") >= F.lit(int(min_hits)))
    )


def jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    max_shingle_df: Optional[int] = 1000,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs ``(id_a < id_b, jaccard)``.

    Plan: distinct shingles -> self-join on shingle (the shuffle key) ->
    per-pair intersection count -> join per-doc set sizes (broadcast) ->
    ``J = inter / (|A| + |B| - inter) >= threshold``.

    ``max_shingle_df`` (default **1000**, ON) drops shingles appearing
    in more than that many docs before the join — the skew guard for the
    quadratic blow-up on boilerplate shingles at 100 TB: a shingle with
    df=d contributes d^2/2 join rows, so one boilerplate header shared
    by 10M pages would otherwise emit 5*10^13 pairs.  Same idea as
    hot-term salting, but as a dedup recall/cost trade-off; dropped
    shingles only ever lower the computed intersection, never add false
    positives.  Pass ``None`` to disable (exact small-corpus mode).
    """
    import logging

    from pyspark import StorageLevel

    # ppjoin-style candidate generation instead of the full self-join:
    #
    # (1) PREFIX FILTER — under a global total order of shingles
    #     (lexicographic), any pair with J >= t must share a shingle
    #     within both docs' first ``sz - ceil(t*sz) + 1`` sorted
    #     shingles, so only prefixes are self-joined: join volume drops
    #     by ~(1-t)^2 (t=0.8 -> 25x fewer pair rows).  The prefix is
    #     sliced from the per-doc sorted shingle ARRAY — pure JVM array
    #     ops, no windows, no extra shuffles.
    # (2) SIZE BAND — J <= min(sz)/max(sz): sizes outside [t*sz, sz/t]
    #     are pruned at the join.
    # (3) HOT-SHINGLE CAP (``max_shingle_df``) — applied to the PREFIX
    #     join side only: a df=d shingle would contribute ~((1-t)d)^2
    #     join rows even post-prefix, so boilerplate shingles above the
    #     cap are dropped from candidate generation.  Verification and
    #     the output are TRUE Jaccard; the cap can only miss pairs whose
    #     every shared prefix shingle is hot (recall-only loss, no false
    #     positives).
    # (4) VERIFY — exact intersection computed only for candidates
    #     (explode candidate A-sides, join back on (id_b, shingle)).
    t = float(threshold)
    toks = tokens_col(text_col)
    grams = F.array_distinct(
        F.when(
            F.size("_toks") >= n,
            F.transform(
                F.sequence(F.lit(1), F.size("_toks") - (n - 1)),
                lambda i: F.array_join(F.slice("_toks", i, n), " "),
            ),
        ).otherwise(F.array().cast("array<string>"))
    )
    base = (
        df.select(F.col(id_col).alias("_id"), toks.alias("_toks"))
        .withColumn("_grams", F.array_sort(grams))
        .withColumn("_sz", F.size("_grams"))
        # prefix length: sz - ceil(t*sz) + 1, with a 1e-9 slack so float
        # noise in t*sz can only LENGTHEN the prefix (never breaks the
        # completeness lemma)
        .withColumn(
            "_plen",
            (F.col("_sz") - F.ceil(F.lit(t) * F.col("_sz") - F.lit(1e-9)) + 1).cast("int"),
        )
        .select("_id", "_grams", "_sz", F.slice("_grams", 1, F.col("_plen")).alias("_prefix"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # bounded registry: evicts older pins so repeated dedup calls don't
    # accumulate pinned blocks for the life of the session
    from opensearch_spark.pinned import DEFAULT as _pinned

    _pinned.pin(base)
    prefix = base.select(
        F.col("_id"), F.col("_sz"), F.explode("_prefix").alias("shingle")
    )
    if max_shingle_df is not None:
        logging.getLogger(__name__).info(
            "jaccard_pairs: dropping shingles with df > %d from candidate "
            "generation (skew guard); recall-only loss",
            max_shingle_df,
        )
        sh_all = base.select(F.col("_id"), F.explode("_grams").alias("shingle"))
        hot = (
            sh_all.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("sdf"))
            .filter(F.col("sdf") > max_shingle_df)
            .select("shingle")
        )
        prefix = prefix.join(F.broadcast(hot), "shingle", "anti")
    pa = prefix.select(
        F.col("_id").alias("id_a"), "shingle", F.col("_sz").alias("sz_a")
    )
    pb = prefix.select(
        F.col("_id").alias("id_b"), "shingle", F.col("_sz").alias("sz_b")
    )
    cands = (
        pa.join(pb, "shingle")
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.col("sz_b") * t <= F.col("sz_a"))
            & (F.col("sz_a") * t <= F.col("sz_b"))
        )
        .select("id_a", "id_b", "sz_a", "sz_b")
        .distinct()
    )
    a_sh = base.select(F.col("_id").alias("id_a"), F.explode("_grams").alias("shingle"))
    b_sh = base.select(F.col("_id").alias("id_b"), F.explode("_grams").alias("shingle"))
    inter = (
        cands.join(a_sh, "id_a")
        .join(b_sh, ["id_b", "shingle"])
        .groupBy("id_a", "id_b", "sz_a", "sz_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    j = F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))
    return (
        inter.withColumn("jaccard", F.round(j.cast("double"), 6))
        .filter(F.col("jaccard") >= F.lit(t))
        .select("id_a", "id_b", "jaccard")
    )


# ------------------------------------------------------------- minhash

_MERSENNE = (1 << 61) - 1


def _perm_params(num_perm: int, seed: int = 7) -> tuple:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
    b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
    return a, b


def _hash64_col(col_name: str, hash_fn: str):
    """64-bit hash of a string column.

    ``xxhash64`` (default): raw JVM single-pass hash, full signed 64
    bits — the production path (callers that need a non-negative value,
    like the MinHash permutations, apply ``abs`` themselves; SimHash
    reads raw bits incl. bit 63).
    ``md5``: the first 15 hex chars of md5 as a 60-bit non-negative
    integer — bit-identical in any SQL engine (DuckDB:
    ``('0x' || substr(md5(s), 1, 15))::BIGINT``), which makes the
    whole MinHash/SimHash pipeline exactly replayable by the driver's
    oracle.  Same asymptotics (md5 costs ~2x xxhash per byte)."""
    if hash_fn == "xxhash64":
        return F.xxhash64(col_name)
    if hash_fn == "md5":
        return F.conv(F.substring(F.md5(F.col(col_name)), 1, 15), 16, 10).cast("long")
    raise ValueError(f"unknown hash_fn {hash_fn!r} (xxhash64 | md5)")


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_perm: int = 64,
    seed: int = 7,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """``(id, sig: array<long>)`` MinHash signatures over n-gram shingles.

    Shingle hashing is JVM ``xxhash64`` (or the oracle-replayable
    ``md5`` mode, see ``_hash64_col``); the permutation mins are
    computed in one grouped aggregation of ``num_perm`` JVM ``min``
    expressions over ``(a_i * h + b_i) mod p`` — fully vectorized,
    one shuffle on the doc id.
    """
    a, b = _perm_params(num_perm, seed)
    sh = shingle_sets(df, id_col, text_col, n)
    # the permutation arithmetic needs a non-negative h (md5 mode is
    # non-negative by construction; xxhash64 keeps its historic |.|)
    h = F.abs(_hash64_col("shingle", hash_fn)).cast("decimal(38,0)")
    mins = [
        F.min(
            F.pmod(
                (F.lit(int(a[i])) * h + F.lit(int(b[i]))),
                F.lit(_MERSENNE),
            ).cast("long")
        ).alias(f"m{i}")
        for i in range(num_perm)
    ]
    sig = sh.groupBy(id_col).agg(*mins)
    return sig.select(
        id_col, F.array(*[f"m{i}" for i in range(num_perm)]).alias("sig")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    seed: int = 7,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """MinHash+LSH near-dup pairs, verified with exact Jaccard.

    Banding: ``bands`` buckets of ``num_perm // bands`` signature slots,
    hashed to a join key -> candidate pairs are found with a hash join
    on ``(band, bucket)`` instead of an all-pairs product.  Candidates
    are de-duplicated and verified with exact shingle Jaccard, so the
    output has no false positives (recall follows the LSH S-curve
    ``1 - (1 - J^r)^b``).
    """
    sig = minhash_signatures(df, id_col, text_col, n, num_perm, seed, hash_fn)
    bucket_rows = _minhash_band_rows(sig, id_col, num_perm, bands, hash_fn).select(
        F.col(id_col).alias("_id"), "band", "bucket"
    )
    a = bucket_rows.select(F.col("_id").alias("id_a"), "band", "bucket")
    b = bucket_rows.select(F.col("_id").alias("id_b"), "band", "bucket")
    cands = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    # verify: exact Jaccard restricted to candidate pairs.  Join ORDER
    # matters at scale: explode the (small) candidate set first and
    # probe the shingle table — cands ⋈ a-shingles on id_a, then
    # ⋈ b-shingles on (id_b, shingle) — so the work is
    # O(|candidates| x shingles/doc).  Joining shingles to shingles on
    # the bare shingle key first (then semi-joining candidates) would
    # materialize the full quadratic shingle self-join Catalyst cannot
    # push the pair-key semi-join below — exactly the blow-up LSH
    # exists to avoid (same pattern as jaccard_pairs above).
    sh = shingle_sets(df, id_col, text_col, n)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    inter = (
        cands.join(sh.select(F.col(id_col).alias("id_a"), "shingle"), "id_a")
        .join(sh.select(F.col(id_col).alias("id_b"), "shingle"), ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    j = F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))
    return (
        inter.join(sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a")), "id_a")
        .join(sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b")), "id_b")
        .withColumn("jaccard", F.round(j.cast("double"), 6))
        .filter(F.col("jaccard") >= F.lit(float(threshold)))
        .select("id_a", "id_b", "jaccard")
    )


# ------------------------------------------------------------- simhash

def _simhash_n_bits(hash_fn: str) -> int:
    # md5 mode derives a 60-bit integer (15 hex chars), so only 60
    # fingerprint bits carry signal there; xxhash64 uses all 64
    return 64 if hash_fn == "xxhash64" else 60


def simhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """``(id, simhash: long)`` weighted SimHash per document (64 bits;
    60 in the oracle-replayable ``md5`` hash mode).

    Token hashing is JVM ``xxhash64`` (or ``md5``, ``_hash64_col``);
    the bit-votes are conditional-sum aggregates
    (``sum(bit_j ? +tf : -tf)``) in ONE grouped pass — the same
    pattern as the minhash min-aggregates.  Entirely
    whole-stage-codegen: no Python in the per-token path (the earlier
    per-doc ``applyInPandas`` was one Python call per document — a
    row-at-a-time bottleneck at corpus scale).
    """
    from functools import reduce

    n_bits = _simhash_n_bits(hash_fn)
    toks = (
        df.select(F.col(id_col).alias("_id"), F.explode(tokens_col(text_col)).alias("tok"))
        .groupBy("_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
        .withColumn("h", _hash64_col("tok", hash_fn))
        .select("_id", "h", "tf")
    )
    votes = [
        F.sum(
            F.when(
                F.shiftrightunsigned(F.col("h"), j).bitwiseAND(F.lit(1)) == 1,
                F.col("tf"),
            ).otherwise(-F.col("tf"))
        ).alias(f"v{j}")
        for j in range(n_bits)
    ]
    agg = toks.groupBy("_id").agg(*votes)
    bit_cols = [
        F.when(
            F.col(f"v{j}") > 0, F.shiftleft(F.lit(1).cast("long"), j)
        ).otherwise(F.lit(0).cast("long"))
        for j in range(n_bits)
    ]
    fingerprint = reduce(lambda a, c: a.bitwiseOR(c), bit_cols)
    return agg.select(
        F.col("_id").alias(id_col), fingerprint.alias("simhash")
    )


def simhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Near-dup pairs with SimHash Hamming distance <= ``max_hamming``.

    Pigeonhole banding: split the fingerprint into ``max_hamming + 1``
    bands; any pair within distance k agrees exactly on at least one
    band, so candidates come from an equi-join on ``(band, band_bits)``
    and are verified with ``bit_count(xor)``.
    """
    nb = max_hamming + 1
    width = _simhash_n_bits(hash_fn) // nb
    sig = simhash_signatures(df, id_col, text_col, hash_fn)
    bands = sig.select(
        F.col(id_col).alias("_id"),
        F.col("simhash"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.shiftrightunsigned(F.col("simhash"), bi * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("bits"),
                    )
                    for bi in range(nb)
                ]
            )
        ).alias("bb"),
    ).select("_id", "simhash", "bb.band", "bb.bits")
    a = bands.select(F.col("_id").alias("id_a"), F.col("simhash").alias("sh_a"), "band", "bits")
    b = bands.select(F.col("_id").alias("id_b"), F.col("simhash").alias("sh_b"), "band", "bits")
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        a.join(b, ["band", "bits"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", ham.alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= F.lit(int(max_hamming)))
    )


# ------------------------------------------------- embedding near-dup

def embedding_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """Embedding-cosine near-dup pairs ``(id_a < id_b, cosine)``.

    Brute-force all-pairs (correct baseline; the LSH-bucketed scale
    path is ``similarity.hyperplane_lsh_pairs``).  Dot products are
    JVM-side ``aggregate``/``zip_with`` in float64.
    """
    from opensearch_spark.ops.similarity import dot_col, norm_col

    v = df.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("v")
    ).withColumn("nrm", norm_col("v"))
    a = v.select(F.col(id_col).alias("id_a"), F.col("v").alias("va"), F.col("nrm").alias("na"))
    b = v.select(F.col(id_col).alias("id_b"), F.col("v").alias("vb"), F.col("nrm").alias("nb"))
    cos = dot_col("va", "vb") / (F.col("na") * F.col("nb"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", F.round(cos.cast("double"), 6))
        .filter(F.col("cosine") >= F.lit(float(threshold)))
        .select("id_a", "id_b", "cosine")
    )


# ------------------------------------------------- cluster / survivor selection

def dup_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iters: int = 20,
) -> DataFrame:
    """Connected components over near-dup pairs -> ``(doc_id, canon)``
    with ``canon`` = the minimum doc id in the component — the
    survivor-selection step of a dedup pipeline (keep ``canon``, drop
    every other member).  Rows cover EVERY member of every non-trivial
    component, including the canonical doc itself.

    Algorithm: hash-to-min label propagation WITH label shortcutting —
    each round every node takes the min label over itself and its
    neighbors, then labels are pointer-jumped (``lab := lab(lab)``), so
    the min travels ~2^k hops after k rounds: O(log diameter) rounds on
    any graph, the shuffle-join analog of the large-star/small-star
    doubling trick.  Each round's frame is localCheckpoint()ed so the
    lineage does not grow with iterations (the classic
    iterative-algorithm driver pattern; at 100 TB each round is a few
    groupBys on the already-bucketed pair output, no driver
    materialization beyond the 1-row convergence count).  If the loop
    exits without converging (``max_iters`` too small for a
    pathological chain), a RuntimeError is raised rather than silently
    returning split components — wrong survivor selection must never
    look like success."""
    e = pairs.select(F.col(id_a).alias("s"), F.col(id_b).alias("t"))
    edges = e.unionByName(
        e.select(F.col("t").alias("s"), F.col("s").alias("t"))
    ).localCheckpoint(eager=False)
    labels = (
        edges.select(F.col("s").alias("node"))
        .distinct()
        .withColumn("lab", F.col("node"))
        .localCheckpoint(eager=False)
    )
    converged = False
    for _ in range(max_iters):
        neigh = (
            edges.join(labels, edges["s"] == labels["node"])
            .select(F.col("t").alias("node"), "lab")
        )
        merged = (
            labels.unionByName(neigh)
            .groupBy("node")
            .agg(F.min("lab").alias("lab"))
            .localCheckpoint(eager=False)  # self-joined below: one agg, not two
        )
        # shortcut (pointer jumping): follow the label's own label —
        # min labels propagate exponentially instead of one hop/round
        lab_of_lab = merged.select(
            F.col("node").alias("lab"), F.col("lab").alias("lab2")
        )
        new_labels = (
            merged.join(lab_of_lab, "lab", "left")
            .select(
                "node", F.least(F.col("lab"), F.coalesce("lab2", "lab")).alias("lab")
            )
            .localCheckpoint(eager=False)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.lab") != F.col("o.lab"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"dup_clusters did not converge in {max_iters} rounds — "
            "raise max_iters (components wider than ~2^max_iters hops)"
        )
    return labels.select(F.col("node").alias("doc_id"), F.col("lab").alias("canon"))


# ----------------------------------------- persisted incremental MinHash index

def _minhash_band_rows(
    sig: DataFrame, id_col: str, num_perm: int, bands: int, hash_fn: str = "xxhash64"
) -> DataFrame:
    """``(id, band, bucket)`` LSH band-bucket rows from a signature
    frame (shared by the in-memory pair join and the persisted index).
    The default bucket is ``xxhash64`` of the band's signature slice (a
    fixed-width join key); ``md5`` mode keeps the joined slice STRING
    as the bucket — equality semantics are identical (the hash only
    compresses the key) and a SQL oracle can reproduce the string
    exactly."""
    rows_per_band = num_perm // bands

    def _bucket(bi: int):
        joined = F.array_join(
            F.transform(
                F.slice("sig", bi * rows_per_band + 1, rows_per_band),
                lambda c: c.cast("string"),
            ),
            ",",
        )
        # xxhash64 keeps the fixed-width LONG bucket (the persisted
        # index format); md5 mode's string bucket is join-equivalent
        return F.xxhash64(joined) if hash_fn == "xxhash64" else joined

    return sig.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(bi).alias("band"), _bucket(bi).alias("bucket"))
                    for bi in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.bucket")


def write_minhash_index(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_perm: int = 64,
    bands: int = 16,
    seed: int = 7,
    mode: str = "overwrite",
) -> None:
    """Persist the banded MinHash index of a corpus as parquet tables —
    the STANDING dedup state that makes 100 TB dedup incremental:
    index the corpus once, then every new batch probes (and appends to)
    the index instead of re-joining the full corpus against itself.

    Layout: ``<path>/bands`` = (id, band, bucket) partitioned by band
    (bounded fan-out; per-band files keep the probe join's shuffle key
    space split and make per-band compaction natural) and
    ``<path>/sigs`` = (id, sig array<long>) for signature-estimated
    Jaccard verification at probe time — no shingle or text storage.
    ``mode="append"`` adds a new batch to an existing index (same
    n/num_perm/bands/seed required; signatures are deterministic in the
    seed, so index and probe always agree)."""
    import os as _os

    sig = minhash_signatures(docs, id_col, text_col, n, num_perm, seed)
    rows = _minhash_band_rows(sig, id_col, num_perm, bands)
    rows.write.mode(mode).partitionBy("band").parquet(_os.path.join(path, "bands"))
    sig.write.mode(mode).parquet(_os.path.join(path, "sigs"))


def probe_minhash_index(
    spark,
    path: str,
    new_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.8,
    seed: int = 7,
    append: bool = False,
) -> DataFrame:
    """Probe a persisted MinHash index with a NEW batch: returns
    ``(new_id, indexed_id, est_jaccard)`` pairs with
    ``est_jaccard`` = the fraction of matching signature slots (the
    standard unbiased MinHash Jaccard estimator) ``>= threshold``.

    The candidate join is a hash join of the batch's band rows against
    the index's — O(batch x collisions), never O(corpus^2) and never
    re-reading corpus text.  With ``append=True`` the batch's rows are
    added to the index afterwards, so subsequent batches dedup against
    it too (the incremental-ingest loop: probe -> drop dups ->
    append survivors)."""
    import os as _os

    sig_new = minhash_signatures(new_docs, id_col, text_col, n, num_perm, seed)
    rows_new = _minhash_band_rows(sig_new, id_col, num_perm, bands)
    idx_rows = spark.read.parquet(_os.path.join(path, "bands"))
    idx_sigs = spark.read.parquet(_os.path.join(path, "sigs"))
    cands = (
        rows_new.select(F.col(id_col).alias("new_id"), "band", "bucket")
        .join(
            idx_rows.select(F.col(id_col).alias("indexed_id"), "band", "bucket"),
            ["band", "bucket"],
        )
        .select("new_id", "indexed_id")
        .distinct()
    )
    est = F.aggregate(
        F.zip_with(
            "sig_a", "sig_b", lambda x, y: F.when(x == y, 1).otherwise(0)
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    ).cast("double") / F.lit(float(num_perm))
    out = (
        cands.join(
            sig_new.select(F.col(id_col).alias("new_id"), F.col("sig").alias("sig_a")),
            "new_id",
        )
        .join(
            idx_sigs.select(
                F.col(id_col).alias("indexed_id"), F.col("sig").alias("sig_b")
            ),
            "indexed_id",
        )
        .withColumn("est_jaccard", F.round(est, 6))
        .filter(F.col("est_jaccard") >= F.lit(float(threshold)))
        .select("new_id", "indexed_id", "est_jaccard")
    )
    if append:
        out = out.localCheckpoint()  # materialize BEFORE the index grows
        write_minhash_index(
            new_docs, path, id_col, text_col, n, num_perm, bands, seed, mode="append"
        )
    return out


def semantic_dedup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nlist: int = 16,
    threshold: float = 0.95,
    centroids=None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning
    at web-scale through semantic deduplication"): coarse k-means
    clustering, then WITHIN-CLUSTER cosine near-dup groups, keeping
    from each group the member LEAST similar to its cluster centroid
    (the paper's keep-low rule — edge examples preserve diversity;
    ties break to the smaller id).

    Scale shape: the quadratic pair step joins on ``cell`` so each
    block is (corpus/nlist)^2, never corpus^2 — exactly the paper's
    web-scale trick; centroids come from the bounded deterministic
    sample (`similarity._centroid_matrix`) or are passed in
    (computed once per corpus at 100 TB).

    Returns ``(id, cell, centroid_cos, keep)`` over EVERY input row —
    ``keep=False`` only for non-survivor members of a dup group.
    """
    from opensearch_spark.ops.similarity import (
        _centroid_matrix,
        assign_ivf_cells,
        dot_col,
        norm_col,
    )

    cn = (
        centroids if centroids is not None
        else _centroid_matrix(df, nlist, id_col, vec_col)
    )
    spark = df.sparkSession
    cells = assign_ivf_cells(df, nlist, id_col, vec_col, centroids=cn)
    cent_df = spark.createDataFrame(
        [(int(i), [float(x) for x in row]) for i, row in enumerate(cn)],
        "cell int, cvec array<double>",
    )
    base = (
        cells.select(
            F.col(id_col).alias("id"), F.col("cell").cast("int").alias("cell"),
            F.col(vec_col).cast("array<double>").alias("v"),
        )
        .withColumn("nrm", norm_col("v"))
        .join(F.broadcast(cent_df), "cell")
        .withColumn(
            "centroid_cos",
            F.round(
                (dot_col("v", "cvec")
                 / (F.col("nrm") * norm_col("cvec"))).cast("double"), 6),
        )
        .drop("cvec")
    )
    a = base.select(
        "cell", F.col("id").alias("id_a"), F.col("v").alias("va"),
        F.col("nrm").alias("na"),
    )
    b = base.select(
        "cell", F.col("id").alias("id_b"), F.col("v").alias("vb"),
        F.col("nrm").alias("nb"),
    )
    cos = dot_col("va", "vb") / (F.col("na") * F.col("nb"))
    pairs = (
        a.join(b, "cell")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", F.round(cos.cast("double"), 6))
        .filter(F.col("cosine") >= F.lit(float(threshold)))
        .select("id_a", "id_b")
    )
    comp = dup_clusters(pairs)  # (doc_id, canon) over non-trivial groups
    members = base.select("id", "cell", "centroid_cos").join(
        comp.select(F.col("doc_id").alias("id"), "canon"), "id", "left"
    )
    # rank only inside real dup groups: routing the (dominant) solo
    # rows through a canon=NULL window partition would funnel the
    # whole corpus into one task — they keep rk=1 without a shuffle
    w = Window.partitionBy("canon").orderBy(
        F.asc("centroid_cos"), F.asc("id")
    )
    grouped = members.filter(F.col("canon").isNotNull()).withColumn(
        "rk", F.row_number().over(w)
    )
    solo = members.filter(F.col("canon").isNull()).withColumn(
        "rk", F.lit(1)
    )
    return grouped.unionByName(solo).select(
        "id", "cell", "centroid_cos", (F.col("rk") == 1).alias("keep")
    )
