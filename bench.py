#!/usr/bin/env python
"""Benchmark harness (BASELINE.md §2 protocol).

Default run (what the driver executes per round):
  1. build the inverted index over sf-scaled synthetic transcripts
     (~sf * 1e6 turns, deterministic seed) -> build throughput;
  2. run the FIXTURES.md §3 query set top-10 against the built index,
     5 timed runs each after warm-up -> per-query median + pooled
     p50/p99;
  3. time a sample of the driver-surface operators (docs/events/
     lineitem tables at $SPARK_GRAFT_SF_DIR).
Prints ONE JSON line:
  {"metric": ..., "value": <total wall sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "build": {...}, ...}

Scaling-evidence mode (the north rule's N -> 4N criterion, evidenced
at two local parallelism levels):
  python bench.py --scaling
runs the identical build at local[8] and local[32] in fresh
subprocesses and reports both throughputs + efficiency
(= (T_32/T_8)/4).  Results are recorded in BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import subprocess
import sys
import tempfile
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# The scale-axis phase serves 100k-, 1M- and 10M-turn indexes from one
# local JVM; 8g (the library default) OOMs during cache unroll of the
# bigger postings.  The box carries 128 GiB — give the bench JVM room.
os.environ.setdefault("SPARK_DRIVER_MEM", "24g")
TURNS_PER_SF = 1_000_000  # sf0.1 -> ~100k turns

# FIXTURES.md §3 query set (reference-semantics DSL)
QUERY_SET = {
    "q1_match_single": {"match": {"text": "handling"}},
    "q2_match_or": {"match": {"text": "error handling"}},
    "q3_match_and": {"match": {"text": {"query": "error handling", "operator": "and"}}},
    "q4_match_msm": {
        "match": {"text": {"query": "error timeout traceback", "minimum_should_match": 2}}
    },
    "q5_term": {"term": {"text": "error"}},
    "q6_term_case": {"term": {"text": "Error"}},
    "q8_match_stopword": {"match": {"text": "the error"}},
    "q9_bool": {
        "bool": {
            "must": [{"match": {"text": "error handling"}}],
            "filter": [{"range": {"ts": {"gte": "2026-01-01 00:30:00"}}}],
            "must_not": [{"term": {"role": "tool"}}],
        }
    },
    "q10_phrase": {"match_phrase": {"text": "error handling"}},
    "q11_dismax": {
        "dis_max": {
            "queries": [{"match": {"text": "timeout"}}, {"match": {"text": "retry"}}],
            "tie_breaker": 0.3,
        }
    },
}

SURFACE_SAMPLE = [
    "ft_match_modes",
    "ft_bool",
    "ft_match_phrase",
    "agg_terms",
    "agg_histograms",
    "agg_lineitem_pricing",
    "dedup_ngram_jaccard",
    "retrieval_suite",
    "text_suite",
    "c4_suite",
]

# VERDICT r2 #10: suite entries are transport envelopes whose operator
# composition can change between rounds; this map records the CURRENT
# composition so round-over-round latency comparisons stay meaningful.
# (Emitted as "surface_composition" in the bench JSON.)
SURFACE_COMPOSITION = {
    "_timing_protocol": "r3 late: 1 untimed warm-up + 1 timed run per surface entry (matches the q-set's warm protocol; earlier rounds timed the cold first run, so r2/early-r3 surface numbers include plan-compile + Python-worker startup)",
    "ft_match_modes": "r3: 4 ops (or [former ft_match_or entry] + and + msm + common_terms); r2 had 2",
    "ft_bool": "2 engine bool queries (unchanged since r2 repack)",
    "ft_match_phrase": "r3: 2 ops (slop0 + sloppy slop=2); r2 had 1",
    "dedup_ngram_jaccard": "r3: 2 ops (pair + connected-component cluster); r2 had pairs only",
    "agg_histograms": "r3 late: 6 ops (+geotile_grid z=5, +geohash_grid p=3); earlier r3/r2 had 4",
    "text_suite": "r3: 4 text ops via single-pass text_profile (one tokenizer eval, no joins); r3 late adds pack_shards training-shard packing (+1 stripe-offset collect) and benchmark decontamination (broadcast 5-gram overlap + count join); r2 joined 4 frames",
    "c4_suite": "NEW r4 late: C4 line/page filters (zero-shuffle project) + corpus-global 3-sentence-span dedup (span-hash groupBy + coverage join) over documents; first timed round",
    "agg_samplers": "r3 late: 9 ops (+hash_split count/idsum, +stratified count/idsum, +mixture count/idsum, +reservoir idsum over documents); earlier had 2 (sampler + diversified)",
    "ft_scoring": "r3 late: 10 ops (+rank_feature log/saturation/sigmoid); earlier had 7; r4: +4 similarity ops (DFR gl/h2, DFR in/b/h1, IB ll, IB spl); late r4: +2 painless ops (painless_score, fs_script function)",
    "ft_prefix_family": "r3 late: 3 ops (+search_as_you_type over root+2gram+3gram subfield indexes, builds 2 extra small indexes on first run); earlier had 2",
    "ft_multi_match": "r3 late: cross_fields now scores with BlendedTermQuery df-blending (same plan shape, +2 tiny term-stats lookups at plan time)",
    "lifecycle_suite": "r3 late: +post_restore phase (snapshot to blob repo + hardlink restore + re-query), then +post_resize phase (hardlink shrink 4->2 + re-query); earlier had 6 phases; see r4 note below",
    "ft_filters": "r3 late: 10 ops (+derived_range typed length(text) range, +derived_term concat expression term — both extra docmap-scan docsets); earlier had 8",
    "agg_metrics": "r3 late: 12 ops (+mapper_size byte-length stats, +mapper_murmur3 pre-hash cardinality — 2 extra documents scans); earlier r3 had 10",
    "ingest_pipeline": "r3 late: +user_agent (uap-core subset CASE chain) and +geoip (inline prefix-map lookup) — same single projection, 5 more output columns",
    "analysis_suite": "r3 late: +annotated op (mapper-annotated-text tokenizer over the 8-doc slice); earlier r3 had 11 chain ops",
    "streaming_percolate": "r3 late: +correlated_error/+correlated_purchase (events-correlation banded time join over the events table); earlier had 2 percolator ops",
    "agg_terms_variants": "r3 late: 9 ops (7 incl. two-phase shard_terms error accounting, then +terms_missing/+terms_mindoc option ops)",
    "agg_terms": "r4 repack: 2 ops (terms + tree, former standalone agg_terms_tree folded in to keep the registry at 50) — one extra events groupBy vs r3's 1-op entry",
    "_r4_phrase_scorer": "ft_match_phrase slop-0 and q10_phrase now run the JVM higher-order-function scorer (no pandas UDF); sloppy slop=2 unchanged",
    "ft_highlight": "r4: 4 ops (whole + fragment windows + score-ordered frags + no_match_size fallback); earlier had 1",
    "suggest_suite": "r4: 10 ops (+comp_field prefix/fuzzy/ctx/regex; late r4 +noisy-channel phrase suggester: stupid_backoff, laplace+highlight, collate); earlier had 3",
    "_r4_lifecycle_suite": "r4: +upd_doc_match phase (one extra throwaway build + 2 single-doc updates); r3 late had 8 phases",
    "sort_suite": "r4 repack: +engine_after op (former standalone sort_search_after_engine; 2 extra engine searches)",
}


def sf_from_dir(sf_dir: str) -> float:
    base = os.path.basename(os.path.normpath(sf_dir))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def n_convs_for_turns(target_turns: int) -> int:
    # conversation lengths cycle 1..12 (mean 6.5 turns/conv)
    return max(1, int(target_turns / 6.5))


def build_phase(spark, sf: float, index_dir: str, n_segments: int, waves: int = 1):
    from opensearch_spark.index.builder import IndexConfig, build_index
    from opensearch_spark.transcripts import generate, n_turns

    target = int(os.environ.get("SPARK_GRAFT_SCALING_TURNS", 0)) or int(
        sf * TURNS_PER_SF
    )
    n_convs = n_convs_for_turns(target)
    from pyspark import StorageLevel

    # persist: the builder makes two passes (routing counts, inversion);
    # on a cluster the second pass re-reads Iceberg — locally we cache so
    # synthetic generation isn't double-counted in build time
    docs = generate(spark, n_convs, partitions=max(CPUS, n_segments)).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    shutil.rmtree(index_dir, ignore_errors=True)
    t0 = time.monotonic()
    stats = build_index(
        spark, docs, index_dir, IndexConfig(n_segments=n_segments), waves=waves
    )
    wall = time.monotonic() - t0
    docs.unpersist()
    return {
        "n_convs": n_convs,
        "turns": n_turns(n_convs),
        "build_wall_sec": round(wall, 3),
        "turns_per_sec": round(n_turns(n_convs) / wall, 1),
        "inner_turns_per_sec": round(stats["turns_per_sec"], 1)
        if stats.get("turns_per_sec")
        else None,
    }


def query_phase(spark, index_dir: str, runs: int = 5):
    from opensearch_spark.index.reader import InvertedIndex
    from opensearch_spark.query.executor import SearchEngine

    # serving config: AQE's per-stage re-planning costs ~0.15s/query on
    # interactive top-k results; it buys nothing on the query path (the
    # plans are tiny and skew-free) — builds keep AQE on
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    idx = InvertedIndex(spark, index_dir).persist()
    eng = SearchEngine(idx)
    per_query = {}
    samples = []
    try:
        for name, q in QUERY_SET.items():
            eng.search(q, size=10).collect()  # warm-up (plans + footers)
            times = []
            for _ in range(runs):
                t0 = time.monotonic()
                eng.search(q, size=10).collect()
                times.append(time.monotonic() - t0)
            per_query[name] = round(statistics.median(times), 4)
            samples.extend(times)
    finally:
        # drop this index's cache before the next (bigger) size unrolls
        idx.unpersist()
    samples.sort()
    return per_query, {
        "p50_sec": round(samples[len(samples) // 2], 4),
        "p99_sec": round(samples[min(len(samples) - 1, int(len(samples) * 0.99))], 4),
    }


WAND_IDX_DIR = os.path.join(tempfile.gettempdir(), "osps_4m_hiskew_idx")
WAND_CONVS = 616_000  # ~4M turns
WAND_CPUS = int(os.environ.get("SPARK_GRAFT_WAND_CPUS", "8"))


def ensure_wand_index(spark):
    """Build (once, cached in /tmp) the WAND evidence corpus: ~4M turns
    where 0.1% of conversations carry strong hot-term bursts — the
    web-text shape where some docs are far better for a term than
    others, concentrated in docID ranges (burst conversations route to
    contiguous docIDs), which is exactly the locality block-max pruning
    exploits.  Built in the PARENT session at full parallelism; the
    measurement itself runs in a reduced-core subprocess."""
    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    from opensearch_spark.index.builder import IndexConfig, build_index
    from opensearch_spark.transcripts import generate

    if os.path.exists(os.path.join(WAND_IDX_DIR, "stats.json")):
        return
    docs = generate(spark, WAND_CONVS, partitions=max(CPUS, 8))
    burst = " error timeout " * 24
    docs = docs.withColumn(
        "text",
        F.when(
            F.pmod(F.xxhash64("conv_id"), F.lit(1000)) == 0,
            F.concat(F.col("text"), F.lit(burst)),
        ).otherwise(F.col("text")),
    ).persist(StorageLevel.DISK_ONLY)
    build_index(spark, docs, WAND_IDX_DIR, IndexConfig(n_segments=32))
    docs.unpersist()


def wand_phase(spark, runs: int = 3):
    """Block-max WAND evidence (VERDICT r2 #4: a measured config where
    pruned beats dense).  The 4M-turn skewed corpus is built once at
    full parallelism; dense vs pruned top-10 latency is then measured
    in a fresh subprocess at local[8] — per-executor economics, where
    block decode (not local-mode scheduling slack) dominates, as it
    does on every executor of a real cluster reading 100 TB.  The
    pruned path costs ONE extra driver action (metadata collect from
    the executor-pinned block_meta frame + numpy threshold/RMQ prune);
    rank identity is asserted in the same run."""
    ensure_wand_index(spark)
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(WAND_CPUS))
    p = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--wand-phase", "--runs", str(runs)],
        env=env,
        capture_output=True,
        text=True,
        cwd=os.path.dirname(os.path.abspath(__file__)),
    )
    lines = [ln for ln in p.stdout.splitlines() if ln.startswith("{")]
    if not lines:
        return {"wand_error": (p.stderr or "no output")[-500:]}
    return json.loads(lines[-1])


def wand_phase_inner(runs: int = 3) -> dict:
    """Subprocess body for --wand-phase (local[SPARK_GRAFT_CPUS])."""
    from opensearch_spark.session import get_spark

    spark = get_spark("bench-wand", shuffle_partitions=max(CPUS, 8))
    spark.sparkContext.setLogLevel("ERROR")
    from opensearch_spark.index.reader import InvertedIndex
    from opensearch_spark.query import wand as _wand
    from opensearch_spark.query.executor import SearchEngine

    eng = SearchEngine(InvertedIndex(spark, WAND_IDX_DIR))
    q = {"match": {"text": "the error"}}
    eng.search(q, size=10, prune=False).collect()  # warm page cache
    eng.search(q, size=10, prune=True).collect()  # warm block_meta pin
    td, tp = [], []
    for _ in range(runs):
        t0 = time.monotonic()
        dense = eng.search(q, size=10, prune=False).collect()
        td.append(time.monotonic() - t0)
        t0 = time.monotonic()
        pruned = eng.search(q, size=10, prune=True).collect()
        tp.append(time.monotonic() - t0)
    ident = [(r["conv_id"], r["turn_idx"]) for r in dense] == [
        (r["conv_id"], r["turn_idx"]) for r in pruned
    ]
    stats = dict(_wand.LAST_PRUNE_STATS)
    with open(os.path.join(WAND_IDX_DIR, "stats.json")) as f:
        idx_stats = json.load(f)
    out = {
        "wand_dense_sec": round(min(td), 4),
        "wand_pruned_sec": round(min(tp), 4),
        "wand_rank_identical": ident,
        "wand_cpus": CPUS,
        "wand_turns": int(idx_stats["n_docs"]),
        "wand_corpus": "0.1% of convs carry 24x hot-term bursts",
    }
    if stats.get("total_blocks"):
        out["wand_blocks_skipped_frac"] = round(
            1.0 - stats["kept_blocks"] / stats["total_blocks"], 3
        )
        out["wand_gate_bailed"] = stats.get("bailed")

    # sloppy-phrase A/B on the same 4M-turn corpus: the Arrow-native
    # lockstep scorer vs the scalar per-doc PhraseQueue simulation
    # (executor.SLOPPY_BATCH_ENABLED), dense-stopword 3-term phrase ->
    # ~1.5M candidate docs.  Results must be identical; only the
    # Python-interpreter ceiling differs.
    from opensearch_spark.query import executor as _ex

    sq = {"match_phrase": {"text": {"query": "the of and", "slop": 4}}}
    eng.search(sq, size=10).collect()  # warm
    tb, ts2 = [], []
    ident2 = True
    saved = _ex.SLOPPY_BATCH_ENABLED
    try:
        for _ in range(max(2, runs - 1)):
            res = {}
            for flag in (True, False):
                _ex.SLOPPY_BATCH_ENABLED = flag
                t0 = time.monotonic()
                rows = eng.search(sq, size=10).collect()
                (tb if flag else ts2).append(time.monotonic() - t0)
                res[flag] = [
                    (r["conv_id"], r["turn_idx"], round(r["score"], 6))
                    for r in rows
                ]
            ident2 = ident2 and res[True] == res[False]
    finally:
        _ex.SLOPPY_BATCH_ENABLED = saved
    out["sloppy_arrow_sec"] = round(min(tb), 4)
    out["sloppy_scalar_sec"] = round(min(ts2), 4)
    out["sloppy_rank_identical"] = ident2
    return out


def surface_phase(spark, sf_dir: str):
    from opensearch_spark import driver_surface
    from opensearch_spark.docs_index import documents_engine

    documents_engine(spark, sf_dir)  # build/warm the docs index untimed
    # warm the Python-UDF worker pool untimed: entries that tokenize via
    # pandas UDFs (dedup/text suites) otherwise pay the one-time
    # worker-spawn + pandas-import cost (~8s at local[32]) in their
    # first call — the r4 artifact's dedup_ngram_jaccard 13.7s anomaly
    # was this cost landing in a timed run on a contended box state
    def _warm(batches):
        import pandas  # noqa: F401  (pay the import inside the worker)

        for pdf in batches:
            yield pdf

    spark.range(256).repartition(CPUS).mapInPandas(
        _warm, "id long"
    ).collect()
    out = {}
    for name in SURFACE_SAMPLE:
        fn = driver_surface.QUERIES[name]
        fn(spark, sf_dir).collect()  # warm-up, untimed — same steady-state
        best = None                  # min of 2 timed runs: transient
        for _ in range(2):           # box stalls can't fake a regression
            t0 = time.monotonic()
            fn(spark, sf_dir).collect()
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 4)
    return out


def msearch_phase(spark, index_dir: str, runs: int = 3) -> dict:
    """_msearch amortization evidence: the full 10-query set unioned
    into ONE plan + ONE collect (rest-api-spec msearch.json).  Spark's
    exchange reuse shares the docmap-broadcast subtree across every
    subquery, so the whole batch costs ~3 jobs instead of ~25 — batched
    wall vs the sequential q-set sum is the coordinator-amortization
    story at cluster scale."""
    from functools import reduce

    from pyspark.sql import DataFrame
    from pyspark.sql import functions as F

    from opensearch_spark.index.reader import InvertedIndex
    from opensearch_spark.query.executor import SearchEngine

    idx = InvertedIndex(spark, index_dir).persist()
    eng = SearchEngine(idx)

    def batch():
        parts = [
            eng.search(q, size=10).withColumn("query_id", F.lit(n))
            for n, q in QUERY_SET.items()
        ]
        return reduce(DataFrame.unionByName, parts)

    try:
        batch().collect()  # warm (plan compile + footers)
        times = []
        for _ in range(runs):
            t0 = time.monotonic()
            batch().collect()
            times.append(time.monotonic() - t0)
    finally:
        idx.unpersist()
    wall = statistics.median(times)
    return {
        "msearch_batch_queries": len(QUERY_SET),
        "msearch_batch_sec": round(wall, 4),
        "msearch_per_query_sec": round(wall / len(QUERY_SET), 4),
    }


SF1_IDX_DIR = os.path.join(tempfile.gettempdir(), "osps_bench_idx_sf1")
BIG_IDX_DIR = os.environ.get(
    "SPARK_GRAFT_BIG_IDX", os.path.join(tempfile.gettempdir(), "osps_bench_idx_10m")
)


def scale_axis_phase(spark) -> dict:
    """VERDICT r4 #9: the 100x-direction scale axis for the latency bar.

    Runs the SAME query set against a 1M-turn index (sf1 — built here
    once, cached in /tmp, resume-safe) and, when the 10M-turn index is
    present on this box (built once via ``python bench.py --build-10m``;
    per-segment manifests make the build resumable), against that too.
    Per-query medians + pooled p50/p99 at each size, so BENCH carries
    latency at 100k / 1M / 10M turns instead of a single point."""
    out: dict = {}
    if not os.path.exists(os.path.join(SF1_IDX_DIR, "stats.json")):
        out["sf1_build"] = build_phase(
            spark, 1.0, SF1_IDX_DIR, n_segments=max(CPUS, 8)
        )
    per, pct = query_phase(spark, SF1_IDX_DIR, runs=3)
    out["sf1"] = {"turns": 1_000_000, "queries": per, **pct}
    if os.path.exists(os.path.join(BIG_IDX_DIR, "stats.json")):
        per10, pct10 = query_phase(spark, BIG_IDX_DIR, runs=3)
        out["sf10"] = {"turns": 10_000_000, "queries": per10, **pct10}
    return out


def build_10m() -> dict:
    """One-shot 10M-turn index build into BIG_IDX_DIR (resume-safe:
    re-running skips committed segments via the per-segment manifests).
    waves=4 bounds the per-wave shuffle footprint the way a real
    cluster would split a 100 TB backfill into batches."""
    from opensearch_spark.session import get_spark

    spark = get_spark("bench-10m", shuffle_partitions=max(CPUS, 8))
    spark.sparkContext.setLogLevel("ERROR")
    if os.path.exists(os.path.join(BIG_IDX_DIR, "stats.json")):
        return {"metric": "build_10m", "status": "already built",
                "dir": BIG_IDX_DIR, "value": 0.0, "unit": "sec", "queries": {}}
    from opensearch_spark.index.builder import IndexConfig, build_index
    from opensearch_spark.transcripts import generate, n_turns

    n_convs = n_convs_for_turns(10_000_000)
    docs = generate(spark, n_convs, partitions=256)
    t0 = time.monotonic()
    build_index(
        spark, docs, BIG_IDX_DIR, IndexConfig(n_segments=128), waves=4
    )
    wall = time.monotonic() - t0
    return {
        "metric": "build_10m", "unit": "sec", "value": round(wall, 3),
        "turns": n_turns(n_convs),
        "turns_per_sec": round(n_turns(n_convs) / wall, 1),
        "dir": BIG_IDX_DIR, "queries": {},
    }


def box_probe_sec() -> float:
    """Single-core speed probe: a fixed 20M-iteration add loop.

    This sandbox's CPU frequency fluctuates run-to-run (documented in
    BASELINE.md: the same loop has measured 1.0-2.8s across a day), so
    every bench JSON carries its own probe — round-over-round latency
    comparisons should be read relative to it, not as absolutes.
    """
    t = time.perf_counter()
    s = 0
    for i in range(20_000_000):
        s += i
    return round(time.perf_counter() - t, 3)


def run_bench(build_only: bool = False, waves: int = 1) -> dict:
    from opensearch_spark.session import get_spark

    probe = box_probe_sec()
    sf = sf_from_dir(SF_DIR)
    spark = get_spark("bench", shuffle_partitions=max(CPUS, 8))
    spark.sparkContext.setLogLevel("ERROR")
    index_dir = os.path.join(tempfile.gettempdir(), f"osps_bench_idx_{CPUS}")

    t_all = time.monotonic()
    n_segments = int(os.environ.get("SPARK_GRAFT_SEGMENTS", 0)) or max(CPUS, 8)
    build = build_phase(spark, sf, index_dir, n_segments=n_segments, waves=waves)
    result = {
        "metric": "index_build_and_query_latency",
        "unit": "sec",
        "sf": sf,
        "cpus": CPUS,
        "box_probe_sec": probe,
        "build": build,
    }
    if not build_only:
        per_query, pct = query_phase(spark, index_dir)
        msearch = msearch_phase(spark, index_dir)
        wand = wand_phase(spark)
        surface = surface_phase(spark, SF_DIR)
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        result["queries"] = {**per_query, **surface}
        result["msearch"] = msearch
        result["wand"] = wand
        result["query_p50_sec"] = pct["p50_sec"]
        result["query_p99_sec"] = pct["p99_sec"]
        result["scale_axis"] = scale_axis_phase(spark)
    result["value"] = round(time.monotonic() - t_all, 3)
    # VERDICT r3 #1: the printed line must stay small enough for the
    # driver's tail buffer — verbose composition notes go to a side file
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_detail.json"
    )
    try:
        with open(detail_path, "w") as f:
            json.dump(
                {**result, "surface_composition": SURFACE_COMPOSITION}, f, indent=1
            )
    except OSError:
        pass
    return result


def _raw_cpu_calibration(n: int, four_n: int) -> float:
    """Hardware scaling ceiling of this box: pure-CPU multiprocessing
    speedup from n to 4n processes, as an efficiency ratio.  On shared /
    frequency-scaled sandboxes even embarrassingly parallel compute does
    not reach 1.0; the build's efficiency should be judged against this
    ceiling (a real 1000-executor cluster adds machines, not sibling
    cores)."""
    import multiprocessing as mp

    def t(procs: int) -> float:
        t0 = time.monotonic()
        with mp.Pool(procs) as pool:
            pool.map(_burn, [2_000_000] * 64)
        return time.monotonic() - t0

    t(four_n)  # warm the pool/fork path
    tn, t4n = t(n), t(four_n)
    return round((tn / t4n) / (four_n / n), 3)


def _burn(n: int) -> int:
    s = 0
    for i in range(n):
        s += i * i
    return s


def run_scaling() -> dict:
    """North-rule scaling evidence: the identical job (same input, same
    128 segments) at N and 4N cores in fresh subprocesses.  The corpus
    is 16x the per-round bench size so per-turn compute (tokenize +
    invert + pack, ~125 core-us/turn) dominates fixed session/job
    overheads — mirroring a real cluster where the measured section is
    the distributed build, not driver setup.

    Default pair N=4 -> 4N=16 (override SPARK_GRAFT_SCALE_PAIR=\"8,32\"):
    both levels stay within the box's physical cores; the raw-CPU
    calibration is reported so the build's efficiency can be compared
    against what THIS hardware gives embarrassingly parallel work.
    Efficiency = (throughput_4N / throughput_N) / 4."""
    sf = sf_from_dir(SF_DIR)
    pair = os.environ.get("SPARK_GRAFT_SCALE_PAIR", "2,8")
    n_cpus, four_n_cpus = (int(x) for x in pair.split(","))
    turns = int(16 * sf * TURNS_PER_SF)
    out = {}
    for cpus in (n_cpus, four_n_cpus):
        env = dict(
            os.environ,
            SPARK_GRAFT_CPUS=str(cpus),
            # identical job shape at both levels; 128 segments keep each
            # inversion task's working set small (~12.5k docs) so many
            # concurrent tasks don't thrash the shared local-mode JVM
            SPARK_GRAFT_SEGMENTS="128",
            SPARK_GRAFT_SCALING_TURNS=str(turns),
            SPARK_DRIVER_MEM=os.environ.get("SPARK_DRIVER_MEM", "32g"),
        )
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--build-only"],
            env=env,
            capture_output=True,
            text=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        line = [ln for ln in p.stdout.splitlines() if ln.startswith("{")][-1]
        out[cpus] = json.loads(line)
    tn = out[n_cpus]["build"]["inner_turns_per_sec"]
    t4n = out[four_n_cpus]["build"]["inner_turns_per_sec"]
    raw = _raw_cpu_calibration(n_cpus, four_n_cpus)
    eff = round((t4n / tn) / (four_n_cpus / n_cpus), 3)
    return {
        "metric": "build_scaling_efficiency_N_to_4N",
        "unit": "ratio",
        "sf": sf,
        "turns": turns,
        "pair": f"local[{n_cpus}] -> local[{four_n_cpus}]",
        "turns_per_sec_N": tn,
        "turns_per_sec_4N": t4n,
        "wall_N": out[n_cpus]["build"]["build_wall_sec"],
        "wall_4N": out[four_n_cpus]["build"]["build_wall_sec"],
        "raw_cpu_efficiency_ceiling": raw,
        "normalized_efficiency": round(eff / raw, 3) if raw else None,
        "box_probe_sec": box_probe_sec(),
        "value": eff,
        "queries": {},
    }


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--build-only", action="store_true")
    ap.add_argument("--build-10m", action="store_true")
    ap.add_argument("--waves", type=int, default=1)
    ap.add_argument("--wand-phase", action="store_true")
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()
    if args.scaling:
        res = run_scaling()
    elif args.build_10m:
        res = build_10m()
    elif args.wand_phase:
        res = wand_phase_inner(runs=args.runs)
    else:
        res = run_bench(build_only=args.build_only, waves=args.waves)
    print(json.dumps(res))
