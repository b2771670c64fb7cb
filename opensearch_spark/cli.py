"""spark-submit entry points for cluster runs.

Package the library and submit any sub-command to a real cluster
(the north-rule deployment shape):

    zip -r opensearch_spark.zip opensearch_spark
    spark-submit --py-files opensearch_spark.zip \
        opensearch_spark/cli.py build \
        --input s3://bucket/transcripts --index s3a://bucket/idx \
        --segments 4096 --waves 8

Sub-commands: ``generate`` (synthetic transcripts), ``build``
(resumable index build; ``--format parquet|iceberg|table``),
``merge`` (segment compaction), ``query`` (top-k search), ``smoke``
(generate -> build -> query round-trip in one session — the
spark-submit deployment check).  The SparkSession comes from
``getOrCreate`` so every ``spark-submit --conf`` applies unchanged;
``--segments`` is the unit of inversion parallelism (size segments to
~1-4M turns on a large cluster).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

if __package__ in (None, ""):
    # executed as a script path (spark-submit opensearch_spark/cli.py):
    # make the package importable from the repo/zip root
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _spark(app: str):
    from pyspark.sql import SparkSession

    return SparkSession.builder.appName(app).getOrCreate()


def cmd_generate(args) -> None:
    from opensearch_spark.transcripts import generate

    spark = _spark("osps-generate")
    generate(spark, args.convs, seed=args.seed, partitions=args.partitions).write.mode(
        "overwrite"
    ).parquet(args.out)
    print(json.dumps({"written": args.out, "convs": args.convs}))


def read_input(spark, input_ref: str, fmt: str = "parquet"):
    """Load the transcript table (conv_id, turn_idx, role, text, tool,
    ts) from any of the deployment input shapes:

    - ``parquet``: a path (the sandbox/test shape).
    - ``iceberg``: an Iceberg table reference resolved through the
      session catalog (``spark.read.format("iceberg").load``) — the
      north-rule production shape.  Requires the iceberg-spark-runtime
      jar + catalog conf on the cluster (``--packages
      org.apache.iceberg:iceberg-spark-runtime-...``); Iceberg gives
      the build snapshot isolation (a consistent table snapshot for
      the whole multi-wave run) and its manifests feed Spark's
      partition pruning.  Not installable in this sandbox, so the
      import failure is surfaced with that hint rather than stubbed.
    - ``table``: any catalog table/view name (``spark.read.table``) —
      exercises the same catalog-resolution path locally.
    """
    if fmt == "iceberg":
        try:
            return spark.read.format("iceberg").load(input_ref)
        except Exception as e:  # jar/catalog absent: actionable message
            raise RuntimeError(
                "iceberg input needs the iceberg-spark-runtime jar and a "
                "configured catalog (spark-submit --packages "
                "org.apache.iceberg:iceberg-spark-runtime); reader said: "
                f"{e}"
            ) from e
    if fmt == "table":
        return spark.read.table(input_ref)
    return spark.read.parquet(input_ref)


def cmd_build(args) -> None:
    from opensearch_spark.index.builder import IndexConfig, build_index

    spark = _spark("osps-build")
    docs = read_input(spark, args.input, args.format)
    cfg = IndexConfig(
        n_segments=args.segments,
        stopwords=args.stopwords,
        store_positions=not args.no_positions,
        analyzer=json.loads(args.analyzer) if args.analyzer else None,
        search_analyzer=(
            json.loads(args.search_analyzer) if args.search_analyzer else None
        ),
        index_sort=json.loads(args.index_sort) if args.index_sort else None,
    )
    stats = build_index(
        spark, docs, args.index, cfg, waves=args.waves, resume=not args.no_resume
    )
    print(json.dumps(stats))


def cmd_merge(args) -> None:
    from opensearch_spark.index.merge import merge_index

    spark = _spark("osps-merge")
    print(json.dumps(merge_index(spark, args.src, args.dst, hot_blocks=args.hot_blocks)))


def cmd_snapshot(args) -> None:
    from opensearch_spark.index import snapshot as snap

    spark = _spark("osps-snapshot")
    print(json.dumps(snap.snapshot(spark, args.index, args.repo, args.name)))


def cmd_restore(args) -> None:
    from opensearch_spark.index import snapshot as snap

    spark = _spark("osps-restore")
    print(json.dumps(snap.restore(spark, args.repo, args.name, args.dst)))


def cmd_stats(args) -> None:
    """``_stats`` over an index directory (index/stats_api.py)."""
    from opensearch_spark.index.stats_api import index_stats

    spark = _spark("osps-stats")
    print(json.dumps(index_stats(spark, args.index)))


def cmd_resize(args) -> None:
    """``_clone`` / ``_shrink`` / ``_split`` (index/resize.py)."""
    from opensearch_spark.index import resize as rz

    if args.op != "clone" and args.segments is None:
        raise SystemExit(f"resize --op {args.op} requires --segments")
    if args.op == "clone" and args.segments is not None:
        # a clone never changes the segment count: a passed --segments
        # almost certainly meant --op split/shrink — fail instead of
        # silently producing an identically-sharded copy
        raise SystemExit("resize --op clone takes no --segments")
    spark = _spark("osps-resize")
    fn = {"clone": rz.clone_index, "shrink": rz.shrink_index,
          "split": rz.split_index}[args.op]
    if args.op == "clone":
        print(json.dumps(fn(spark, args.src, args.dst)))
    else:
        print(json.dumps(fn(spark, args.src, args.dst, args.segments)))


def cmd_query(args) -> None:
    from opensearch_spark.index.reader import InvertedIndex
    from opensearch_spark.query.executor import SearchEngine

    spark = _spark("osps-query")
    eng = SearchEngine(InvertedIndex(spark, args.index))
    spec = json.loads(args.query)
    if args.body:
        # full _search request body -> reference-shaped response
        # (restapi.search_request: query/sort/_source/script_fields/
        # aggs/highlight/rescore/collapse/suggest/post_filter)
        from opensearch_spark import restapi

        print(json.dumps(restapi.search_request(eng, spec), default=str))
        return
    rows = eng.search(spec, size=args.size, prune=args.prune).collect()
    for r in rows:
        print(json.dumps(r.asDict(), default=str))


def cmd_analyze(args) -> None:
    """``_analyze`` API shape (indices/analyze, RestAnalyzeAction):
    run an analyzer (named, or a full JSON chain spec via --spec) over
    --text and print ``{"tokens": [{"token", "position"}, ...]}`` —
    no SparkSession needed, the chain runs driver-side exactly as it
    does inside the Arrow UDF."""
    from opensearch_spark.analysis.chain import Analyzer

    spec = json.loads(args.spec) if args.spec else args.analyzer
    toks, pos = Analyzer.from_spec(spec)(args.text)
    print(json.dumps({
        "tokens": [
            {"token": t, "position": int(p)} for t, p in zip(toks, pos)
        ]
    }, ensure_ascii=False))


def cmd_smoke(args) -> None:
    """One-session deployment check (the spark-submit --py-files smoke
    path): generate a small deterministic corpus, register it as a
    catalog table, build through the ``table`` input shape, run one
    match query, and print a single JSON line the caller can assert
    on.  Everything travels through the same code paths a cluster run
    uses — only the corpus size differs."""
    import shutil
    import tempfile

    from opensearch_spark.index.builder import IndexConfig, build_index
    from opensearch_spark.index.reader import InvertedIndex
    from opensearch_spark.query.executor import SearchEngine
    from opensearch_spark.transcripts import generate

    spark = _spark("osps-smoke")
    work = args.workdir or tempfile.mkdtemp(prefix="osps-smoke-")
    idx = os.path.join(work, "idx")
    shutil.rmtree(idx, ignore_errors=True)
    generate(spark, args.convs, partitions=4).createOrReplaceTempView(
        "smoke_transcripts"
    )
    docs = read_input(spark, "smoke_transcripts", "table")
    stats = build_index(spark, docs, idx, IndexConfig(n_segments=8))
    eng = SearchEngine(InvertedIndex(spark, idx))
    rows = eng.search({"match": {"text": args.query}}, size=10).collect()
    print(
        json.dumps(
            {
                "turns_indexed": stats.get("n_docs"),
                "hits": len(rows),
                "top": (
                    [rows[0]["conv_id"], rows[0]["turn_idx"], round(rows[0]["score"], 4)]
                    if rows
                    else None
                ),
                "index": idx,
            }
        )
    )


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="opensearch_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("generate")
    g.add_argument("--convs", type=int, required=True)
    g.add_argument("--seed", type=int, default=42)
    g.add_argument("--partitions", type=int, default=64)
    g.add_argument("--out", required=True)
    g.set_defaults(fn=cmd_generate)

    b = sub.add_parser("build")
    b.add_argument("--input", required=True)
    b.add_argument(
        "--format", choices=("parquet", "iceberg", "table"), default="parquet"
    )
    b.add_argument("--index", required=True)
    b.add_argument("--segments", type=int, default=256)
    b.add_argument("--waves", type=int, default=1)
    b.add_argument("--stopwords", default=None)
    b.add_argument("--analyzer", default=None,
                   help="JSON analyzer spec or quoted name (analysis/chain.py)")
    b.add_argument("--search-analyzer", default=None,
                   help="JSON query-side analyzer override")
    b.add_argument("--index-sort", default=None,
                   help='JSON index.sort spec, e.g. \'["ts"]\' or '
                        '\'[["ts","desc"]]\' (IndexSortConfig analog)')
    b.add_argument("--no-positions", action="store_true")
    b.add_argument("--no-resume", action="store_true")
    b.set_defaults(fn=cmd_build)

    m = sub.add_parser("merge")
    m.add_argument("--src", required=True)
    m.add_argument("--dst", required=True)
    m.add_argument("--hot-blocks", type=int, default=64)
    m.set_defaults(fn=cmd_merge)

    sn = sub.add_parser("snapshot")
    sn.add_argument("--index", required=True)
    sn.add_argument("--repo", required=True)
    sn.add_argument("--name", required=True)
    sn.set_defaults(fn=cmd_snapshot)

    rs = sub.add_parser("restore")
    rs.add_argument("--repo", required=True)
    rs.add_argument("--name", required=True)
    rs.add_argument("--dst", required=True)
    rs.set_defaults(fn=cmd_restore)

    st = sub.add_parser("stats")
    st.add_argument("--index", required=True)
    st.set_defaults(fn=cmd_stats)

    rz = sub.add_parser("resize")
    rz.add_argument("--op", required=True, choices=["clone", "shrink", "split"])
    rz.add_argument("--src", required=True)
    rz.add_argument("--dst", required=True)
    rz.add_argument("--segments", type=int, default=None)
    rz.set_defaults(fn=cmd_resize)

    q = sub.add_parser("query")
    q.add_argument("--index", required=True)
    q.add_argument("--query", required=True, help="JSON query DSL")
    q.add_argument("--size", type=int, default=10)
    q.add_argument("--prune", action="store_true")
    q.add_argument("--body", action="store_true",
                   help="treat --query as a full _search request body; "
                        "print the reference-shaped JSON response")
    q.set_defaults(fn=cmd_query)

    an = sub.add_parser("analyze")
    an.add_argument("--text", required=True)
    an.add_argument("--analyzer", default="standard")
    an.add_argument("--spec", default=None,
                    help="full JSON chain spec (tokenizer/filter/"
                         "char_filter) overriding --analyzer")
    an.set_defaults(fn=cmd_analyze)

    s = sub.add_parser("smoke")
    s.add_argument("--convs", type=int, default=200)
    s.add_argument("--query", default="error handling")
    s.add_argument("--workdir", default=None)
    s.set_defaults(fn=cmd_smoke)

    args = ap.parse_args(argv)
    args.fn(args)
    return 0


if __name__ == "__main__":
    sys.exit(main())
