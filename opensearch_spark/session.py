"""SparkSession factory with the engine's recommended configuration."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "opensearch_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or cpus
    return (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # committer v1: job-level atomic rename.  v2 commits task output
        # directly to the destination, so a failed wave/batch leaves
        # partial files and task-commit retries can duplicate them
        # (MAPREDUCE-7282) — that breaks the all-or-nothing property the
        # builder's resume logic and the streaming exactly-once manifest
        # rely on ("the m-row commits atomically with the wave").  v1's
        # driver-side rename cost is per-file and amortized across waves;
        # opt into v2 explicitly only for overwrite-idempotent outputs.
        .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "1")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        # JDK unified logging defaults warnings (gc,alloc GCLocker
        # retries under heap pressure) to STDOUT, which would interleave
        # with the bench's machine-readable JSON line — send them to
        # stderr instead
        .config(
            "spark.driver.extraJavaOptions",
            os.environ.get("SPARK_DRIVER_JAVA_OPTS", "")
            + " -Xlog:all=warning:stderr",
        )
        .config("spark.ui.enabled", "false")
        # keep stdout clean: the bench's machine-readable JSON line must
        # not interleave with console progress bars (VERDICT r3 #1)
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
