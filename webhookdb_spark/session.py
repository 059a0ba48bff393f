"""SparkSession factory with scale-oriented defaults.

Local testing runs on ``local[N]``; the config choices here are the ones
that matter on a real multi-executor cluster too (AQE, dynamic partition
overwrite, Arrow, UTC session time zone so timestamp semantics match the
reference's timestamptz-in-UTC model — SURVEY §1.2).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "webhookdb-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0") or 0) or os.cpu_count() or 4
    if shuffle_partitions is None:
        # Local default: one shuffle partition per core. On a real cluster
        # this is sized to keep post-shuffle partitions ~128-512MB; AQE
        # coalescing makes the exact number less load-bearing.
        shuffle_partitions = cpus

    driver_mem = os.environ.get("SPARK_DRIVER_MEMORY", "8g")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        # Timestamps: the reference stores timestamptz and normalizes to
        # UTC; a UTC session TZ makes Spark TimestampType behave the same.
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # AQE: runtime coalescing + skew-join handling — the 100TB story
        # for skewed webhook keys / skewed join sides.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # MERGE writes back only the hash buckets an upsert batch touches.
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        # Arrow for the few pandas-UDF paths (canonical JSON, RRULE, ICS).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.driver.memory", driver_mem)
        # Commit the heap up front (cluster executors run with fixed
        # heaps; local-mode default lets the heap grow lazily, so the
        # first heavy queries pay page-fault + heap-resize stalls that
        # steady-state throughput never sees — guide §1 cold-start vs
        # steady-state). -Xms mirrors spark.driver.memory so the pair
        # can never disagree. No-op if the JVM is already running.
        .config(
            "spark.driver.extraJavaOptions",
            os.environ.get(
                "SPARK_DRIVER_JAVA_OPTIONS",
                f"-Xms{driver_mem} -XX:+AlwaysPreTouch",
            ),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Read parquet TIMESTAMP(NANOS) (unsupported natively) as long;
        # callers convert with timestamp_micros(ns div 1000), which
        # truncates exactly like DuckDB's ns→us read.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Nothing in the engine reads _SUCCESS markers; skip writing
        # them (one driver-side FS op per write job).
        .config(
            "spark.hadoop.mapreduce.fileoutputcommitter.marksuccessfuljobs",
            "false",
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
