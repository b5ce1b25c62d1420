"""SparkSession factory with scale-oriented defaults.

Test/bench runs use ``local[N]``; the conf below is written for a real
multi-executor cluster and degrades gracefully on local mode:

- AQE on (runtime coalesce, skew-join splitting, dynamic broadcast)
- UTC session timezone (reference timestamps are all tz-aware UTC —
  /root/reference/src/logsdb/core.py:17-18,64-65)
- Arrow execution for any pandas-UDF path
- shuffle partitions sized for the local core count; on a cluster this
  should be set to ~2-3x total executor cores (AQE coalesces down).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "logsdb_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or max(cpus, 8)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Default-off switch that matters for the iterative dedup/CC
        # queries: without it AQE refuses to re-coalesce the output
        # partitioning of cached plans, so a persisted dup-edge table
        # (a few thousand rows at bench scale) keeps full-width
        # 32-task shuffles through every label-propagation round. On a
        # cluster the same flag lets AQE right-size cached iterative
        # state to its actual volume. A/B-measured round 9 on the
        # r8-flagged dedup_minhash_lsh creep suspicion: 4 warm reps
        # each, ON 2.0/1.9 s medians vs OFF 2.0 s — neutral there
        # (the r8 2.5->3.1 s wobble was probe noise), so the flag
        # stays for the CC win.
        .config(
            "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
            "true",
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # 128 MB split targets: right for both local parquet and a
        # 100 TB table scan (drives ~800k tasks there — fine with AQE).
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        # Whole-stage codegen across 100+ registered queries emits far
        # more JIT'd classes than the JVM's default 240 MB code cache
        # comfortably holds; when it fills, the JVM flushes compiled
        # code and recompilation storms make query times bimodal (a
        # measured outlier ran one query at ~6x its typical time).
        # Sized for a driver also acting as the executor (local mode);
        # on a cluster apply the same to executor.extraJavaOptions.
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:ReservedCodeCacheSize=512m -XX:+UseCodeCacheFlushing",
        )
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.enableNestedColumnVectorizedReader", "true")
        # The driver testdata's events.ts is parquet TIMESTAMP(NANOS),
        # which Spark's TimestampType (µs) cannot ingest directly; read
        # the raw int64 and convert in the catalog (see catalog.py).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    return builder.getOrCreate()
