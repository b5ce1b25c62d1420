"""Table catalog: load the driver's parquet tables for a scale-factor dir.

The reference creates its schema on connect (core.py:26-28,
``Base.metadata.create_all``); our analogue is idempotent registration of
the parquet-backed tables as temp views, so both the DataFrame API and
``spark.sql`` paths see the same catalog.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType

from . import TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Columnar parquet scan — Catalyst pushes filters/pruning into it.

    events.ts is parquet TIMESTAMP(NANOS), which Spark surfaces
    differently by version: older releases need
    spark.sql.legacy.parquet.nanosAsLong and deliver int64 ns (which we
    convert via ``ts div 1000`` — integer division, since ns epochs
    ~1.7e18 exceed double's 2^53 exact range); Spark >= 4.1 reads it
    natively as TIMESTAMP_NTZ truncated to µs. Either way we normalize
    to a session-tz TimestampType so every downstream expression
    (unix_micros, windows, watermarks) sees one type. Sub-µs truncation
    is semantically invisible to every query here (see
    plans/reference_queries.py ordering notes).
    """
    # Runtime-settable legacy knob for older Sparks where TIMESTAMP(NANOS)
    # is otherwise PARQUET_TYPE_ILLEGAL — set here rather than relying on
    # the session having been built by our own get_spark(), so an external
    # caller's vanilla session can also read events.parquet. On Spark
    # >= 4.1 the conf is ignored (native NTZ read); harmless either way.
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # The engine's timestamp semantics are naive-UTC (matching the
        # DuckDB oracle's reading of the same parquet). The NTZ->LTZ
        # normalization below and every epoch/window expression
        # downstream depend on it, so pin the session zone rather than
        # inheriting the JVM's local zone from an external caller.
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception:
        pass
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        dt = df.schema["ts"].dataType
        if isinstance(dt, LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(dt, TimestampNTZType):
            # Naive µs wall-clock -> session-tz instant. The engine pins
            # session tz to UTC (session.py) and the oracle (DuckDB) also
            # treats the column as naive-UTC, so the cast is value-exact.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every PRESENT table as a temp view (idempotent, like
    the reference's create_all-on-connect — absent tables are simply
    not there yet; a CLI ingest dir starts empty and grows sinks as
    sources run)."""
    dfs = {}
    for name in TABLES:
        if os.path.exists(os.path.join(sf_dir, f"{name}.parquet")):
            dfs[name] = load_table(spark, sf_dir, name)
            dfs[name].createOrReplaceTempView(name)
    return dfs
