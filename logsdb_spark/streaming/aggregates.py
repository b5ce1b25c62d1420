"""Streaming aggregation — *[extension]* (SURVEY §2.10 flags these as
extension scope: the reference has no streaming aggregation at all, its
reports run as batch reads).

Two canonical stateful shapes over the events stream:

1. Watermarked tumbling-window counts (``hourly_event_counts``) —
   event-time windows with late-data tolerance. In append mode a window
   only emits once the watermark passes its end, so results are final
   (exactly-once per window); at 100 TB state size is bounded by
   (#open windows × #event types), independent of throughput.

2. Custom running per-key state (``running_user_totals``) via
   ``applyInPandasWithState`` — the escape hatch for operators Spark's
   built-in aggregates can't express (here: cumulative per-user
   totals emitted every micro-batch, i.e. a changelog). State is one
   small tuple per user; Arrow moves each group's batch rows in
   columnar form, so the Python hop is amortized per group, not per
   row.

Both run with ``availableNow`` triggers in tests (drain-the-directory
semantics) and file checkpointing, the same recovery model as the
ingest pipelines.
"""

from __future__ import annotations

import os
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# Explicit schema — streaming file sources must not infer (and the
# events parquet written by our own pipelines is µs-timestamped).
EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
    ]
)


def read_events_stream(
    spark: SparkSession, source_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(source_dir)


def hourly_event_counts(
    events: DataFrame, watermark: str = "1 hour", window: str = "1 hour"
) -> DataFrame:
    """Tumbling event-time window counts with a late-data watermark.
    Append-mode output: a (window, event_type) row emits exactly once,
    when the watermark passes window.end."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def start_hourly_counts(
    spark: SparkSession,
    source_dir: str,
    out_dir: str,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """availableNow run of the windowed agg → parquet append sink.
    Note append-mode semantics: windows not yet passed by the final
    watermark stay in state and emit on the NEXT run (state lives in
    the checkpoint) — the streaming analogue of 'the current hour is
    still open'."""
    events = read_events_stream(spark, source_dir, max_files_per_trigger)
    out = hourly_event_counts(events)
    return (
        out.writeStream.outputMode("append")
        .format("parquet")
        .option("path", os.path.join(out_dir, "hourly_counts"))
        .option("checkpointLocation", os.path.join(out_dir, "_ckpt/hourly_counts"))
        .trigger(availableNow=True)
        .start()
    )


# ---------------------------------------------------------------------------
# applyInPandasWithState: cumulative per-user totals (changelog output)
# ---------------------------------------------------------------------------

_STATE_SCHEMA = "n LONG, v DOUBLE"
_OUTPUT_SCHEMA = "user_id LONG, n_events LONG, total_value DOUBLE"


def _update_user_totals(
    key: tuple[Any, ...],
    pdf_iter: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, v = state.get if state.exists else (0, 0.0)
    for pdf in pdf_iter:
        n += len(pdf)
        v += float(pdf["value"].fillna(0.0).sum())
    state.update((n, v))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [round(v, 4)]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Cumulative (n_events, total_value) per user, one changelog row
    per user per micro-batch that saw that user. State = one 2-tuple
    per user — O(#users), throughput-independent."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_totals,
        outputStructType=_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def start_running_totals(
    spark: SparkSession,
    source_dir: str,
    out_dir: str,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    events = read_events_stream(spark, source_dir, max_files_per_trigger)
    out = running_user_totals(events)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        # Replay-idempotent changelog: each batch dynamically
        # overwrites its OWN batch_id partition (same pattern as
        # ingest.py's sinks) — a plain append would be at-least-once
        # and a crash between append and checkpoint commit would
        # duplicate this batch's changelog rows on replay.
        (
            batch_df.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(os.path.join(out_dir, "user_totals"))
        )

    return (
        out.writeStream.foreachBatch(write_batch)
        .outputMode("update")
        .option("checkpointLocation", os.path.join(out_dir, "_ckpt/user_totals"))
        .trigger(availableNow=True)
        .start()
    )


def enrich_events(events: DataFrame, dim: DataFrame, key: str = "user_id",
                  dim_key: str = "c_custkey") -> DataFrame:
    """Stream-static enrichment: left-join the event stream with a
    static dimension (user attributes, experiment assignments, model
    versions...). The static side broadcasts, so enrichment is a
    per-batch map-side hash probe — the stream is never shuffled and
    no state is kept (stream-static joins are stateless by
    definition; Spark re-resolves the static relation per micro-batch,
    so a dim refresh lands on the next batch)."""
    return events.join(F.broadcast(dim), events[key] == dim[dim_key], "left")


def start_enriched_stream(
    spark: SparkSession,
    source_dir: str,
    out_dir: str,
    dim: DataFrame,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    events = read_events_stream(spark, source_dir, max_files_per_trigger)
    enriched = enrich_events(events, dim)
    return (
        enriched.writeStream.format("parquet")
        .option("path", os.path.join(out_dir, "enriched_events"))
        .option("checkpointLocation", os.path.join(out_dir, "_ck/enrich"))
        .trigger(availableNow=True)
        .start()
    )
