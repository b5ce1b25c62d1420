"""Streaming deduplication: exactly-once semantics on top of an
at-least-once upstream.

The reference's ingest is at-least-once by construction — a crash
mid-stream exits after some rows committed and the operator re-runs
the whole input (SURVEY §2.10; apache_access.py:143 halt semantics).
The batch dedup family (operators/dedup.py) removes duplicates at
rest; this module removes them in flight, which is what a 100 TB
pipeline actually wants: state is bounded by the watermark horizon
instead of growing with the corpus.

``dropDuplicatesWithinWatermark`` keeps one row per key and expires a
key's state once the event-time watermark passes its last-seen
timestamp + the watermark delay — i.e., "a duplicate can arrive at
most <delay> after the original". That bound is the knob: state size
= keys seen within one delay horizon, not all keys ever.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from .aggregates import read_events_stream


def dedup_events(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Drop re-delivered events by event_id, with dedup state expiring
    one watermark-delay after each key's event time."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def start_dedup_stream(
    spark: SparkSession,
    source_dir: str,
    out_dir: str,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """availableNow run: at-least-once parquet source → watermarked
    dedup → append sink. Checkpointed, so duplicates arriving in a
    LATER run (within the watermark horizon) are also dropped — the
    dedup state lives in the checkpoint, not the session."""
    events = read_events_stream(spark, source_dir, max_files_per_trigger)
    out = dedup_events(events)
    return (
        out.writeStream.outputMode("append")
        .format("parquet")
        .option("path", os.path.join(out_dir, "deduped"))
        .option("checkpointLocation", os.path.join(out_dir, "_ckpt/deduped"))
        .trigger(availableNow=True)
        .start()
    )
