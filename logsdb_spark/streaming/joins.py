"""Streaming joins and session windows — *[extension]* (SURVEY §2.10:
the reference has no streaming at all; these complete the Structured
Streaming operator surface alongside ingest, windowed aggregation,
stream-static enrichment, custom state, and dedup).

Two canonical stateful shapes:

1. Watermarked stream-stream INTERVAL join (``attribute_purchases``) —
   click→purchase attribution within a bounded horizon. The time-range
   predicate plus watermarks on BOTH inputs is what makes unbounded
   state bounded: a buffered click can be evicted once the purchase-side
   watermark passes click.ts + horizon, and a buffered purchase once the
   click-side watermark passes purchase.ts. Inner joins emit eagerly on
   match (the watermark governs state eviction, not emission), so a
   drained availableNow run contains every match.

2. Event-time SESSION windows (``user_session_stats``) — dynamic-gap
   sessionization via ``F.session_window``: a session closes when no
   event arrives for ``gap``. Append mode emits a session exactly once,
   when the watermark passes its close — the streaming analogue of the
   batch ``sessionize_events`` query (same gap rule), letting the two
   be cross-checked on identical data.

At 100 TB both operators' state is keyed by user: the join buffers at
most ``horizon`` of per-user clicks, the session window one open
session per active user — both independent of total throughput, and
both shuffle each micro-batch once on user_id (the same key either
side's producer would already bucket by).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from .aggregates import read_events_stream


def attribute_purchases(
    clicks: DataFrame,
    purchases: DataFrame,
    horizon: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Per-user click→purchase attribution: each purchase joins every
    click by the same user in the preceding ``horizon``. Equality on
    user_id gives the shuffle key; the range predicate bounds the
    buffered state window."""
    c = clicks.withWatermark("ts", watermark).select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    p = purchases.withWatermark("ts", watermark).select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    return c.join(
        p,
        F.expr(
            f"""
            c_user = p_user AND
            purchase_ts >= click_ts AND
            purchase_ts <= click_ts + interval {horizon}
            """
        ),
    ).select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "click_ts",
        "purchase_id",
        "purchase_ts",
        "purchase_value",
    )


def start_attribution_stream(
    spark: SparkSession,
    source_dir: str,
    out_dir: str,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """availableNow attribution run: one file source, two typed slices
    of it joined stream-stream, parquet append sink + checkpoint."""
    ev = read_events_stream(spark, source_dir, max_files_per_trigger)
    out = attribute_purchases(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "purchase"),
    )
    return (
        out.writeStream.outputMode("append")
        .format("parquet")
        .option("path", os.path.join(out_dir, "attributed"))
        .option("checkpointLocation", os.path.join(out_dir, "_ckpt/attributed"))
        .trigger(availableNow=True)
        .start()
    )


def user_session_stats(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """Event-time sessionization: consecutive same-user events with
    inter-event gaps < ``gap`` merge into one session row (start, end,
    n_events, total_value). Append mode emits a session exactly once
    its close is final under the watermark."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sw"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def start_session_stream(
    spark: SparkSession,
    source_dir: str,
    out_dir: str,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    ev = read_events_stream(spark, source_dir, max_files_per_trigger)
    out = user_session_stats(ev)
    return (
        out.writeStream.outputMode("append")
        .format("parquet")
        .option("path", os.path.join(out_dir, "sessions"))
        .option("checkpointLocation", os.path.join(out_dir, "_ckpt/sessions"))
        .trigger(availableNow=True)
        .start()
    )
