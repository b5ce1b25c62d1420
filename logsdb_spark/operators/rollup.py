"""Incremental materialized rollup (continuous-aggregate pattern) —
*[extension]*.

A daily (day, event_type) aggregate table maintained INCREMENTALLY from
a batch-partitioned events sink (the layout ``streaming/ingest.py``
writes: ``event_date=<d>/_batch_id=<n>/``): each refresh reads ONLY the
batch partitions that arrived since the last refresh, aggregates them,
and merges into the rollup by dynamic partition overwrite of the
affected days. This is the hypertable/continuous-aggregate idea
re-expressed on plain parquet: the 100 TB property is that refresh cost
scales with NEW data (plus the touched days' existing rollup rows),
never with table history.

Correctness model: counts and fixed-point value sums are decomposable
aggregates, so merge = re-aggregate(old rollup rows ∪ new partial
rows). A sidecar ``_refreshed_batches.json`` records the high-water
set of applied batch ids; a crash between write and sidecar update
re-applies the same batches onto the PRE-REFRESH rollup partitions via
full-day overwrite, which is idempotent (the day is recomputed from
old-other-days + its complete batch set — never double-counted,
because merge inputs are the day's OLD rollup row only when that row
came from batches outside the refresh set; see ``refresh``).

To keep replay exactly idempotent without a transaction log, the
refresh recomputes affected days from the EVENT sink (all batches, old
and new, restricted to those days) rather than merging into possibly
half-applied rollup rows — day-scoped recompute is the plain-parquet
substitute for MERGE atomicity, and its cost is bounded by the days a
batch touches (a streaming ingest touches ~1 day per batch).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_SIDECAR = "_refreshed_batches.json"


def _applied_batches(rollup_dir: str) -> set[int]:
    p = os.path.join(rollup_dir, _SIDECAR)
    if not os.path.exists(p):
        return set()
    with open(p) as fp:
        return set(json.load(fp)["batches"])


def _daily_agg(ev: DataFrame) -> DataFrame:
    vi = F.floor(F.col("value") * 10000 + F.lit(0.5)).cast("long")
    return (
        ev.select("event_date", "event_type", vi.alias("vi"))
        .groupBy("event_date", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum("vi") / F.lit(10000.0)).alias("total_value"),
        )
    )


def refresh_daily_rollup(
    spark: SparkSession, events_dir: str, rollup_dir: str
) -> int:
    """Apply all not-yet-applied batch partitions to the rollup.
    Returns the number of new batches applied (0 = already current).

    Plan shape per refresh: one pruned scan of the new batch
    partitions (partition filter on _batch_id — no history read) to
    find affected days, then one pruned scan of those DAYS (partition
    filter on event_date) feeding a map-side-combinable aggregate,
    written with dynamic partition overwrite so only the affected
    day partitions of the rollup rewrite."""
    ev = spark.read.option("basePath", events_dir).parquet(events_dir)
    # Batch ids are directory names in the sink layout this module
    # documents — enumerate them from the listing, NOT a corpus-wide
    # distinct() (which would scan every historical partition and
    # break the refresh-scales-with-new-data contract).
    all_batches = {
        int(name.split("=", 1)[1])
        for day_entry in os.scandir(events_dir)
        if day_entry.is_dir() and day_entry.name.startswith("event_date=")
        for name in os.listdir(day_entry.path)
        if name.startswith("_batch_id=")
    }
    new_batches = sorted(all_batches - _applied_batches(rollup_dir))
    if not new_batches:
        return 0

    affected_days = [
        r["event_date"]
        for r in ev.filter(F.col("_batch_id").isin(new_batches))
        .select("event_date")
        .distinct()
        .collect()
    ]
    day_rows = _daily_agg(ev.filter(F.col("event_date").isin(affected_days)))
    (
        day_rows.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("event_date")
        .parquet(rollup_dir)
    )
    with open(os.path.join(rollup_dir, _SIDECAR), "w") as fp:
        json.dump({"batches": sorted(all_batches)}, fp)
    return len(new_batches)


def read_rollup(spark: SparkSession, rollup_dir: str) -> DataFrame:
    return spark.read.parquet(rollup_dir).select(
        "event_date", "event_type", "n_events", "total_value"
    )
