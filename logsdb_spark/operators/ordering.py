"""Distributed total ordering — *[extension]*.

A global ``row_number()`` with an empty PARTITION BY forces every row
through ONE task (Spark plans Exchange SinglePartition) — the classic
100 TB killer. ``global_row_number`` produces the identical ranking
with bounded parallelism instead:

1. ``repartitionByRange`` on the order keys — each partition holds a
   contiguous, non-overlapping key range (one range shuffle);
2. per-partition local ``row_number`` (window keyed by the partition
   id, so parallelism = #partitions, not 1);
3. partition rank offsets = exclusive prefix sum of partition counts —
   a #partitions-row aggregate, broadcast back.

This is the textbook distributed sort-rank (TeraSort's ranking shape).
The input is persisted while counts and ranks are computed: the two
jobs must see identical range boundaries (repartitionByRange samples
boundaries, and a recompute could re-sample them differently). At
production scale the persist can be replaced by precomputed explicit
boundaries (approxQuantile on the order key) feeding a deterministic
bucket expression — same plan shape, no cache.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def global_row_number(
    df: DataFrame,
    order_cols: list[Column | str],
    rn_alias: str = "rn",
    num_partitions: int | None = None,
) -> DataFrame:
    """Attach a 1-based global dense row number ordered by
    ``order_cols`` (ties broken by their full tuple — pass a unique
    tiebreaker as the last key for a deterministic total order),
    without ever funneling the data through a single partition."""
    cols = df.columns
    ranged = (
        df.repartitionByRange(num_partitions, *order_cols)
        if num_partitions
        else df.repartitionByRange(*order_cols)
    )
    from .dedup import _persist_released_on_gc

    tagged = _persist_released_on_gc(
        ranged.withColumn("_pid", F.spark_partition_id()))
    counts = tagged.groupBy("_pid").agg(F.count(F.lit(1)).alias("_cnt"))
    # Exclusive prefix sum over the (tiny, #partitions-row) counts —
    # the only single-partition window in the plan, and it is bounded
    # by the partition count, never the data.
    woff = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "_pid", F.coalesce(F.sum("_cnt").over(woff), F.lit(0)).alias("_off")
    )
    wloc = Window.partitionBy("_pid").orderBy(*order_cols)
    return (
        tagged.join(F.broadcast(offsets), "_pid")
        .withColumn(rn_alias, F.row_number().over(wloc) + F.col("_off"))
        .select(rn_alias, *cols)
    )
