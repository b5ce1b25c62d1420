"""Time-window predicates (SURVEY §2.3 P2).

The reference's daily window is ``timestamp >= now(utc) - 1 day``
evaluated once per query build (/root/reference/src/logsdb/core.py:60-61).
For deterministic differential testing against static parquet we anchor
"now" at ``max(ts)`` of the table instead of the wall clock; production
callers pass ``anchor=None`` to use ``current_timestamp()``.

Scale note: the anchor aggregate is a 1-row partial/final max — Spark
computes it map-side then broadcasts it into the filter via a broadcast
nested-loop join of a single row, so no driver collect and no shuffle of
the fact table. On a date-partitioned production table the same
predicate becomes a partition-pruning filter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_anchor(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Cross-join a broadcast 1-row max(ts) as column ``_anchor``."""
    anchor = df.agg(F.max(ts_col).alias("_anchor"))
    return df.join(F.broadcast(anchor))


def last_day(df: DataFrame, ts_col: str = "ts", days: int = 1) -> DataFrame:
    """Rows within ``days`` of the data's max timestamp (P2 parity,
    deterministically anchored). Returns the original columns only."""
    cols = df.columns
    out = with_anchor(df, ts_col).filter(
        F.col(ts_col) >= F.col("_anchor") - F.expr(f"INTERVAL {days} DAY")
    )
    return out.select(*cols)


def wallclock_last_day(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Production form: the reference's literal now()-24h predicate."""
    return df.filter(F.col(ts_col) >= F.current_timestamp() - F.expr("INTERVAL 1 DAY"))


def anchored_pred(ts_col: str = "ts", days: int = 1) -> Column:
    return F.col(ts_col) >= F.col("_anchor") - F.expr(f"INTERVAL {days} DAY")
