"""In-flight job metrics via Spark's Observation API — *[extension]*.

Production pipelines record row counts and quality tallies for every
write WITHOUT a second pass; Spark's ``observe()`` accumulates named
aggregates inside the job that materializes the write, so the metrics
are free (no extra scan, no cache). This is the mechanism behind
write-audit-publish: the audit numbers come from the same job that
produced the data, and a mismatch vetoes the publish step.

At 100 TB the alternative — re-reading the sink to count what was just
written — costs a full scan per write; observed metrics cost nothing
but the accumulator merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def write_with_metrics(
    df: DataFrame,
    path: str,
    value_col: str | None = None,
) -> dict:
    """Parquet write + audit metrics from the SAME job: row count,
    and (when ``value_col`` is given) its null count and sum. Returns
    the observed metrics dict after the write completes.

    The observation rides the write's own pass over the data — one
    scan total, metrics exact (Observation waits for job completion,
    and a parquet write runs exactly one job over df)."""
    metrics = [F.count(F.lit(1)).alias("n_rows")]
    if value_col is not None:
        metrics += [
            F.sum(F.col(value_col).isNull().cast("long")).alias("n_null"),
            F.sum(value_col).alias("value_sum"),
        ]
    obs = Observation()
    df.observe(obs, *metrics).write.mode("overwrite").parquet(path)
    return obs.get
