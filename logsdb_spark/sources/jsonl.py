"""JSONL event source — *[extension]* (additive source-format breadth
beyond the reference's three log formats; same K2 dead-letter contract
as sources/apache_access.py).

One JSON object per line, the interchange dump format every pipeline
eventually has to ingest::

    {"event_id": 1, "ts": "2024-01-01T00:09:58.778549Z",
     "user_id": 7, "event_type": "view", "value": 12.5}

Parsing is a single ``from_json`` against an explicit schema (never
inference — a schema drift must surface as dead letters, not as a
silently widened column). Rows are split into:

- ``good_events``  — all required fields parsed and non-null;
- ``dead_letters`` — the raw line plus a JSON error record (same shape
  as the other sources'), covering both unparsable JSON and
  parsed-but-invalid rows (missing/incoherent required fields — the
  from_json PERMISSIVE null isn't allowed to masquerade as data, the
  silent-NULL trap the round-1 review caught in the Apache parser).

Scale: from_json is a JVM-side expression — the parse rides the scan
with zero Python and codegens; the good/dead split is two filters over
one projected parse (Catalyst computes the struct once per row).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

JSONL_EVENT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", StringType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
    ]
)

_REQUIRED = ["event_id", "ts", "user_id", "event_type"]


def parse_jsonl_lines(lines: DataFrame) -> DataFrame:
    """Parse once: the struct + timestamp columns good_events /
    dead_letters split on. The ingest pipeline persists THIS frame so
    JSON parsing runs once per batch, not once per consumer (the same
    parse-then-split contract as the log sources).

    try_to_timestamp: malformed instants must dead-letter as data
    errors, not throw ANSI cast exceptions mid-scan."""
    return lines.withColumn(
        "_p", F.from_json(F.col("value"), JSONL_EVENT_SCHEMA)
    ).withColumn("_ts", F.try_to_timestamp(F.col("_p.ts")))


def _invalid() -> Column:
    """True when a line must dead-letter: JSON didn't parse (struct is
    null / all-null fields) or any required field is missing, or the
    timestamp string didn't parse to an instant."""
    parse_failed = F.col("_p").isNull()
    missing = F.lit(False)
    for r in _REQUIRED:
        missing = missing | F.col(f"_p.{r}").isNull()
    bad_ts = F.col("_p.ts").isNotNull() & F.col("_ts").isNull()
    return parse_failed | missing | bad_ts


def good_events(parsed: DataFrame) -> DataFrame:
    """Typed event rows from a ``parse_jsonl_lines`` DataFrame."""
    return (
        parsed
        .filter(~_invalid())
        .select(
            F.col("_p.event_id").alias("event_id"),
            F.col("_ts").alias("ts"),
            F.col("_p.user_id").alias("user_id"),
            F.col("_p.event_type").alias("event_type"),
            F.col("_p.value").alias("value"),
        )
    )


def dead_letters(parsed: DataFrame) -> DataFrame:
    """JSON error records for unparsable/invalid lines — the same
    (error, line) shape the reference emits (K2)."""
    return (
        parsed
        .filter(_invalid())
        .select(
            F.to_json(
                F.struct(
                    F.lit("jsonl").alias("source"),
                    # from_json (PERMISSIVE) yields an ALL-NULL struct
                    # for malformed JSON, not a NULL struct — so
                    # "unparsable" is detected as every field null.
                    F.when(
                        F.col("_p").isNull()
                        | (
                            F.col("_p.event_id").isNull()
                            & F.col("_p.ts").isNull()
                            & F.col("_p.user_id").isNull()
                            & F.col("_p.event_type").isNull()
                            & F.col("_p.value").isNull()
                        ),
                        "unparsable JSON",
                    )
                    .when(
                        F.col("_p.ts").isNotNull() & F.col("_ts").isNull(),
                        "bad timestamp",
                    )
                    .otherwise("missing required field")
                    .alias("error"),
                )
            ).alias("error"),
            F.col("value").alias("line"),
        )
    )
