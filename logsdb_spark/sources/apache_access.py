"""S1 — Apache access-log source (reference:
src/logsdb/apache_access.py:87-143).

Input format (documented at apache_access.py:88-90): one line per
request, 8 pipe-separated scalars followed by a literal JSON-style
array of 7 strings::

    %{%Y-%m-%d %H:%M:%S %z}t|%v|%p|%a|%I|%O|%D|%>s|["%u", "%r", "%m", "%U%q", "%H", "%{Referer}i", "%{User-Agent}i"]

The reference parses line-at-a-time in Python (split + ast.literal_eval
+ int casts, apache_access.py:95-127) and inserts one ORM row per line.
Here the whole parse is a Catalyst column-expression pipeline over a
``value: string`` column (batch ``spark.read.text`` or streaming
``readStream``): split → element_at → casts → from_json for the
quoted tail — zero Python in the hot path, so it vectorizes and
whole-stage-codegens across a 1000-executor ingest.

Error handling (apache_access.py:128-143): the reference emits a JSON
error record to stderr and halts on first failure. We route unparsable
lines to a dead-letter DataFrame carrying the same JSON shape (K2) and
let the caller decide strictness — halt-on-error is a policy, not a
plan property.

The latin-1 → utf-8 re-encode (``reencode``, apache_access.py:146-147)
is applied to the 7 string fields via built-in encode/decode.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from ..functions.scalars import bad_reencode, reencode

APACHE_LOG_FORMAT = (
    '%{%Y-%m-%d %H:%M:%S %z}t|%v|%p|%a|%I|%O|%D|%>s|'
    '["%u", "%r", "%m", "%U%q", "%H", "%{Referer}i", "%{User-Agent}i"]'
)

# Typed target schema (table apache_access, reference
# apache_access.py:24-42). INET → string, Unicode(n) → string.
APACHE_EVENT_SCHEMA = StructType(
    [
        StructField("timestamp", TimestampType()),
        StructField("host", StringType()),
        StructField("port", LongType()),
        StructField("src_addr", StringType()),
        StructField("authuser", StringType()),
        StructField("bytesin", LongType()),
        StructField("bytesout", LongType()),
        StructField("microsecs", LongType()),
        StructField("status", LongType()),
        StructField("reqline", StringType()),
        StructField("method", StringType()),
        StructField("path", StringType()),
        StructField("protocol", StringType()),
        StructField("referer", StringType()),
        StructField("user_agent", StringType()),
    ]
)

_TAIL_SCHEMA = ArrayType(StringType())


def _field(parts: Column, i: int) -> Column:
    # try_element_at: malformed lines (< 9 fields) yield NULL instead of
    # raising under ANSI mode — the _corrupt flag routes them out.
    return F.try_element_at(parts, F.lit(i))


def parse_apache_lines(lines: DataFrame, value_col: str = "value") -> DataFrame:
    """value:string → typed apache events + ``_corrupt`` flag +
    ``_raw`` original line (for the dead-letter sink).

    Mirrors apache_access.py:95-127: split('|', 9); fields 1-8 are
    scalars; field 9 is the quoted 7-string list (parsed with
    from_json — the reference's ast.literal_eval accepts the same
    double-quoted strings); every string field re-encoded latin-1→utf-8.
    """
    v = F.col(value_col)
    parts = F.split(v, r"\|", 9)
    tail = F.from_json(_field(parts, 9), _TAIL_SCHEMA)

    def tail_str(i: int) -> Column:
        return reencode(F.try_element_at(tail, F.lit(i)))

    def bad_utf8(c: Column) -> Column:
        # The reference's line.encode('latin-1').decode('utf-8')
        # RAISES per line on bytes that aren't valid UTF-8 and routes
        # it to an error record (apache_access.py:128-143); mirroring
        # that, is_valid_utf8 flags exactly those rows corrupt (and
        # reencode returns NULL for them instead of letting Spark 4's
        # ANSI decode kill the whole batch).
        return bad_reencode(c)

    ts = F.try_to_timestamp(_field(parts, 1), F.lit("yyyy-MM-dd HH:mm:ss XX"))
    # Numeric fields: the source format ALWAYS supplies them, so a
    # try_cast that comes back NULL means a malformed value — the
    # reference's int() would raise there (apache_access.py:95-127);
    # flag it corrupt rather than silently appending a NULL metric.
    numerics = {
        "port": _field(parts, 3).try_cast("long"),
        "bytesin": _field(parts, 5).try_cast("long"),
        "bytesout": _field(parts, 6).try_cast("long"),
        "microsecs": _field(parts, 7).try_cast("long"),
        "status": _field(parts, 8).try_cast("long"),
    }
    bad_numeric = F.lit(False)
    for c in numerics.values():
        bad_numeric = bad_numeric | c.isNull()
    parsed = lines.select(
        v.alias("_raw"),
        ts.alias("timestamp"),
        reencode(_field(parts, 2)).alias("host"),
        numerics["port"].alias("port"),
        _field(parts, 4).alias("src_addr"),
        F.substring(tail_str(1), 1, 255).alias("authuser"),
        numerics["bytesin"].alias("bytesin"),
        numerics["bytesout"].alias("bytesout"),
        numerics["microsecs"].alias("microsecs"),
        numerics["status"].alias("status"),
        F.substring(tail_str(2), 1, 2048).alias("reqline"),
        F.substring(tail_str(3), 1, 255).alias("method"),
        F.substring(tail_str(4), 1, 2048).alias("path"),
        F.substring(tail_str(5), 1, 255).alias("protocol"),
        F.substring(tail_str(6), 1, 2048).alias("referer"),
        F.substring(tail_str(7), 1, 2048).alias("user_agent"),
        (
            (F.size(parts) < 9)
            | ts.isNull()
            | tail.isNull()
            | (F.size(tail) != 7)
            | bad_numeric
            | bad_utf8(_field(parts, 2))
            | bad_utf8(F.try_element_at(tail, F.lit(1)))
            | bad_utf8(F.try_element_at(tail, F.lit(2)))
            | bad_utf8(F.try_element_at(tail, F.lit(3)))
            | bad_utf8(F.try_element_at(tail, F.lit(4)))
            | bad_utf8(F.try_element_at(tail, F.lit(5)))
            | bad_utf8(F.try_element_at(tail, F.lit(6)))
            | bad_utf8(F.try_element_at(tail, F.lit(7)))
        ).alias("_corrupt"),
    )
    return parsed


def good_events(parsed: DataFrame) -> DataFrame:
    """Clean rows in table-schema column order."""
    return parsed.filter(~F.col("_corrupt")).select(
        *[f.name for f in APACHE_EVENT_SCHEMA.fields]
    )


def dead_letters(parsed: DataFrame, source: str = "apache-access") -> DataFrame:
    """K2 dead-letter records in the reference's JSON error shape
    (apache_access.py:130-139: time/line/error fields)."""
    return parsed.filter(F.col("_corrupt")).select(
        F.to_json(
            F.struct(
                F.date_format(
                    F.current_timestamp(), "yyyy-MM-dd'T'HH:mm:ss'Z'"
                ).alias("time"),
                F.lit(source).alias("source"),
                F.col("_raw").alias("line"),
                F.lit("ParseError").alias("error_type"),
            )
        ).alias("error_json")
    )
