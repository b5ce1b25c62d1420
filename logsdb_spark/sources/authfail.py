"""S2 — sshd auth-failure source (reference: src/logsdb/authfail.py:48-97).

Two syslog shapes (authfail.py:48-62), both optionally wrapped in a
"message repeated N times: [ ... ]" prefix:

1. ``Failed <method> for [invalid user] <username> from <ip> port <n> ssh2``
   where <method> is password / keyboard-interactive/pam / none
2. ``Invalid user <username> from <ip> port <n>``

The line starts with an ISO-8601 timestamp token (authfail.py:74).
First-match-wins (authfail.py:70-79); any unmatched line is an error
(authfail.py:80-81) → here a ``_corrupt`` row for the dead-letter
sink, with strictness left to the caller.

The patterns below are built fresh for Spark's RE2-compatible Java
regex — functionally equivalent to the reference's, not copies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    StringType,
    StructField,
    StructType,
    TimestampType,
)

AUTHFAIL_SCHEMA = StructType(
    [
        StructField("timestamp", TimestampType()),
        StructField("username", StringType()),
        StructField("src_addr", StringType()),
    ]
)

# Functionally equivalent to the reference patterns (authfail.py:48-62),
# re-derived for Java regex and positional groups; anchored because the
# reference uses fullmatch (authfail.py:72). The leading tokens are
# "<iso-timestamp> <hostname> sshd[pid]:"; an optional syslog
# "message repeated N times: [" wrapper precedes the message.
_PREFIX = r"^(\S+) \S+ sshd\[\d+\]:(?: message repeated \d+ times: \[)?"

# Shape 1: Failed <method> for [invalid user] <user> from <ip> port <n> ssh2
FAILED_RE = (
    _PREFIX
    + r" Failed (?:password|keyboard-interactive/pam|none) for (?:invalid user )?"
    + r"(.+?) from (\S+) port \d+ ssh2\]?\s*$"
)

# Shape 2: Invalid user <user> from <ip> port <n>. The trailing \]?
# closes _PREFIX's optional "message repeated N times: [" wrapper —
# the reference's own pattern (authfail.py:56-58) omits it, so a
# wrapped Invalid-user line makes the reference HALT as unparsable;
# here the same line parses (deliberate divergence: the wrapper is
# real syslog behavior and the module contract says both shapes
# accept it), keeping brute-force counts complete.
INVALID_RE = _PREFIX + r" Invalid user (.*?) from (\S+) port \d+\]?\s*$"


def parse_authfail_lines(lines: DataFrame, value_col: str = "value") -> DataFrame:
    """value:string → (timestamp, username, src_addr, _corrupt, _raw).

    regexp_extract per field with first-match-wins across the two
    shapes (authfail.py:70-79); timestamp is the leading ISO-8601
    token parsed with to_timestamp (authfail.py:74). All JVM-side.
    """
    v = F.col(value_col)
    ts = F.try_to_timestamp(F.substring_index(v, " ", 1))
    m1 = v.rlike(FAILED_RE)
    m2 = v.rlike(INVALID_RE)
    username = F.when(m1, F.regexp_extract(v, FAILED_RE, 2)).otherwise(
        F.regexp_extract(v, INVALID_RE, 2)
    )
    src_addr = F.when(m1, F.regexp_extract(v, FAILED_RE, 3)).otherwise(
        F.regexp_extract(v, INVALID_RE, 3)
    )
    return lines.select(
        v.alias("_raw"),
        ts.alias("timestamp"),
        username.alias("username"),
        src_addr.alias("src_addr"),
        (ts.isNull() | ~(m1 | m2)).alias("_corrupt"),
    )


def good_events(parsed: DataFrame) -> DataFrame:
    return parsed.filter(~F.col("_corrupt")).select(
        *[f.name for f in AUTHFAIL_SCHEMA.fields]
    )


def dead_letters(parsed: DataFrame, source: str = "authfail") -> DataFrame:
    """K2 dead-letter rows (authfail.py:82-97 JSON error shape)."""
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
