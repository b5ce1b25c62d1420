"""Scalar functions (SURVEY §2.8) — all built-in Catalyst expressions,
no Python UDFs in the hot path.

Reference citations (into /root/reference/src/logsdb/):
- F1 ``longint``     core.py:51-57  (digit-group in 3s with spaces)
- F2 ``iso8601_Z``   core.py:64-65
- F4 ``reencode``    apache_access.py:146-147 (latin-1 → utf-8)
- F7 truncate        maillog.py:98  (subject[:2048])
- F8 domain extract  maillog.py:124-128
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def longint(col: Column | str) -> Column:
    """F1: 1234567 -> '1 234 567' (core.py:51-57). JVM-side:
    format_number gives comma groups; swap commas for spaces."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.format_number(c.cast("long"), 0), ",", " ")


def iso8601_z(ts: Column | str) -> Column:
    """F2/F10: UTC render '%Y-%m-%dT%H:%M:%SZ' (core.py:64-65)."""
    c = F.col(ts) if isinstance(ts, str) else ts
    return F.date_format(c, "yyyy-MM-dd'T'HH:mm:ss'Z'")


def reencode(col: Column | str) -> Column:
    """F4: undo Apache's latin-1 mangling of utf-8 bytes
    (apache_access.py:146-147). encode(iso-8859-1) is byte-identity for
    latin-1 text, then decode as utf-8.

    The decode is GATED on is_valid_utf8: Spark 4's ANSI decode throws
    MALFORMED_CHARACTER_CODING on genuinely-latin-1 bytes, which would
    kill the whole batch for one bad line. The reference is stricter
    still: it prints ONE error record for the first bad line and
    ``sys.exit(1)``s the whole ingest (apache_access.py:128-143) —
    mirrored by our strict=True ingest mode. Returning NULL here is the
    deliberate lenient divergence: the caller's corrupt flag (see
    bad_reencode) dead-letters exactly those rows and keeps going."""
    c = F.col(col) if isinstance(col, str) else col
    raw = F.encode(c, "ISO-8859-1")
    return F.when(F.is_valid_utf8(raw), F.decode(raw, "UTF-8"))


def bad_reencode(col: Column | str) -> Column:
    """True when ``reencode`` would reject the value: non-null input
    whose latin-1 bytes are not valid UTF-8 — the rows the reference
    dead-letters with UnicodeDecodeError."""
    c = F.col(col) if isinstance(col, str) else col
    return c.isNotNull() & ~F.is_valid_utf8(F.encode(c, "ISO-8859-1"))


def truncate2048(col: Column | str) -> Column:
    """F7: subject[:2048] (maillog.py:98)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.substring(c, 1, 2048)


def email_domain(col: Column | str) -> Column:
    """F8: address.partition('@')[2], lowercased (maillog.py:124-128)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.substring_index(c, "@", -1))
