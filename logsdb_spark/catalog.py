"""Table catalog: load the driver's parquet tables for a scale-factor dir.

The reference creates its schema on connect (core.py:26-28,
``Base.metadata.create_all``); our analogue is idempotent registration of
the parquet-backed tables as temp views, so both the DataFrame API and
``spark.sql`` paths see the same catalog.
"""

from __future__ import annotations

import os
import weakref
from collections import OrderedDict

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType

from . import TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


# Memoized per SESSION OBJECT (``spark.newSession()`` shares the
# applicationId but has its own conf state, so keying on the session
# instance is what keeps a sibling session from being handed a
# DataFrame bound to different timeZone/ANSI confs) then per
# (sf_dir, table) → (source mtime, DataFrame). Repeated query builds in
# one session (the bench loop, the driver's 50-query correctness sweep)
# reuse the same analyzed scan instead of re-listing files and
# re-reading footers per build. Storing ONE (mtime, df) per table —
# replaced, not accumulated, when an in-place overwrite bumps the
# mtime — makes the cache self-invalidating without stranding stale
# DataFrames for the session's lifetime.
#
# Sessions are tracked in a small LRU, NOT a WeakKeyDictionary: a
# cached DataFrame strongly references its session (df._session), so
# weak keys would never be collected (the documented value-refers-to-
# key weakref pitfall) and stopped sessions would leak for the process
# lifetime. Capping distinct sessions at _MAX_SESSIONS drops the whole
# sub-dict of the least-recently-used session, releasing the only
# strong references this module holds so the session CAN be GC'd. The
# identity check against a weakref guards id() reuse after collection.
_MAX_SESSIONS = 4
_TABLE_CACHE: "OrderedDict[int, tuple[weakref.ref, dict]]" = OrderedDict()


def _session_cache(spark: SparkSession) -> dict:
    sid = id(spark)
    ent = _TABLE_CACHE.get(sid)
    if ent is None or ent[0]() is not spark:
        _TABLE_CACHE[sid] = ent = (weakref.ref(spark), {})
    _TABLE_CACHE.move_to_end(sid)
    while len(_TABLE_CACHE) > _MAX_SESSIONS:
        _TABLE_CACHE.popitem(last=False)
    return ent[1]


def _cache_get(spark: SparkSession, sf_dir: str, name: str,
               mtime: int) -> DataFrame | None:
    ent = _session_cache(spark).get((sf_dir, name))
    if ent is not None and ent[0] == mtime:
        return ent[1]
    return None


def _cache_put(spark: SparkSession, sf_dir: str, name: str, mtime: int,
               df: DataFrame) -> None:
    _session_cache(spark)[(sf_dir, name)] = (mtime, df)


def _pin_session_confs(spark: SparkSession) -> None:
    """Pin the engine's timestamp contract on EVERY catalog read.

    - spark.sql.legacy.parquet.nanosAsLong: events.ts is parquet
      TIMESTAMP(NANOS) — older Sparks raise PARQUET_TYPE_ILLEGAL
      without it (Spark >= 4.1 ignores it and reads NTZ natively).
    - spark.sql.session.timeZone=UTC: the engine's timestamp semantics
      are naive-UTC end-to-end (the reference stores tz-aware UTC,
      core.py:17-18; the DuckDB oracle reads the same parquet as
      naive-UTC). The NTZ->LTZ normalization below and every
      epoch/window expression downstream depend on this pin — it is a
      DOCUMENTED SIDE EFFECT on externally built sessions (README
      "Timestamp contract"): a caller that needs a different session
      zone must not share the session with this catalog. A failure to
      set it is loud: silently JVM-zone-dependent results are worse
      than an error.

    Deliberately NOT memoized: SQL confs are per-SparkSession state
    (``spark.newSession()`` shares the applicationId but has its own
    mutable conf, and a caller can reset the zone at any time), so the
    only safe re-established invariant is setting both confs on every
    call — two cheap py4j conf writes."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def _source_mtime(path: str) -> int:
    try:
        return os.stat(path).st_mtime_ns
    except OSError:
        return -1


def read_raw(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Raw parquet scan with NO column normalization (events.ts stays
    its on-disk read type: int64 ns on legacy Sparks, TIMESTAMP_NTZ on
    Spark >= 4.1). Predicates a caller applies against the raw column
    reach the parquet reader as PushedFilters — the normalization cast
    in load_table would otherwise hide them from row-group pruning."""
    _pin_session_confs(spark)
    path = os.path.join(sf_dir, f"{name}.parquet")
    mtime = _source_mtime(path)
    df = _cache_get(spark, sf_dir, f"_raw_{name}", mtime)
    if df is None:
        df = spark.read.parquet(path)
        _cache_put(spark, sf_dir, f"_raw_{name}", mtime, df)
    return df


def normalize_events_ts(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Normalize the version-dependent raw ts read type to a session-tz
    TimestampType so every downstream expression (unix_micros, windows,
    watermarks) sees one type. int64 ns converts via ``ts div 1000`` —
    integer division, since ns epochs ~1.7e18 exceed double's 2^53
    exact range; NTZ casts value-exactly under the pinned UTC session
    zone. Sub-µs truncation is semantically invisible to every query
    here (see plans/reference_queries.py ordering notes)."""
    dt = df.schema[ts_col].dataType
    if isinstance(dt, LongType):
        return df.withColumn(ts_col, F.timestamp_micros(F.expr(f"{ts_col} div 1000")))
    if isinstance(dt, TimestampNTZType):
        return df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Columnar parquet scan — Catalyst pushes filters/pruning into it.
    events.ts is normalized to TimestampType (see normalize_events_ts);
    results are memoized per (session, dir, table, mtime)."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    mtime = _source_mtime(path)
    df = _cache_get(spark, sf_dir, name, mtime)
    if df is None:
        df = read_raw(spark, sf_dir, name)
        if name == "events":
            df = normalize_events_ts(df)
        _cache_put(spark, sf_dir, name, mtime, df)
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every PRESENT table as a temp view (idempotent, like
    the reference's create_all-on-connect — absent tables are simply
    not there yet; a CLI ingest dir starts empty and grows sinks as
    sources run)."""
    dfs = {}
    for name in TABLES:
        if os.path.exists(os.path.join(sf_dir, f"{name}.parquet")):
            dfs[name] = load_table(spark, sf_dir, name)
            dfs[name].createOrReplaceTempView(name)
    return dfs
