"""Regression: queries must work under an externally-built vanilla session.

The correctness driver constructs its own SparkSession without any of
get_spark()'s configs — in round 1 every events-backed query crashed with
PARQUET_TYPE_ILLEGAL because spark.sql.legacy.parquet.nanosAsLong was only
set at our builder. load_table now sets it at runtime; this test simulates
a vanilla session by forcing the conf to its default (false) on a fresh
newSession() and checking the read still succeeds.
"""

from __future__ import annotations

import pytest

from logsdb_spark.catalog import load_table
from logsdb_spark.plans.reference_queries import a1_top_event_types

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def vanilla(spark):
    # newSession shares the JVM but has its own SQLConf; force the legacy
    # nanos knob off to mimic a session built with no configs at all.
    s = spark.newSession()
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    s.conf.set("spark.sql.session.timeZone", "UTC")
    return s


def test_load_events_under_vanilla_session(vanilla):
    df = load_table(vanilla, SF_DIR, "events")
    assert df.schema["ts"].dataType.typeName() == "timestamp"
    assert df.limit(1).count() >= 0


def test_a1_under_vanilla_session(vanilla):
    out = a1_top_event_types(vanilla, SF_DIR)
    rows = out.collect()
    assert len(rows) > 0


@pytest.mark.slow
def test_every_query_analyzes_under_vanilla_session(vanilla):
    """Generalize the round-1 failure class: EVERY registered query
    must at least pass analysis (schema resolution, parquet type
    mapping) under an externally-built session with default confs —
    a query whose plan only resolves under get_spark()'s configs is
    a driver crash waiting to happen. Analysis-only keeps this fast;
    execution parity is the oracle suite's job."""
    from logsdb_spark.registry import REGISTRY, all_queries

    all_queries()
    failures = {}
    for name, q in sorted(REGISTRY.items()):
        try:
            cols = q.spark_fn(vanilla, SF_DIR).columns
            assert cols, f"{name}: no columns"
        except Exception as e:  # noqa: BLE001 — collecting all failures
            failures[name] = repr(e)[:200]
    assert not failures, failures
