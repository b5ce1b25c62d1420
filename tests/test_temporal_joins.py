"""Edge-case pins for operators/temporal.py (the oracle differential
covers the bulk semantics on real data; these pin the boundaries the
corpus may not happen to exercise): as-of inclusivity at equal
timestamps, no-prior-match nulls, and the exact range-window borders
of the bucketed interval join.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from logsdb_spark.operators.temporal import asof_join, range_count_join


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


def test_asof_join_picks_latest_prior_inclusive(spark):
    left = spark.createDataFrame(
        [(1, "u", _ts("2024-01-01 10:00:00")),
         (2, "u", _ts("2024-01-01 12:00:00")),
         (3, "v", _ts("2024-01-01 09:00:00"))],
        "lid long, user string, lts timestamp",
    )
    right = spark.createDataFrame(
        [("u", _ts("2024-01-01 09:59:00"), 1.0),
         ("u", _ts("2024-01-01 10:00:00"), 2.0),   # ties lts of lid=1 → inclusive
         ("u", _ts("2024-01-01 11:00:00"), 3.0),
         ("v", _ts("2024-01-01 09:30:00"), 9.0)],  # AFTER v's only left row
        "user string, rts timestamp, val double",
    )
    out = {
        r["lid"]: (r["rts"], r["val"])
        for r in asof_join(
            left, right, key="user", left_ts="lts", right_ts="rts",
            payload=["rts", "val"],
        ).collect()
    }
    assert out[1] == (_ts("2024-01-01 10:00:00"), 2.0)  # equal ts matches
    assert out[2] == (_ts("2024-01-01 11:00:00"), 3.0)  # latest prior, not first
    assert out[3] == (None, None)                       # no prior → nulls


def test_asof_join_keeps_all_left_rows(spark):
    left = spark.range(5).select(
        F.col("id").alias("lid"),
        F.lit("k").alias("user"),
        F.timestamp_seconds(F.col("id") * 60 + 1_700_000_000).alias("lts"),
    )
    right = left.limit(0).select(
        F.col("user"), F.col("lts").alias("rts"), F.lit(0.0).alias("val")
    )
    out = asof_join(left, right, "user", "lts", "rts", ["val"])
    assert out.count() == 5
    assert all(r["val"] is None for r in out.collect())


def test_range_count_join_exact_borders(spark):
    base = 1_700_000_000
    left = spark.createDataFrame(
        [(1, "u", base)], "eid long, user string, sec long"
    ).select("eid", "user", F.timestamp_seconds("sec").alias("ts"))
    # right rows at: exactly -600s (in), -601s (out), 0s (in), +1s (out,
    # future), and -300s for another user (out, key mismatch)
    right = spark.createDataFrame(
        [("u", base - 600), ("u", base - 601), ("u", base),
         ("u", base + 1), ("w", base - 300)],
        "user string, sec long",
    ).select("user", F.timestamp_seconds("sec").alias("ts"))
    out = range_count_join(
        left, right, key="user", left_ts="ts", right_ts="ts",
        range_seconds=600, left_id="eid", count_alias="n",
    ).collect()
    assert len(out) == 1 and out[0]["n"] == 2


def test_range_count_join_zero_when_no_match(spark):
    left = spark.createDataFrame(
        [(7, "u", 1_700_000_000)], "eid long, user string, sec long"
    ).select("eid", "user", F.timestamp_seconds("sec").alias("ts"))
    right = left.limit(0).select("user", "ts")
    out = range_count_join(
        left, right, "user", "ts", "ts", 600, left_id="eid", count_alias="n"
    ).collect()
    assert len(out) == 1 and out[0]["n"] == 0


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_asof_join_plans_one_window_no_join(spark):
    """The as-of join must compile to a window over a union — ONE hash
    exchange on the key, zero join operators (the naive formulation is
    a per-row lookback join; the nested-loop plan it would get is the
    regression this pins against)."""
    from logsdb_spark.plans.extensions import asof_join_purchase_view

    from conftest import SF_DIR

    df = asof_join_purchase_view(spark, SF_DIR)
    plan = _plan(df)
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "Join" not in plan, plan          # no join operator at all
    assert "Window" in plan, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_range_join_plans_hash_join_not_nested_loop(spark):
    """The bucketed range join must plan as a hash-partitioned
    equi-join (SMJ or SHJ) — never the BroadcastNestedLoopJoin that a
    raw inequality join degenerates to."""
    from logsdb_spark.plans.extensions import range_join_error_clicks

    from conftest import SF_DIR

    plan = _plan(range_join_error_clicks(spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan) or (
        "BroadcastHashJoin" in plan
    ), plan


def test_asof_attaches_latest_row_even_with_null_payload(spark):
    """A matched right row whose payload value is NULL must win over an
    older non-null one (merge_asof attaches the latest ROW, nulls
    included) — the per-column last(ignorenulls) regression."""
    from logsdb_spark.operators.temporal import asof_join

    left = spark.createDataFrame([(1, 100)], "k int, lts int")
    right = spark.createDataFrame(
        [(1, 10, 7.0), (1, 50, None)], "k int, rts int, v double"
    )
    out = asof_join(left, right, "k", "lts", "rts", ["v"]).collect()
    assert len(out) == 1
    assert out[0].v is None  # latest row (rts=50) wins, its NULL and all


def test_asof_rejects_colliding_payload_names(spark):
    import pytest as _pytest

    from logsdb_spark.operators.temporal import asof_join

    left = spark.createDataFrame([(1, 100, 1.0)], "k int, lts int, v double")
    right = spark.createDataFrame([(1, 10, 7.0)], "k int, rts int, v double")
    with _pytest.raises(ValueError, match="collide"):
        asof_join(left, right, "k", "lts", "rts", ["v"])
