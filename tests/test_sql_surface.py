"""The spark.sql() surface: a user who prefers SQL text over the
DataFrame API gets the same catalog (register_views — the S5
DDL-on-connect analogue) and the same results. Pins that the views are
queryable, joinable, and agree with the DataFrame-API plans.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from logsdb_spark.catalog import register_views

from conftest import SF_DIR


def test_sql_text_matches_dataframe_aggregate(spark):
    register_views(spark, SF_DIR)
    sql = spark.sql(
        """
        SELECT event_type, COUNT(*) AS qty, ROUND(SUM(value), 4) AS sum_value
        FROM events GROUP BY event_type ORDER BY qty DESC, event_type
        """
    ).collect()
    ev = spark.table("events")
    df = (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("qty"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .orderBy(F.desc("qty"), F.asc("event_type"))
        .collect()
    )
    assert [tuple(r) for r in sql] == [tuple(r) for r in df]


def test_sql_text_join_over_views(spark):
    register_views(spark, SF_DIR)
    got = spark.sql(
        """
        SELECT n.n_name, COUNT(*) AS n_cust
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name ORDER BY n_cust DESC, n.n_name LIMIT 5
        """
    ).collect()
    assert len(got) == 5
    assert all(r.n_cust > 0 for r in got)


def test_views_see_converted_event_timestamps(spark):
    """The nanos→timestamp conversion must hold on the SQL path too —
    a view exposing raw int64 ts would silently break SQL users."""
    register_views(spark, SF_DIR)
    dt = dict(spark.table("events").dtypes)["ts"]
    assert dt == "timestamp"
    r = spark.sql("SELECT MIN(ts) AS lo, MAX(ts) AS hi FROM events").collect()[0]
    assert r.lo.year >= 2020 and r.hi.year <= 2100
