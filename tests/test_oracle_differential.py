"""Local mirror of the driver's t2 correctness gate: run every
registered query on Spark and its oracle on DuckDB over the same
parquet, compare row count, column names, and an order-insensitive
value multiset (floats rounded to 6 sig-figs before compare — the
queries themselves already ROUND(4) anything engine-jitter-prone).
"""

from __future__ import annotations

import math

import duckdb
import pytest

from logsdb_spark import TABLES
from logsdb_spark.registry import REGISTRY, all_oracles, all_queries

from conftest import SF_DIR


def _canon(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6g}"
    if isinstance(v, int):
        return f"{v:.6g}" if abs(v) < 2**52 else str(v)
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    return str(v)


def _duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


ORACLES = all_oracles()
QUERY_NAMES = sorted(all_queries())


@pytest.mark.parametrize("name", [n for n in QUERY_NAMES if n in ORACLES])
def test_query_matches_oracle(spark, name):
    q = REGISTRY[name]
    sdf = q.spark_fn(spark, SF_DIR)
    spark_cols = sorted(sdf.columns)
    spark_rows = sdf.collect()

    con = _duck_con(SF_DIR)
    res = con.execute(q.oracle)
    duck_cols = sorted(d[0] for d in res.description)
    duck_rows = res.fetchall()

    assert spark_cols == duck_cols, f"{name}: column mismatch"
    assert len(spark_rows) == len(duck_rows), f"{name}: row count"

    # order-insensitive: canonicalize each row as a dict keyed by column
    def row_key(row, cols_in_order):
        d = dict(zip(cols_in_order, row))
        return tuple(_canon(d[c]) for c in spark_cols)

    s_set = sorted(row_key(tuple(r), sdf.columns) for r in spark_rows)
    d_set = sorted(
        row_key(r, [d[0] for d in res.description]) for r in duck_rows
    )
    mismatches = [
        (a, b) for a, b in zip(s_set, d_set) if a != b
    ]
    assert not mismatches, f"{name}: first diffs {mismatches[:3]}"


@pytest.mark.parametrize("name", [n for n in QUERY_NAMES if n not in ORACLES])
def test_rows_only_query_runs(spark, name):
    q = REGISTRY[name]
    sdf = q.spark_fn(spark, SF_DIR)
    assert sdf.count() >= 0
    assert len(sdf.columns) > 0
