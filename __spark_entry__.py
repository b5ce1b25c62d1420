"""Driver contract for the spark-graft builder (PySpark target).

All queries live in ``logsdb_spark.registry`` — one registered entry per
operator from SURVEY.md §2 (reference parity) and §2.12 (*[extension]*
LLM-pipeline operators), each carrying its DuckDB oracle SQL where the
semantics are SQL-expressible.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from logsdb_spark.registry import all_oracles, all_queries

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY §7 Phase 0): the A1 'top requests'
    analogue — windowed hash-agg with multi-key sort over events
    (reference: apache_access.py:59-70)."""
    return all_queries()["a1_top_event_types"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator (SURVEY.md §2 inventory)."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; hash-seeded operators (SimHash,
    hyperplane ANN) are intentionally absent → rows-only check."""
    return all_oracles()
