"""Query registry: the single source of truth for the engine's query
surface.

Every operator from SURVEY.md §2 (and each *[extension]* operator) is
registered here as a named entry carrying:

- ``spark_fn(spark, sf_dir) -> DataFrame`` — the Spark-first plan
- ``oracle``  — equivalent ANSI SQL for the DuckDB differential gate,
  or ``None`` for genuinely non-SQL-expressible ops (driver then runs a
  rows-only check)

``__spark_entry__.queries()`` / ``oracle_sql()`` and the local pytest
differential harness both read from this registry, so a query cannot be
"done" without being gated.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    spark_fn: SparkFn
    oracle: str | None
    doc: str


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None = None) -> Callable[[SparkFn], SparkFn]:
    """Decorator: register ``fn`` as query ``name`` with its oracle SQL."""

    def deco(fn: SparkFn) -> SparkFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Query(name=name, spark_fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco


def all_queries() -> dict[str, SparkFn]:
    _ensure_loaded()
    return {name: q.spark_fn for name, q in REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _ensure_loaded()
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}


def _ensure_loaded() -> None:
    # Import the plan modules for their registration side effects.
    from .plans import load_all_plans

    load_all_plans()
