#!/usr/bin/env python
"""10x scale probe: replicate the sf0.1 fact tables tenfold (key-shifted
so uniqueness-bearing keys stay unique) into a local sf1-equivalent
dataset, run the relational headline queries at both scales in ONE
warmed session, and print the per-query time ratio.

Purpose: measured evidence for the scaling claims in README "Scale
design" — a plan whose runtime grows ~linearly (ratio ~10x or less on
32 local cores, where small inputs underuse the cores) has no hidden
quadratic/SPOF stage at this step size. The dedup/ANN pipelines are
EXCLUDED by design: replicating documents/embeddings 10x manufactures
10-way true-duplicate groups, which changes the workload's character
(pair output grows quadratically in group size because the ANSWER
does) rather than its scale.

Usage: python scripts/scale_probe.py  [--rebuild]
Writes the replicated dataset to /tmp/logsdb_scale_probe/sf1 once and
reuses it; --rebuild forces a rewrite.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bench import warm_up  # noqa: E402
from logsdb_spark.registry import all_queries  # noqa: E402
from logsdb_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
DST = "/tmp/logsdb_scale_probe/sf1"
COPIES = 10

# key columns that must stay unique per copy (shifted by copy index);
# FK columns shift with their PK so join fan-in is preserved per copy.
SHIFTS = {
    "events": {"event_id": 10_000_000_000},
    "orders": {"o_orderkey": 10_000_000_000, "o_custkey": 0},
    "lineitem": {"l_orderkey": 10_000_000_000},
    "customer": {},
    "supplier": {},
    "part": {},
    "nation": {},
    "region": {},
}
FACTS = {"events", "orders", "lineitem"}

QUERIES = [
    "a1_top_event_types",
    "a3_top_users",
    "a5_first_seen_dedup",
    "j2_bridge_collect",
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q9_product_profit",
    "tpch_q21_waiting_suppliers",
    "sessionize_events",
    "gap_fill_daily_counts",
    "salted_top_users",
    "dq_expectations_events",
    "snapshot_diff_events",
]


_SENTINEL = os.path.join(DST, "_BUILD_COMPLETE")


def build(spark) -> None:
    # rebuild from scratch if a previous build died midway — a partial
    # dataset would silently corrupt the measured ratios
    if os.path.isdir(DST):
        shutil.rmtree(DST)
    os.makedirs(os.path.dirname(DST), exist_ok=True)
    for name, shifts in SHIFTS.items():
        src = os.path.join(SRC, f"{name}.parquet")
        dst = os.path.join(DST, f"{name}.parquet")
        df = spark.read.parquet(src)
        if name in FACTS:
            parts = []
            for i in range(COPIES):
                p = df
                for col, step in shifts.items():
                    if step:
                        p = p.withColumn(col, F.col(col) + F.lit(i * step))
                parts.append(p)
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
        else:
            out = df
        out.write.mode("overwrite").parquet(dst)
    with open(_SENTINEL, "w") as fh:
        fh.write("ok\n")


def main() -> None:
    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    if "--rebuild" in sys.argv and os.path.isdir(DST):
        shutil.rmtree(DST)
    if not os.path.exists(_SENTINEL):
        build(spark)
    warm_up(spark, SRC)

    results = {}
    queries = all_queries()
    for name in QUERIES:
        fn = queries[name]
        t0 = time.perf_counter()
        fn(spark, SRC).count()
        t_small = time.perf_counter() - t0
        t0 = time.perf_counter()
        fn(spark, DST).count()
        t_big = time.perf_counter() - t0
        results[name] = {
            "sf0.1_s": round(t_small, 3),
            "sf1_s": round(t_big, 3),
            "ratio": round(t_big / t_small, 2),
        }
    print(json.dumps({"copies": COPIES, "queries": results}))


if __name__ == "__main__":
    main()
