#!/usr/bin/env python
"""Benchmark runner: times the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed to completion (count() forces the full plan —
every query here ends in an agg/sort/limit so count() is not
short-circuitable) after a warm-up of the input file listing.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

from logsdb_spark.registry import all_queries
from logsdb_spark.session import get_spark

HEADLINE = [
    "a1_top_event_types",
    "a3_top_users",
    "a5_first_seen_dedup",
    "j2_bridge_collect",
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q6_forecast_revenue",
    "tpch_q9_product_profit",
    "tpch_q10_returned_items",
    "tpch_q13_customer_distribution",
    "tpch_q18_large_orders",
    "tpch_q21_waiting_suppliers",
    "dedup_minhash_lsh",
    "knn_cosine_bruteforce",
    "ann_ivf",
    "sessionize_events",
    "asof_join_purchase_view",
    "range_join_error_clicks",
    "winnow_fingerprint",
    "text_quality_stats",
    # round-2 scale-path additions: ranged total order (no global
    # window) and IVF-blocked embedding dedup (no O(n^2) self-join)
    "o2_total_order_ranged",
    "dedup_embedding_ann",
    # round-2 pipeline analytics: ordered funnel, cohort curves,
    # PII scrub (scan-local regex)
    "funnel_daily_conversion",
    "cohort_retention",
    "text_pii_redact",
    # time-series conditioning: dense-grid resample and single-pass
    # OHLC bars (aggregate form, no window sort)
    "gap_fill_daily_counts",
    "daily_ohlc_bars",
    "grouping_sets_revenue",
    # native one-call sessionization and token-budget mixture fill
    "session_window_native",
    "mixture_token_budget",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([\d.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = get_spark("logsdb-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm-up (excluded from timings, standard bench methodology):
    # exercises codegen/JIT, the shuffle machinery, and the parquet
    # reader once, so the first timed query doesn't absorb session
    # startup. Does NOT pre-execute any benched query.
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(os.path.join(sf_dir, "events.parquet")).limit(1000).groupBy(
        "event_type"
    ).count().collect()

    queries = all_queries()
    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = queries[name]
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
