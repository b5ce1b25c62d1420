#!/usr/bin/env python
"""Cold-vs-warm timing evidence for the bench profile: run every
headline query twice in one session and report both times. The delta
is per-query planning + Janino codegen (paid once per session), which
dominates `bench.py`'s cold numbers at local scale and amortizes to
zero on a long-lived cluster session — this script is the measurement
behind that README claim.

Usage: python scripts/warm_bench.py  (honors SPARK_GRAFT_SF_DIR)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE, TRACKED_EXTRAS  # noqa: E402
from logsdb_spark.registry import all_queries  # noqa: E402
from logsdb_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("logsdb-warm-bench")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    out = {}
    for name in HEADLINE + TRACKED_EXTRAS:
        fn = queries[name]
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        cold = time.perf_counter() - t0
        t1 = time.perf_counter()
        fn(spark, sf_dir).count()
        warm = time.perf_counter() - t1
        out[name] = {"cold": round(cold, 3), "warm": round(warm, 3)}
    totals = {
        "cold_total": round(sum(v["cold"] for v in out.values()), 3),
        "warm_total": round(sum(v["warm"] for v in out.values()), 3),
    }
    print(json.dumps({"sf_dir": sf_dir, **totals, "queries": out}))


if __name__ == "__main__":
    sys.exit(main())
