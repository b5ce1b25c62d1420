#!/usr/bin/env python
"""Round-13 optimization probe: isolate named queries per guide §1.

Times each named query with BOTH the bench action (.count(), the
committed methodology) and the noop sink (guide §1.4 — computes every
column, no short-circuit), and dumps `.explain("formatted")` to
plans/r13/<query>_<tag>.txt. Job descriptions label the UI (§1.5).

Usage:
  python scripts/opt_probe_r13.py --tag before q1 q2 ...
  python scripts/opt_probe_r13.py --tag before --reps 3 --no-plans q1
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from logsdb_spark.registry import all_queries  # noqa: E402
from logsdb_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--tag", default="probe")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--no-plans", action="store_true")
    ap.add_argument("--sf-dir",
                    default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                           "/root/testdata/sf0.1"))
    ap.add_argument("--out", default=None,
                    help="optional JSON file for the timings")
    args = ap.parse_args()

    spark = get_spark("opt-probe-r13")
    spark.sparkContext.setLogLevel("ERROR")

    import bench

    bench.warm_up(spark, args.sf_dir)

    qs = all_queries()
    plans_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r13")
    os.makedirs(plans_dir, exist_ok=True)

    results: dict[str, dict] = {}
    for name in args.queries:
        fn = qs[name]
        counts: list[float] = []
        noops: list[float] = []
        for rep in range(args.reps):
            spark.sparkContext.setJobDescription(f"{name} count rep{rep}")
            t0 = time.perf_counter()
            fn(spark, args.sf_dir).count()
            counts.append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
            gc.collect()
            spark.sparkContext.setJobDescription(f"{name} noop rep{rep}")
            t0 = time.perf_counter()
            (fn(spark, args.sf_dir).write.format("noop")
             .mode("overwrite").save())
            noops.append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
            gc.collect()
        spark.sparkContext.setJobDescription(None)
        if not args.no_plans:
            mode = (spark._jvm.org.apache.spark.sql.execution.ExplainMode
                    .fromString("formatted"))
            plan = (fn(spark, args.sf_dir)._jdf.queryExecution()
                    .explainString(mode))
            with open(os.path.join(plans_dir, f"{name}_{args.tag}.txt"),
                      "w") as fh:
                fh.write(plan)
        results[name] = {
            "count_s": counts, "noop_s": noops,
            "count_min": min(counts), "noop_min": min(noops),
        }
        print(json.dumps({name: results[name]}), flush=True)

    if args.out:
        with open(args.out, "w") as fh:
            json.dump(results, fh, indent=1, sort_keys=True)


if __name__ == "__main__":
    main()
