#!/usr/bin/env python
"""Mirror of the external correctness driver, run locally before each
round: a *vanilla* SparkSession (none of get_spark()'s configs), every
registered query executed at sf0.01, its DuckDB oracle run on the same
parquet, and rows / schema / order-insensitive canonical values compared
— the same three signals CORRECTNESS_r{N}.json records.

Round 1 taught us the failure mode is environment drift (the driver's
session lacked our parquet-nanos conf), not query logic; this script
exists so that class of bug is caught on our side first.

Usage: python scripts/driver_mirror.py [sf_dir] [name_filter]
                                       [--sample N] [--seed R]
Prints one line per query and a JSON summary tail. ``--sample N
--seed R`` checks a seeded random N-query slice (cheap rotating
coverage — the external driver's own CORRECTNESS_r*.json sample is a
FIXED 50 chosen in round 1, blind to later additions); the full
no-args run is the real gate and its tail goes in the round-final
commit message.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

from logsdb_spark import TABLES  # noqa: E402
from logsdb_spark.registry import all_oracles, all_queries  # noqa: E402


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


def main() -> int:
    argv = list(sys.argv[1:])
    sample_n = sample_seed = None
    if "--sample" in argv:
        i = argv.index("--sample")
        sample_n = int(argv[i + 1])
        del argv[i:i + 2]
    if "--seed" in argv:
        i = argv.index("--seed")
        sample_seed = int(argv[i + 1])
        del argv[i:i + 2]
    sf_dir = argv[0] if len(argv) > 0 else "/root/testdata/sf0.01"
    name_filter = argv[1] if len(argv) > 1 else ""

    # Vanilla session: deliberately NOT get_spark() — mimic the driver.
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver-mirror")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries = all_queries()
    oracles = all_oracles()

    names = sorted(queries)
    if sample_n is not None:
        # Rotating sample mode (--sample N --seed R, r11 verdict item
        # 7): the external driver's CORRECTNESS sample is a FIXED 50
        # queries chosen in round 1 and blind to everything added
        # since; a per-round seeded sample gives cheap coverage of a
        # different slice each round. The full no-args run stays the
        # real gate (the round-final commit message carries its tail).
        import random

        rng = random.Random(sample_seed if sample_seed is not None else 0)
        names = sorted(rng.sample(names, min(sample_n, len(names))))

    results: dict[str, dict] = {}
    n_pass = n_fail = n_err = n_rows_only = 0
    for name in names:
        if name_filter and name_filter not in name:
            continue
        t0 = time.perf_counter()
        try:
            sdf = queries[name](spark, sf_dir)
            spark_rows = sdf.collect()
            spark_cols = sorted(sdf.columns)
            if name not in oracles:
                results[name] = {"status": "rows_only", "spark_rows": len(spark_rows)}
                n_rows_only += 1
                print(f"{name}: rows_only ({len(spark_rows)} rows, {time.perf_counter()-t0:.1f}s)")
                continue
            res = con.execute(oracles[name])
            duck_cols = sorted(d[0] for d in res.description)
            duck_rows = res.fetchall()

            rows_match = len(spark_rows) == len(duck_rows)
            schema_match = spark_cols == duck_cols

            def key(row, cols_in_order):
                d = dict(zip(cols_in_order, row))
                return tuple(_canon(d[c]) for c in spark_cols)

            s_set = sorted(key(tuple(r), sdf.columns) for r in spark_rows)
            d_set = sorted(key(r, [d[0] for d in res.description]) for r in duck_rows)
            hash_match = s_set == d_set

            ok = rows_match and schema_match and hash_match
            results[name] = {
                "status": "pass" if ok else "FAIL",
                "rows_match": rows_match,
                "schema_match": schema_match,
                "hash_match": hash_match,
                "spark_rows": len(spark_rows),
                "oracle_rows": len(duck_rows),
            }
            if ok:
                n_pass += 1
            else:
                n_fail += 1
                diffs = [(a, b) for a, b in zip(s_set, d_set) if a != b][:2]
                results[name]["first_diffs"] = repr(diffs)
            print(
                f"{name}: {'pass' if ok else 'FAIL'} "
                f"(rows={rows_match} schema={schema_match} hash={hash_match}, "
                f"{time.perf_counter()-t0:.1f}s)"
            )
        except Exception:
            n_err += 1
            results[name] = {"status": "err", "err": traceback.format_exc(limit=3)}
            print(f"{name}: ERR {traceback.format_exc(limit=1).splitlines()[-1]}")

    summary = {
        "sf_dir": sf_dir,
        "pass": n_pass,
        "fail": n_fail,
        "err": n_err,
        "rows_only": n_rows_only,
        "failing": [n for n, r in results.items() if r["status"] in ("FAIL", "err")],
    }
    print(json.dumps(summary))
    return 0 if n_fail == n_err == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
