#!/usr/bin/env python
"""Ingest throughput bench (VERDICT r3 #7): measured rows/s for the
apache-access and authfail streaming ingest pipelines.

The reference's core IS its ingest loop — one parsed line, one
committed DB row (core.py:46-48, apache_access.py:94); it publishes no
throughput number (BASELINE.md). This script measures ours under
replay conditions: a synthetic sf0.1-scale source directory (100k
lines per source, split across files so maxFilesPerTrigger
backpressure actually batches), streamed through the full production
pipeline — parse, dead-letter routing, date-partitioned idempotent
append sink, checkpointing — with run_until_drained as the completion
barrier.

Timing includes ALL pipeline costs (checkpoint commits, partitioned
parquet writes); generation and session build are untimed. Dead-letter
lines are planted at 1% so the error path is exercised, and dead rows
are NOT counted in the throughput numerator.

Usage: python scripts/ingest_bench.py [n_lines_per_source]
Prints one JSON line:
  {"metric": "ingest_rows_per_sec", "apache": N, "authfail": N, ...}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_FILES = 20
MAX_FILES_PER_TRIGGER = 5


def _gen_apache(src: str, n: int) -> None:
    os.makedirs(src)
    per = n // N_FILES
    row = 0
    for f in range(N_FILES):
        with open(os.path.join(src, f"access_{f:03d}.log"), "w") as fh:
            for _ in range(per):
                row += 1
                if row % 100 == 0:  # 1% planted dead letters
                    fh.write("not a parsable line\n")
                    continue
                ts = f"2026-08-{row % 28 + 1:02d} {row % 24:02d}:{row % 60:02d}:{row % 60:02d} +0000"
                ip = f"203.0.{row % 256}.{row % 254 + 1}"
                path = f"/page/{row % 1000}"
                fh.write(
                    f'{ts}|ex.com|443|{ip}|{row % 500}|{row % 9000}|{row % 70000}|'
                    f'{200 if row % 17 else 404}|'
                    f'["-", "GET {path} HTTP/1.1", "GET", "{path}", "HTTP/1.1", "-", "bench-UA"]\n'
                )


def _gen_authfail(src: str, n: int) -> None:
    os.makedirs(src)
    per = n // N_FILES
    row = 0
    for f in range(N_FILES):
        with open(os.path.join(src, f"auth_{f:03d}.log"), "w") as fh:
            for _ in range(per):
                row += 1
                if row % 100 == 0:
                    fh.write("syslog noise that is not an auth failure\n")
                    continue
                ts = f"2026-08-{row % 28 + 1:02d}T{row % 24:02d}:{row % 60:02d}:{row % 60:02d}+00:00"
                ip = f"198.51.{row % 256}.{row % 254 + 1}"
                user = f"user{row % 50}"
                fh.write(
                    f"{ts} host sshd[{row % 9000 + 1}]: Failed password for "
                    f"{user} from {ip} port {row % 60000 + 1} ssh2\n"
                )


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000

    from logsdb_spark.session import get_spark
    from logsdb_spark.streaming.ingest import (
        ingest_apache_access,
        ingest_authfail,
        run_until_drained,
    )

    spark = get_spark()
    work = tempfile.mkdtemp(prefix="ingest_bench_")
    results: dict[str, float] = {}
    try:
        for name, gen, runner in (
            ("apache", _gen_apache, ingest_apache_access),
            ("authfail", _gen_authfail, ingest_authfail),
        ):
            src = os.path.join(work, f"{name}_src")
            out = os.path.join(work, f"{name}_out")
            gen(src, n)
            t0 = time.monotonic()
            run_until_drained(
                runner(
                    spark, src, out,
                    max_files_per_trigger=MAX_FILES_PER_TRIGGER,
                ),
                # scale the drain deadline with the replay size — the
                # default 120 s would abort (not measure) large runs
                timeout_sec=max(120.0, n / 2000),
            )
            elapsed = time.monotonic() - t0
            table = "apache_access" if name == "apache" else "authfail"
            good = spark.read.parquet(os.path.join(out, table)).count()
            results[name] = {
                "rows": good,
                "sec": round(elapsed, 3),
                "rows_per_sec": round(good / elapsed),
            }
    finally:
        shutil.rmtree(work, ignore_errors=True)

    print(json.dumps({
        "metric": "ingest_rows_per_sec",
        "n_lines_per_source": n,
        "n_files": N_FILES,
        "max_files_per_trigger": MAX_FILES_PER_TRIGGER,
        **results,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
