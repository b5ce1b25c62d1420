#!/usr/bin/env python
"""Ingest throughput bench (VERDICT r3 #7, extended r5 #5): measured
rows/s AND a maxFilesPerTrigger backpressure CURVE for all three
streaming ingest pipelines — apache-access, authfail (text sources)
and maillog (binaryFile source, one RFC-5322 message per file).

The reference's core IS its ingest loop — one parsed line, one
committed DB row (core.py:46-48, apache_access.py:94; maillog.py:143
reads one whole message per process) — and it publishes no throughput
number (BASELINE.md). This script measures ours under replay
conditions: a synthetic source directory streamed through the full
production pipeline — parse, dead-letter routing, date-partitioned
idempotent append sink (maillog: the 3-table upsert choreography),
checkpointing — with run_until_drained as the completion barrier,
swept over maxFilesPerTrigger in {1, 5, 20} so the backpressure claim
is a measured curve, not one point.

Timing includes ALL pipeline costs (checkpoint commits, partitioned
parquet writes, the maillog per-batch anti-join/count); generation and
session build are untimed. Dead-letter lines are planted at 1% in the
text sources and NOT counted in the numerator. Per-batch latency is
read from the stopped query's recentProgress (triggerExecution ms).

Usage: python scripts/ingest_bench.py [n_lines_per_source] [knobs]
  n_lines_per_source  default 100_000 (text sources; maillog runs
                      n/500 messages = 200 at the default — binaryFile
                      is one message per FILE, so file count IS the
                      row count there)
  knobs               comma-separated maxFilesPerTrigger sweep,
                      default "1,5,20"
Prints one JSON line:
  {"metric": "ingest_backpressure_sweep",
   "apache": {"mft_1": {...}, "mft_5": {...}, ...}, ...}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_FILES = 20  # text sources: lines split across this many files


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


def _gen_maillog(src: str, n_msgs: int) -> None:
    """One RFC-5322 message per file (the binaryFile contract): a
    rotating sender/recipient pool so the contacts upsert exercises
    both the new-contact and the already-present path per batch."""
    os.makedirs(src)
    for i in range(n_msgs):
        sender = f"Sender {i % 25} <sender{i % 25}@example.com>"
        to = f"User {i % 40} <user{i % 40}@example.org>"
        cc = f"User {(i + 7) % 40} <user{(i + 7) % 40}@example.org>"
        body = f"benchmark message body {i}\n" * (i % 5 + 1)
        msg = (
            f"From: {sender}\r\nTo: {to}\r\nCC: {cc}\r\n"
            f"Subject: bench message {i}\r\n"
            f"Date: Thu, 14 Aug 2026 {i % 24:02d}:{i % 60:02d}:00 +0000\r\n"
            f"\r\n{body}"
        )
        with open(os.path.join(src, f"msg_{i:05d}.eml"), "wb") as fh:
            fh.write(msg.encode())


def _batch_stats(query) -> dict:
    """Per-batch latency off the stopped query's progress events
    (only batches that actually processed rows)."""
    durs = [
        p["durationMs"]["triggerExecution"]
        for p in (json.loads(sp.json) for sp in query.recentProgress)
        if p.get("numInputRows", 0) > 0
    ]
    if not durs:
        return {"n_batches": 0}
    return {
        "n_batches": len(durs),
        "avg_batch_ms": round(sum(durs) / len(durs)),
        "max_batch_ms": max(durs),
    }


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    knobs = [int(k) for k in (sys.argv[2] if len(sys.argv) > 2 else "1,5,20").split(",")]
    n_msgs = max(n // 500, 20)

    from logsdb_spark.session import get_spark
    from logsdb_spark.streaming.ingest import (
        ingest_apache_access,
        ingest_authfail,
        ingest_maillog,
        run_until_drained,
    )

    spark = get_spark()
    work = tempfile.mkdtemp(prefix="ingest_bench_")
    results: dict[str, dict] = {}
    try:
        sources = (
            ("apache", _gen_apache, n,
             lambda s, o, k: ingest_apache_access(
                 spark, s, o, max_files_per_trigger=k),
             "apache_access"),
            ("authfail", _gen_authfail, n,
             lambda s, o, k: ingest_authfail(
                 spark, s, o, max_files_per_trigger=k),
             "authfail"),
            ("maillog", _gen_maillog, n_msgs,
             lambda s, o, k: ingest_maillog(
                 spark, s, o, max_files_per_trigger=k),
             "inbox"),
        )
        for name, gen, size, runner, table in sources:
            src = os.path.join(work, f"{name}_src")
            gen(src, size)  # generated once; each knob run re-streams it
            results[name] = {"input_rows": size}
            for knob in knobs:
                out = os.path.join(work, f"{name}_out_mft{knob}")
                t0 = time.monotonic()
                q = runner(src, out, knob)
                run_until_drained(
                    q,
                    # scale the drain deadline with replay size AND
                    # batch count (knob 1 pays per-batch overhead
                    # n_files times)
                    timeout_sec=max(300.0, size / 500),
                )
                elapsed = time.monotonic() - t0
                good = spark.read.parquet(os.path.join(out, table)).count()
                results[name][f"mft_{knob}"] = {
                    "rows": good,
                    "sec": round(elapsed, 3),
                    "rows_per_sec": round(good / elapsed),
                    **_batch_stats(q),
                }
    finally:
        shutil.rmtree(work, ignore_errors=True)

    print(json.dumps({
        "metric": "ingest_backpressure_sweep",
        "n_lines_per_source": n,
        "n_mail_messages": n_msgs,
        "n_files_text": N_FILES,
        "knobs": knobs,
        **results,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
