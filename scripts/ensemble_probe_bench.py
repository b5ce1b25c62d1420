#!/usr/bin/env python
"""Standalone timing of the streaming ensemble probe (the bench.py
streaming_bench ensemble section, extracted so stage-fusion work can
iterate without a full bench run): sf0.1 corpus 90/10 split, shard
replayed 10x into ONE micro-batch, corpus state pre-materialized
untimed, drain timed. Prints one JSON line."""
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bench import warm_up  # noqa: E402
from logsdb_spark.catalog import load_table  # noqa: E402
from logsdb_spark.operators.dedup import prepare_ensemble_corpus_state  # noqa: E402
from logsdb_spark.operators.silver import (  # noqa: E402
    minhash_index_layout,
    winnow_fp_layout,
)
from logsdb_spark.session import get_spark  # noqa: E402
from logsdb_spark.streaming.dedup import start_ensemble_stream  # noqa: E402
from logsdb_spark.streaming.ingest import run_until_drained  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    spark = get_spark("ensemble-probe-bench")
    spark.sparkContext.setLogLevel("ERROR")
    warm_up(spark, SF_DIR)
    docs = load_table(spark, SF_DIR, "documents")
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    work = tempfile.mkdtemp(prefix="ens_probe_")
    out = {}
    try:
        esrc = os.path.join(work, "src")
        docs.filter(F.col("doc_id") % 10 == 0).coalesce(1).write.parquet(esrc)
        part = next(f for f in os.listdir(esrc)
                    if f.endswith(".parquet") and not f.startswith("."))
        for rep in range(9):
            shutil.copy(os.path.join(esrc, part),
                        os.path.join(esrc, f"replay{rep}-{part}"))
        n_shard = spark.read.parquet(esrc).count()
        idx0 = minhash_index_layout(spark, SF_DIR).filter(
            F.col("doc_id") % 10 != 0)
        idx1 = winnow_fp_layout(spark, SF_DIR).filter(
            F.col("doc_id") % 10 != 0)
        est = prepare_ensemble_corpus_state(idx0, idx1)
        for frame in est:
            frame.count()
        reps = []
        for i in range(int(os.environ.get("PROBE_REPS", "3"))):
            eout = os.path.join(work, f"out{i}")
            t0 = time.perf_counter()
            run_until_drained(
                start_ensemble_stream(spark, corpus, esrc, eout,
                                      threshold=0.6, state=est)
            )
            el = time.perf_counter() - t0
            flags = spark.read.parquet(
                os.path.join(eout, "ensemble_flags")).count()
            reps.append({"sec": round(el, 3),
                         "rows_per_sec": round(n_shard / el),
                         "flags": flags})
        # saturation point: 100x replay (50k rows in one micro-batch)
        # amortizes the ~0.7-0.9 s fixed streaming machinery
        esat = os.path.join(work, "src_sat")
        os.makedirs(esat)
        for rep in range(100):
            shutil.copy(os.path.join(esrc, part),
                        os.path.join(esat, f"sat{rep}-{part}"))
        n_sat = spark.read.parquet(esat).count()
        sat = []
        for i in range(2):
            eout = os.path.join(work, f"outsat{i}")
            t0 = time.perf_counter()
            run_until_drained(
                start_ensemble_stream(spark, corpus, esat, eout,
                                      threshold=0.6, state=est)
            )
            el = time.perf_counter() - t0
            sat.append({"sec": round(el, 3),
                        "rows_per_sec": round(n_sat / el)})
        out = {"rows": n_shard, "reps": reps,
               "best_rows_per_sec": max(r["rows_per_sec"] for r in reps),
               "sat_rows": n_sat, "sat_reps": sat,
               "sat_best_rows_per_sec": max(r["rows_per_sec"]
                                            for r in sat)}
    finally:
        shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
