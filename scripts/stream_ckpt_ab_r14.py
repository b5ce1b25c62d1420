#!/usr/bin/env python
"""Round-14 interleaved A/B: localCheckpoint of the deduped micro-batch
in _write_ensemble_batch (ON = shipped) vs the r13 form (OFF), measured
on the indexed ensemble probe exactly as bench.streaming_bench's
ensemble_probe_indexed point (5,000-row single micro-batch drain).
Usage: SPARK_GRAFT_CPUS=32 python scripts/stream_ckpt_ab_r14.py [reps]
"""
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from logsdb_spark.session import get_spark
from logsdb_spark.catalog import load_table
from logsdb_spark.streaming import dedup as sdedup
from logsdb_spark.streaming.dedup import start_ensemble_stream
from logsdb_spark.streaming.ingest import run_until_drained
from logsdb_spark.operators.dedup import (
    ensemble_near_dups_from_state, prepare_ensemble_corpus_state,
)
from logsdb_spark.operators.silver import minhash_index_layout, winnow_fp_layout

SF = "/root/testdata/sf0.1"
REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 3

spark = get_spark("stream-ckpt-ab")
spark.sparkContext.setLogLevel("ERROR")

docs = load_table(spark, SF, "documents")
corpus = docs.filter(F.col("doc_id") % 10 != 0)
shard = docs.filter(F.col("doc_id") % 10 == 0)
work = tempfile.mkdtemp(prefix="ckpt_ab_")
esrc = os.path.join(work, "src")
shard.coalesce(1).write.parquet(esrc)
part = next(f for f in os.listdir(esrc)
            if f.endswith(".parquet") and not f.startswith("."))
for rep in range(9):
    shutil.copy(os.path.join(esrc, part),
                os.path.join(esrc, f"replay{rep}-{part}"))

idx = (minhash_index_layout(spark, SF).filter(F.col("doc_id") % 10 != 0),
       winnow_fp_layout(spark, SF).filter(F.col("doc_id") % 10 != 0))
est = prepare_ensemble_corpus_state(idx[0], idx[1])
for fr in est:
    fr.count()


def write_no_ckpt(corpus_df, batch, batch_id, sink, threshold, state=None):
    batch = batch.dropDuplicates()
    flags = ensemble_near_dups_from_state(state, batch, threshold=threshold)
    flags.write.mode("overwrite").parquet(
        os.path.join(sink, f"batch_id={batch_id}"))


orig = sdedup._write_ensemble_batch


def drain(tag, fn):
    sdedup._write_ensemble_batch = fn
    try:
        out = os.path.join(work, f"out_{tag}_{time.monotonic_ns()}")
        t0 = time.perf_counter()
        run_until_drained(start_ensemble_stream(
            spark, corpus, esrc, out, threshold=0.6, state=est))
        el = time.perf_counter() - t0
        flags = spark.read.parquet(
            os.path.join(out, "ensemble_flags")).count()
        shutil.rmtree(out, ignore_errors=True)
        return el, flags
    finally:
        sdedup._write_ensemble_batch = orig


# one untimed warm drain per arm
drain("warm_on", orig)
drain("warm_off", write_no_ckpt)
res = {"on": [], "off": [], "flags": set()}
for _ in range(REPS):
    el, fl = drain("off", write_no_ckpt)
    res["off"].append(round(el, 3)); res["flags"].add(fl)
    el, fl = drain("on", orig)
    res["on"].append(round(el, 3)); res["flags"].add(fl)
shutil.rmtree(work, ignore_errors=True)
print(json.dumps({
    "on_min": min(res["on"]), "off_min": min(res["off"]),
    "on": res["on"], "off": res["off"],
    "flags": sorted(res["flags"]),
    "rows_per_sec_on": round(5000 / min(res["on"])),
    "rows_per_sec_off": round(5000 / min(res["off"])),
}))
