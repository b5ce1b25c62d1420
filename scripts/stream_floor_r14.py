#!/usr/bin/env python
"""Decompose the ensemble latency point: machinery floor (trivial
foreachBatch), shipped probe, probe + coalesced sink write. One
session, interleaved. Usage: SPARK_GRAFT_CPUS=32 python ..."""
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
from logsdb_spark.streaming.dedup import DOCS_SCHEMA
from logsdb_spark.streaming.ingest import run_until_drained
from logsdb_spark.operators.dedup import (
    ensemble_near_dups_from_state, prepare_ensemble_corpus_state,
)
from logsdb_spark.operators.silver import minhash_index_layout, winnow_fp_layout

SF = "/root/testdata/sf0.1"
REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 3
spark = get_spark("stream-floor")
spark.sparkContext.setLogLevel("ERROR")

docs = load_table(spark, SF, "documents")
shard = docs.filter(F.col("doc_id") % 10 == 0)
work = tempfile.mkdtemp(prefix="floor_")
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


def drain(tag, body):
    out = os.path.join(work, f"out_{tag}_{time.monotonic_ns()}")
    sink = os.path.join(out, "ensemble_flags")

    def probe(batch, batch_id):
        body(batch, batch_id, sink)

    t0 = time.perf_counter()
    run_until_drained(
        spark.readStream.schema(DOCS_SCHEMA).parquet(esrc)
        .writeStream.foreachBatch(probe)
        .option("checkpointLocation", os.path.join(out, "_ckpt/e"))
        .trigger(availableNow=True).start()
    )
    el = time.perf_counter() - t0
    shutil.rmtree(out, ignore_errors=True)
    return round(el, 3)


def body_noop(batch, batch_id, sink):
    batch.limit(1).collect()


def body_probe_noop_sink(batch, batch_id, sink):
    batch = batch.dropDuplicates().localCheckpoint()
    ensemble_near_dups_from_state(est, batch, threshold=0.6) \
        .write.format("noop").mode("overwrite").save()


def body_shipped(batch, batch_id, sink):
    batch = batch.dropDuplicates().localCheckpoint()
    ensemble_near_dups_from_state(est, batch, threshold=0.6) \
        .write.mode("overwrite").parquet(
            os.path.join(sink, f"batch_id={batch_id}"))


def body_coalesced(batch, batch_id, sink):
    batch = batch.dropDuplicates().localCheckpoint()
    ensemble_near_dups_from_state(est, batch, threshold=0.6) \
        .coalesce(1).write.mode("overwrite").parquet(
            os.path.join(sink, f"batch_id={batch_id}"))


bodies = {"machinery": body_noop, "probe_noop": body_probe_noop_sink,
          "shipped": body_shipped, "coalesced": body_coalesced}
for tag, b in bodies.items():
    drain("warm_" + tag, b)
res = {t: [] for t in bodies}
for _ in range(REPS):
    for tag, b in bodies.items():
        res[tag].append(drain(tag, b))
shutil.rmtree(work, ignore_errors=True)
print(json.dumps({t: {"min": min(v), "reps": v} for t, v in res.items()}))
