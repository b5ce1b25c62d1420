#!/usr/bin/env python
"""Round-14 follow-up A/B on the ensemble latency point: SHIPPED form
(checkpoint the raw deduped batch; sig/winnow kernels re-run inside
their broadcast builds) vs an ENRICHED checkpoint (one eager job
computes shingles+sig+fps for the batch — kernels run exactly once —
and the probe tail reads columns from the checkpoint). Interleaved
drains, parity asserted. Usage: SPARK_GRAFT_CPUS=32 python ... [reps]
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
from logsdb_spark.functions.text import winnow_fingerprints
from logsdb_spark.operators.dedup import (
    _banded_keys, _ensemble_probe_tail, minhash_signatures,
    prepare_ensemble_corpus_state, shingle_sets,
)
from logsdb_spark.operators.silver import minhash_index_layout, winnow_fp_layout

SF = "/root/testdata/sf0.1"
REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 3

spark = get_spark("stream-enriched-ab")
spark.sparkContext.setLogLevel("ERROR")

docs = load_table(spark, SF, "documents")
corpus = docs.filter(F.col("doc_id") % 10 != 0)
shard = docs.filter(F.col("doc_id") % 10 == 0)
work = tempfile.mkdtemp(prefix="enr_ab_")
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


def write_enriched(corpus_df, batch, batch_id, sink, threshold, state=None):
    batch = batch.dropDuplicates()
    sigs = minhash_signatures(shingle_sets(batch, "text"),
                              keep_shingles=True)
    fps = winnow_fingerprints(batch, "doc_id", "text", k=20, w=8)
    enriched = sigs.join(fps, "doc_id").localCheckpoint()
    n_bands = _banded_keys(enriched.select("doc_id", "sig"), "new_id")
    nb = enriched.select(F.col("doc_id").alias("new_id"),
                         F.col("shingles").alias("sh_b"))
    n_rows = (
        enriched.select(F.col("doc_id").alias("new_id"),
                        F.explode_outer("fps").alias("fp"))
        .filter(F.col("fp").isNotNull())
    )
    flags = _ensemble_probe_tail(state, n_bands, nb, n_rows, threshold, 2)
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
            os.path.join(out, "ensemble_flags"))
        n = flags.count()
        rows = sorted(tuple(r) for r in flags.collect())
        shutil.rmtree(out, ignore_errors=True)
        return el, n, rows
    finally:
        sdedup._write_ensemble_batch = orig


_, _, rows_a = drain("warm_ship", orig)
_, _, rows_b = drain("warm_enr", write_enriched)
assert rows_a == rows_b, "enriched flags differ from shipped"
print("parity ok", len(rows_a), flush=True)
res = {"shipped": [], "enriched": []}
for _ in range(REPS):
    el, _, _ = drain("ship", orig)
    res["shipped"].append(round(el, 3))
    el, _, _ = drain("enr", write_enriched)
    res["enriched"].append(round(el, 3))
shutil.rmtree(work, ignore_errors=True)
print(json.dumps({k: {"min": min(v), "reps": v} for k, v in res.items()}))
