#!/usr/bin/env python
"""Round-14 100x scale probe for the MinHash signature engines: the
sf0.1 documents corpus replicated 100x (doc_id remapped), signature
pipeline timed to a noop sink per engine, interleaved — the gate the
r10/r13 verdicts require before switching the corpus default (the
bench-scale win must not invert at scale). Usage:
    SPARK_GRAFT_CPUS=32 python scripts/mh_100x_probe_r14.py [reps] [factor]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from logsdb_spark.session import get_spark
from logsdb_spark.catalog import load_table
from logsdb_spark.operators.dedup import minhash_signatures, shingle_sets

SF = "/root/testdata/sf0.1"
REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 3
FACTOR = int(sys.argv[2]) if len(sys.argv) > 2 else 100

spark = get_spark("mh-100x-r14")
spark.sparkContext.setLogLevel("ERROR")

docs = load_table(spark, SF, "documents").select("doc_id", "text")
big = (
    docs.join(F.broadcast(
        spark.range(FACTOR).select(F.col("id").alias("_rep"))))
    .select(
        (F.col("doc_id") * FACTOR + F.col("_rep")).alias("doc_id"),
        "text",
    )
    .repartition(spark.sparkContext.defaultParallelism)
)


def run(engine):
    sig = minhash_signatures(shingle_sets(big, "text"), engine=engine)
    t0 = time.perf_counter()
    sig.write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 3)


run("jvm"); run("arrow")  # untimed warm (codegen / worker spin-up)
res = {"jvm": [], "arrow": []}
for _ in range(REPS):
    res["jvm"].append(run("jvm"))
    res["arrow"].append(run("arrow"))
print(json.dumps({k: {"min": min(v), "reps": v} for k, v in res.items()}))
