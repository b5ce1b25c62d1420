#!/usr/bin/env python
"""Round-14 diagnosis of the 32c<8c inversion on the Python-kernel
media queries (PERF_r13 scaling ratios 0.08-0.55): time each flagged
query to a noop sink at the session's core count, min over reps.
Run twice — SPARK_GRAFT_CPUS=32 and =8 — in adjacent minutes and
compare ratios. Usage: SPARK_GRAFT_CPUS=N python ... [reps]"""
import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from logsdb_spark.session import get_spark
from logsdb_spark.registry import all_queries

SF = "/root/testdata/sf0.1"
REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 3
QUERIES = [
    "multimodal_resize_stats", "multimodal_resize_rgb_stats",
    "multimodal_resample_stats", "multimodal_transcode_stats",
    "dedup_image_phash_pairs", "dedup_image_phash_keep",
    "tokenizer_bpe_merges",
]

spark = get_spark("media-scaling-r14")
spark.sparkContext.setLogLevel("ERROR")
import bench

bench.warm_up(spark, SF)
qs = all_queries()
out = {}
for name in QUERIES:
    fn = qs[name]
    best = []
    fn(spark, SF).write.format("noop").mode("overwrite").save()  # warm
    spark.catalog.clearCache(); gc.collect()
    for _ in range(REPS):
        spark.sparkContext.setJobDescription(name)
        t0 = time.perf_counter()
        fn(spark, SF).write.format("noop").mode("overwrite").save()
        best.append(round(time.perf_counter() - t0, 3))
        spark.catalog.clearCache(); gc.collect()
    out[name] = {"min": min(best), "reps": best}
    print(name, out[name], flush=True)
print(json.dumps({"cpus": os.environ.get("SPARK_GRAFT_CPUS"), "q": out}))
