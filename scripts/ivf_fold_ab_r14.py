#!/usr/bin/env python
"""Round-14 A/B: folded one-broadcast two-level encode (fold_blocks=True,
the new default) vs the r13 per-block broadcast-join form, interleaved
in ONE session on the two layout-fed consumers the r13 verdict flagged
(ann_ivf_kmeans, ann_index_maintenance_ivf) plus the in-plan lazy twin.
Timed with .count() exactly like bench.py; layouts materialized untimed
first (the bench warm_up contract). Usage:
    SPARK_GRAFT_CPUS=32 python scripts/ivf_fold_ab_r14.py [reps]
"""
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from logsdb_spark.session import get_spark
from logsdb_spark.registry import all_queries
from logsdb_spark.operators import similarity

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 4

spark = get_spark("ivf-fold-ab-r14")
spark.sparkContext.setLogLevel("ERROR")

# untimed layout materialization (bench warm_up contract)
from logsdb_spark.operators.silver import (
    cent90_two_level_layout, ivf_assign90_layout, ivf_cent90_layout,
    ivf_pq_layout, kmeans_centroid_layout, kmeans_two_level_layout,
    pq_codebook_layout,
)
kmeans_centroid_layout(spark, SF_DIR, k=16, iters=2, sample_mod=2).count()
for fr in (*kmeans_two_level_layout(spark, SF_DIR, k=16, iters=2,
                                    sample_mod=2),
           *cent90_two_level_layout(spark, SF_DIR)):
    fr.count()
ivf_cent90_layout(spark, SF_DIR).count()
ivf_assign90_layout(spark, SF_DIR).count()
ivf_pq_layout(spark, SF_DIR).count()
pq_codebook_layout(spark, SF_DIR).count()

QS = all_queries()
NAMES = ["ann_ivf_kmeans", "ann_index_maintenance_ivf", "ann_ivf_pq_lazy"]
_orig = similarity.ivf_assign_with_model


def run(name, fold):
    similarity.ivf_assign_with_model = functools.partial(
        _orig, fold_blocks=fold)
    try:
        import gc
        spark.catalog.clearCache()
        gc.collect()
        spark.sparkContext.setJobDescription(f"{name} fold={fold}")
        t0 = time.perf_counter()
        QS[name](spark, SF_DIR).count()
        return time.perf_counter() - t0
    finally:
        similarity.ivf_assign_with_model = _orig


out = {}
for name in NAMES:
    a, b = [], []
    # one untimed warm rep per arm (codegen/JIT)
    run(name, True); run(name, False)
    for _ in range(REPS):
        b.append(round(run(name, False), 3))   # old form
        a.append(round(run(name, True), 3))    # new form
    out[name] = {"fold_true_min": min(a), "fold_false_min": min(b),
                 "fold_true": a, "fold_false": b}
    print(name, out[name], flush=True)

print(json.dumps(out))
