#!/usr/bin/env python
"""Round-14 interleaved A/B: bucketed-store full-outer merge (shipped)
vs the r13 fused union+aggregate merge on the two HEADLINE maintenance
queries, plus a row-level parity assert. Both forms read the SAME
bucketed state tables — the A/B isolates the merge shape; the store-
side Exchange elimination is the plans/r14 evidence.
Usage: SPARK_GRAFT_CPUS=32 python scripts/maint_merge_ab_r14.py [reps]
"""
import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from logsdb_spark.session import get_spark
from logsdb_spark.operators.dedup import (
    lsh_count_delta, lsh_counts_apply_delta, lsh_counts_merge_outer,
    minhash_pairs_from_counts, winnow_count_delta,
    winnow_counts_merge_outer, winnow_edges_apply_delta,
    winnow_pairs_from_counts,
)
from logsdb_spark.operators.silver import (
    minhash_emission_count_layout, minhash_index_layout,
    winnow_edge_count_layout, winnow_fp_layout,
)

SF = "/root/testdata/sf0.1"
REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 4
spark = get_spark("maint-merge-ab")
spark.sparkContext.setLogLevel("ERROR")

widx = winnow_fp_layout(spark, SF)
w_old = widx.filter(F.col("doc_id") % 10 != 0)
w_new = widx.filter(F.col("doc_id") % 10 == 0)
w_stored = winnow_edge_count_layout(spark, SF)
midx = minhash_index_layout(spark, SF)
m_old = midx.filter(F.col("doc_id") % 10 != 0).select("doc_id", "sig")
m_new = midx.filter(F.col("doc_id") % 10 == 0).select("doc_id", "sig")
m_stored = minhash_emission_count_layout(spark, SF)


def w_bucketed():
    return winnow_pairs_from_counts(
        winnow_counts_merge_outer(w_stored, winnow_count_delta(w_old, w_new))
    ).orderBy("id_a", "id_b")


def w_fused():
    return winnow_pairs_from_counts(
        winnow_edges_apply_delta(w_stored, w_old, w_new)
    ).orderBy("id_a", "id_b")


def m_bucketed():
    return minhash_pairs_from_counts(
        lsh_counts_merge_outer(m_stored, lsh_count_delta(m_old, m_new)),
        midx, threshold=0.6).orderBy("id_a", "id_b")


def m_fused():
    return minhash_pairs_from_counts(
        lsh_counts_apply_delta(m_stored, m_old, m_new),
        midx, threshold=0.6).orderBy("id_a", "id_b")


assert [tuple(r) for r in w_bucketed().collect()] == \
       [tuple(r) for r in w_fused().collect()]
assert [tuple(r) for r in m_bucketed().collect()] == \
       [tuple(r) for r in m_fused().collect()]
print("parity ok", flush=True)

res = {}
for name, fn in (("winnow_bucketed", w_bucketed), ("winnow_fused", w_fused),
                 ("minhash_bucketed", m_bucketed), ("minhash_fused", m_fused)):
    fn().count()  # warm
res = {n: [] for n in
       ("winnow_bucketed", "winnow_fused", "minhash_bucketed",
        "minhash_fused")}
for _ in range(REPS):
    for name, fn in (("winnow_fused", w_fused),
                     ("winnow_bucketed", w_bucketed),
                     ("minhash_fused", m_fused),
                     ("minhash_bucketed", m_bucketed)):
        spark.catalog.clearCache(); gc.collect()
        t0 = time.perf_counter()
        fn().count()
        res[name].append(round(time.perf_counter() - t0, 3))
print(json.dumps({n: {"min": min(v), "reps": v} for n, v in res.items()}))
