#!/usr/bin/env python
"""Round-13 A/B: two-level hierarchy IN-PLAN vs LAYOUT-FED, interleaved
reps in one session so host-noise hits both arms equally (guide §1).

Arms reconstruct the two registered consumers' exact frames:
  - ann_ivf_kmeans tail (ivf_ann_topk over the kmeans codebook layout,
    assign_m=2, coarse_probe=2)
  - ann_index_maintenance_ivf tail (ivf_assign_apply_delta over the
    frozen 90% model, coarse_probe=2)
with two_level=None (in-plan, the inherited 3eafe7a shape) vs
two_level=<materialized layout> (this round's change).
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from logsdb_spark.catalog import load_table  # noqa: E402
from logsdb_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("TL_AB_REPS", "4"))


def main() -> None:
    spark = get_spark("tl-ab-r13")
    spark.sparkContext.setLogLevel("ERROR")
    import bench

    bench.warm_up(spark, SF_DIR)

    from logsdb_spark.operators.silver import (
        cent90_two_level_layout,
        ivf_assign90_layout,
        ivf_cent90_layout,
        kmeans_centroid_layout,
        kmeans_two_level_layout,
    )
    from logsdb_spark.operators.similarity import (
        ivf_ann_topk,
        ivf_assign_apply_delta,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    probes = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("probe_id"),
        F.col("embedding").alias("probe_vec"),
    )
    km_cents = kmeans_centroid_layout(spark, SF_DIR, k=16, iters=2,
                                      sample_mod=2)
    km_tl = kmeans_two_level_layout(spark, SF_DIR, k=16, iters=2,
                                    sample_mod=2)
    c90_tl = cent90_two_level_layout(spark, SF_DIR)
    new_emb = emb.filter(F.col("vec_id") % 10 == 0)

    def kmeans_query(tl):
        out = ivf_ann_topk(emb, probes, k=10, nprobe=4, centroids=km_cents,
                           assign_m=2, coarse_probe=2, two_level=tl)
        return out.select(
            "probe_id", "neighbor_id", "cos_sim",
            F.col("rank").cast("int").alias("rank"),
        ).orderBy("probe_id", "rank")

    def maint_query(tl):
        assign = ivf_assign_apply_delta(
            ivf_assign90_layout(spark, SF_DIR),
            ivf_cent90_layout(spark, SF_DIR),
            new_emb, n_assign=2, coarse_probe=2, two_level=tl,
        )
        return assign.select("vec_id", "cell", "rk").orderBy("vec_id", "rk")

    arms = {
        "ann_ivf_kmeans/inplan": lambda: kmeans_query(None),
        "ann_ivf_kmeans/layout": lambda: kmeans_query(km_tl),
        "ann_index_maintenance_ivf/inplan": lambda: maint_query(None),
        "ann_index_maintenance_ivf/layout": lambda: maint_query(c90_tl),
    }
    times = {k: [] for k in arms}
    for rep in range(REPS):
        for name, fn in arms.items():
            spark.sparkContext.setJobDescription(f"{name} rep{rep}")
            t0 = time.perf_counter()
            fn().count()
            times[name].append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
            gc.collect()
    spark.sparkContext.setJobDescription(None)
    out = {k: {"reps": v, "min": min(v)} for k, v in times.items()}
    print(json.dumps(out, indent=1))
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "tl_ab_probe_r13.json"), "w") as fh:
        json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
