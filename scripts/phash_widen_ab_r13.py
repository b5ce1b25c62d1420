#!/usr/bin/env python
"""Round-13 A/B: dedup_edge_maintenance_phash with the evidence index
read widened (round-robin repartitioned to 32) vs plain. The widen
helper exists for per-row COMPUTE-heavy frames (blob decodes); this
query only filters/projects the index, so the repartition may be a
pure extra Exchange (guide §2.4). Interleaved, min over reps."""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from logsdb_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    spark = get_spark("phash-widen-ab")
    spark.sparkContext.setLogLevel("ERROR")
    import bench

    bench.warm_up(spark, SF_DIR)

    from logsdb_spark.operators.dedup import (
        connected_components,
        phash_edges_apply_delta,
    )
    from logsdb_spark.operators.silver import (
        media_edge90_layout,
        media_evidence_layout,
        media_rep90_layout,
    )
    from logsdb_spark.plans.extensions import _widened_layout

    media_edge90_layout(spark, SF_DIR, "phash").count()
    media_rep90_layout(spark, SF_DIR, "phash").count()

    def query(widened: bool):
        base = media_evidence_layout(spark, SF_DIR)
        idx = (_widened_layout(spark, SF_DIR, base, "mevidx")
               if widened else base).filter(F.col("kind") == "phash")
        new_hashes = (
            idx.filter(F.col("doc_id") % 10 == 0)
            .select("doc_id", F.col("hv").alias("phash"))
        )
        edges = phash_edges_apply_delta(
            media_edge90_layout(spark, SF_DIR, "phash"),
            media_rep90_layout(spark, SF_DIR, "phash"),
            new_hashes,
        )
        comp = connected_components(edges)
        cluster = F.coalesce(F.col("cluster"), F.col("doc_id"))
        return (
            idx.select("doc_id").join(comp, "doc_id", "left")
            .select(
                "doc_id",
                cluster.alias("cluster"),
                (cluster == F.col("doc_id")).alias("keep"),
            )
            .orderBy("doc_id")
        )

    # parity first
    a = sorted(tuple(r) for r in query(True).collect())
    b = sorted(tuple(r) for r in query(False).collect())
    assert a == b, "widened vs plain results differ"
    print(json.dumps({"parity_rows": len(a)}), flush=True)

    res = {}
    for rep in range(4):
        for key, widened in (("widened", True), ("plain", False)):
            t0 = time.perf_counter()
            query(widened).count()
            el = round(time.perf_counter() - t0, 3)
            res.setdefault(key, []).append(el)
            spark.catalog.clearCache()
            gc.collect()
    print(json.dumps({k: {"reps": v, "min": min(v)} for k, v in res.items()},
                     indent=1), flush=True)


if __name__ == "__main__":
    main()
