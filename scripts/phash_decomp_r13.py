#!/usr/bin/env python
"""Round-13 decomposition probe: where does dedup_edge_maintenance_phash
spend its ~2.9 s? Times each stage of the query in isolation (guide §1):
the stored-layout scans, the delta edge pipeline (noop sink), the
edge materialization + kernel CC, and the final attach join.
"""

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


def t(label, fn, reps=3):
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        el = time.perf_counter() - t0
        best = el if best is None else min(best, el)
        gc.collect()
    print(json.dumps({label: round(best, 3)}), flush=True)
    return best


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    spark = get_spark("phash-decomp")
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

    # warm the maintenance layouts (NOT in bench warm_up)
    media_edge90_layout(spark, SF_DIR, "phash").count()
    media_rep90_layout(spark, SF_DIR, "phash").count()

    idx = _widened_layout(
        spark, SF_DIR, media_evidence_layout(spark, SF_DIR), "mevidx"
    ).filter(F.col("kind") == "phash")

    def new_hashes():
        return (
            idx.filter(F.col("doc_id") % 10 == 0)
            .select("doc_id", F.col("hv").alias("phash"))
        )

    def edges():
        return phash_edges_apply_delta(
            media_edge90_layout(spark, SF_DIR, "phash"),
            media_rep90_layout(spark, SF_DIR, "phash"),
            new_hashes(),
        )

    t("scan_idx_only", lambda: noop(idx.select("doc_id")))
    t("scan_stored_edges", lambda: noop(media_edge90_layout(spark, SF_DIR, "phash")))
    t("scan_stored_reps", lambda: noop(media_rep90_layout(spark, SF_DIR, "phash")))
    t("shard_hashes", lambda: noop(new_hashes()))
    t("delta_edges_noop", lambda: noop(edges()))
    print(json.dumps({"n_edges": edges().count()}), flush=True)
    t("cc_over_edges", lambda: noop(connected_components(edges())))

    def full():
        comp = connected_components(edges())
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

    t("full_query", lambda: full().count())


if __name__ == "__main__":
    main()
