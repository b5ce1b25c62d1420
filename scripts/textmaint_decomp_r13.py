#!/usr/bin/env python
"""Round-13 decomposition: where do dedup_edge_maintenance_winnow
(~1.7 s) and dedup_edge_maintenance_minhash (~1.8 s) spend it?
Stages timed in isolation with the noop sink (guide §1.4)."""

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
    spark = get_spark("textmaint-decomp")
    spark.sparkContext.setLogLevel("ERROR")
    import bench

    bench.warm_up(spark, SF_DIR)

    from logsdb_spark.operators.dedup import (
        lsh_count_delta,
        lsh_counts_merge_delta,
        minhash_pairs_from_counts,
        winnow_count_delta,
        winnow_counts_merge_delta,
        winnow_pairs_from_counts,
    )
    from logsdb_spark.operators.silver import (
        minhash_emission_count_layout,
        minhash_index_layout,
        winnow_edge_count_layout,
        winnow_fp_layout,
    )

    # warm the maintenance count layouts (not in bench warm_up)
    minhash_emission_count_layout(spark, SF_DIR).count()
    winnow_edge_count_layout(spark, SF_DIR).count()

    # ---- winnow ----
    idx = winnow_fp_layout(spark, SF_DIR)
    old_ex = idx.filter(F.col("doc_id") % 10 != 0)
    new_ex = idx.filter(F.col("doc_id") % 10 == 0)
    stored = winnow_edge_count_layout(spark, SF_DIR)

    t("wn_scan_index", lambda: noop(idx))
    t("wn_scan_stored", lambda: noop(stored))
    t("wn_delta", lambda: noop(winnow_count_delta(old_ex, new_ex)))
    t("wn_delta_plus_merge", lambda: noop(
        winnow_counts_merge_delta(stored, winnow_count_delta(old_ex, new_ex))))
    t("wn_full", lambda: winnow_pairs_from_counts(
        winnow_counts_merge_delta(stored, winnow_count_delta(old_ex, new_ex))
    ).orderBy("id_a", "id_b").count())

    # ---- minhash ----
    midx = minhash_index_layout(spark, SF_DIR)
    old_sig = midx.filter(F.col("doc_id") % 10 != 0).select("doc_id", "sig")
    new_sig = midx.filter(F.col("doc_id") % 10 == 0).select("doc_id", "sig")
    mstored = minhash_emission_count_layout(spark, SF_DIR)

    t("mh_scan_index_sig", lambda: noop(midx.select("doc_id", "sig")))
    t("mh_scan_index_full", lambda: noop(midx))
    t("mh_scan_stored", lambda: noop(mstored))
    t("mh_delta", lambda: noop(lsh_count_delta(old_sig, new_sig)))
    t("mh_delta_plus_merge", lambda: noop(
        lsh_counts_merge_delta(mstored, lsh_count_delta(old_sig, new_sig))))

    def mh_cands():
        return lsh_counts_merge_delta(
            mstored, lsh_count_delta(old_sig, new_sig)
        ).filter((F.col("n_pair") > 0) | (F.col("n_star") > 0)).select(
            "id_a", "id_b")

    n = mh_cands().count()
    print(json.dumps({"mh_n_cands": n}), flush=True)
    t("mh_full", lambda: minhash_pairs_from_counts(
        lsh_counts_merge_delta(mstored, lsh_count_delta(old_sig, new_sig)),
        midx, threshold=0.6,
    ).orderBy("id_a", "id_b").count())


if __name__ == "__main__":
    main()
