#!/usr/bin/env python
"""100x MEDIA dedup scale probe — the multimodal twin of
scale_probe.py's corpus section.

Replicates the sf0.1 documents corpus N-fold (scale_probe's planted
replication: copy 0 original, copies 1..N-1 synthetic with 1% planted
near-dups — the media fixtures are deterministic functions of the
text, so replicated text IS a replicated media corpus) and measures
the media dedup surface at both scales in one warmed session:

- the three PAIR benches (dedup_image_phash / dedup_audio_fingerprint
  / dedup_video_frames) stay IN-PLAN — they are the decode
  benchmarks, and their cost is the Arrow decode+hash kernels;
- the two KEEP endpoints (dedup_image_phash_keep /
  dedup_media_ensemble_keep) are EDGE-FED since round 11: they read
  the materialized signal-partitioned edge layout
  (operators/silver.dedup_edge_layout), so their per-run cost is an
  edge scan + CC + corpus join. The index + edge-layout builds are
  pre-materialized UNTIMED, like every other layout the probes treat
  as ingest-maintained state (scale_probe.py main() does the same for
  silver/bucketed/minhash/winnow/IVF layouts);
- dedup_media_ensemble_keep_inplan is the from-raw baseline (all
  three decode kernels in-plan) — the number that shows what the
  index buys. ``--skip-inplan`` drops it (it is the one probe whose
  100x cost is minutes, not seconds).

Timing protocol: base_s = sf0.1 exec; scaled_s = first Nx exec (pays
the Janino/JIT compile cliff); scaled_warm_s = immediate re-exec;
ratio_warm = scaled_warm_s / base_s. Writes one JSON to stdout.

Usage: python scripts/media_probe.py [--copies N] [--skip-inplan]
                                     [--rebuild]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# scale_probe reads --copies from argv at import; media_probe shares
# the flag, and the documents-only replication is exactly its
# --skip-queries build (facts kept as originals, corpus replicated).
if "--skip-queries" not in sys.argv:
    sys.argv.append("--skip-queries")

import scale_probe  # noqa: E402
from logsdb_spark.registry import all_queries  # noqa: E402
from logsdb_spark.session import get_spark  # noqa: E402

PAIR_OPS = [
    "dedup_image_phash",
    "dedup_audio_fingerprint",
    "dedup_video_frames",
]
KEEP_OPS = [
    "dedup_image_phash_keep",
    "dedup_media_ensemble_keep",
]
INPLAN_OPS = ["dedup_media_ensemble_keep_inplan"]


def main() -> int:
    os.environ.setdefault("SPARK_DRIVER_MEM", "16g")
    spark = get_spark("media-probe")
    spark.sparkContext.setLogLevel("ERROR")
    if "--rebuild" in sys.argv and os.path.isdir(scale_probe.DST):
        import shutil

        shutil.rmtree(scale_probe.DST)
    if not os.path.exists(scale_probe._SENTINEL):
        scale_probe.build(spark)

    from logsdb_spark.operators.silver import (
        gif_anim_blob_layout,
        media_blob_layout,
        media_evidence_layout,
    )

    # Pre-materialize every layout UNTIMED for both datasets: the blob
    # layouts are the stored input (a decode benchmark that synthesizes
    # its corpus in-plan measures the encoder), and the evidence index
    # is ingest-maintained state (the same contract scale_probe applies
    # to the minhash/winnow/IVF indexes).
    from logsdb_spark.operators.silver import dedup_edge_layout

    for d in (scale_probe.SRC, scale_probe.DST):
        media_blob_layout(spark, d).limit(1).count()
        gif_anim_blob_layout(spark, d).limit(1).count()
        media_evidence_layout(spark, d).limit(1).count()
        dedup_edge_layout(spark, d).limit(1).count()

    queries = all_queries()
    ops = PAIR_OPS + KEEP_OPS
    if "--skip-inplan" not in sys.argv:
        ops = ops + INPLAN_OPS
    if "--skip-ops" in sys.argv:
        ops = []

    results = {}
    for name in ops:
        fn = queries[name]
        t0 = time.perf_counter()
        fn(spark, scale_probe.SRC).count()
        base = time.perf_counter() - t0
        t0 = time.perf_counter()
        fn(spark, scale_probe.DST).count()
        cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        fn(spark, scale_probe.DST).count()
        warm = time.perf_counter() - t0
        results[name] = {
            "base_s": round(base, 3),
            "scaled_s": round(cold, 3),
            "scaled_warm_s": round(warm, 3),
            "ratio_warm": round(warm / base, 2),
        }
        print(f"{name}: base {base:.2f}s cold {cold:.2f}s "
              f"warm {warm:.2f}s ratio_warm {warm / base:.2f}",
              file=sys.stderr)

    # --- stride-vs-recall curve (round 11): the frame-sampling knob
    # the video dedup exposes (LOGSDB_VIDEO_STRIDE). Per stride s:
    # the pair pipeline timed at Nx, plus planted-twin recall against
    # a participants-only exact ground truth (twin pairs sharing >= 2
    # s-strided frame hashes, no hub cap) — the honest cost dial:
    # decode cost falls ~s-fold, recall collapses once ceil(nf/s)
    # drops below the 2-shared-frame contract (fixture nf <= 7, so
    # stride 8 samples one frame per video and recall is 0 BY
    # CONSTRUCTION, not by bug).
    import pyspark.sql.functions as F

    from logsdb_spark.operators.dedup import (
        connected_components,
        winnow_component_edges,
    )
    from logsdb_spark.operators.multimodal import video_frame_hashes
    from logsdb_spark.plans.extensions import _winnow_pairs_from_index
    from scale_probe import _participants

    strides = {}
    if "--skip-stride" not in sys.argv:
        anim = gif_anim_blob_layout(spark, scale_probe.DST)
        parts = _participants(spark, "documents", "doc_id")
        part_anim = anim.join(parts.select("doc_id"), "doc_id")
        for s in (2, 4, 8):
            t0 = time.perf_counter()
            ex = (
                video_frame_hashes(anim, stride=s)
                .select("doc_id", F.col("fhash").alias("fp"))
                .distinct()
            ).persist()
            found_df = _winnow_pairs_from_index(ex).persist()
            found_df.count()
            t = time.perf_counter() - t0
            # END RECALL (round 12): what the KEEP endpoints see —
            # component labels over the star-augmented edge set
            # (winnow_component_edges: capped pairs + over-cap min-doc
            # stars). A truth pair counts as found when both endpoints
            # land in one component — the curator decision, which the
            # r11 retraction semantics collapsed to 0.0004 at 100x.
            t0 = time.perf_counter()
            comp = connected_components(
                winnow_component_edges(ex)
            ).persist()
            comp.count()
            t_comp = time.perf_counter() - t0
            # exact participants-only truth at the same stride
            tex = (
                video_frame_hashes(part_anim, stride=s)
                .select("doc_id", F.col("fhash").alias("fp"))
                .distinct()
            )
            truth = (
                tex.alias("a")
                .join(tex.alias("b"),
                      (F.col("a.fp") == F.col("b.fp"))
                      & (F.col("a.doc_id") < F.col("b.doc_id")))
                .groupBy(F.col("a.doc_id").alias("id_a"),
                         F.col("b.doc_id").alias("id_b"))
                .agg(F.count(F.lit(1)).alias("ns"))
                .filter(F.col("ns") >= 2)
                .select("id_a", "id_b")
            )
            truth = truth.persist()
            n_truth = truth.count()
            n_found = truth.join(found_df.select("id_a", "id_b"),
                                 ["id_a", "id_b"], "left_semi").count()
            ca = comp.select(F.col("doc_id").alias("id_a"),
                             F.col("cluster").alias("ca"))
            cb = comp.select(F.col("doc_id").alias("id_b"),
                             F.col("cluster").alias("cb"))
            n_comp_found = (
                truth.join(ca, "id_a").join(cb, "id_b")
                .filter(F.col("ca") == F.col("cb")).count()
            )
            # CONTRACT truth: the operator promises pairs sharing
            # >= 2 frames whose hash buckets hold 2..32 docs in the
            # FULL corpus (the boilerplate hub cap). At 100x a frame
            # genuinely shared by ~100 replicated copies exceeds the
            # corpus-size-INVARIANT cap and is treated as boilerplate
            # — end recall vs the uncapped truth collapses BY
            # CONTRACT, not by bug; contract recall (vs cap-filtered
            # truth) is the operator-fidelity number. Both are
            # recorded: the honest reading is that at replication
            # scale the CAP, not the stride, is the binding dial.
            occ = (
                ex.groupBy("fp")
                .agg(F.count(F.lit(1)).alias("n"))
                .filter((F.col("n") >= 2) & (F.col("n") <= 32))
                .select("fp")
            )
            tex_ok = tex.join(occ, "fp")
            ctruth = (
                tex_ok.alias("a")
                .join(tex_ok.alias("b"),
                      (F.col("a.fp") == F.col("b.fp"))
                      & (F.col("a.doc_id") < F.col("b.doc_id")))
                .groupBy(F.col("a.doc_id").alias("id_a"),
                         F.col("b.doc_id").alias("id_b"))
                .agg(F.count(F.lit(1)).alias("ns"))
                .filter(F.col("ns") >= 2)
                .select("id_a", "id_b")
            )
            n_ctruth = ctruth.count()
            n_cfound = ctruth.join(found_df.select("id_a", "id_b"),
                                   ["id_a", "id_b"], "left_semi").count()
            strides[f"stride_{s}"] = {
                "scaled_s": round(t, 3),
                "component_s": round(t_comp, 3),
                "n_pairs": found_df.count(),
                "truth_pairs": n_truth,
                "truth_found": n_found,
                "pair_recall_vs_exact": (round(n_found / n_truth, 4)
                                         if n_truth else None),
                "component_found": n_comp_found,
                "recall_vs_exact": (round(n_comp_found / n_truth, 4)
                                    if n_truth else None),
                "contract_truth_pairs": n_ctruth,
                "contract_found": n_cfound,
                "recall_vs_contract": (round(n_cfound / n_ctruth, 4)
                                       if n_ctruth else None),
            }
            found_df.unpersist()
            comp.unpersist()
            truth.unpersist()
            ex.unpersist()
            print(f"video stride {s}: {t:.2f}s "
                  f"end(component) recall "
                  f"{strides[f'stride_{s}']['recall_vs_exact']} "
                  f"pair {strides[f'stride_{s}']['pair_recall_vs_exact']} "
                  f"contract {strides[f'stride_{s}']['recall_vs_contract']}",
                  file=sys.stderr)

    print(json.dumps({
        "copies": scale_probe.COPIES,
        "video_stride": strides,
        "note": (
            "media ops at Nx docs; blob + evidence-index + edge "
            "layouts pre-materialized untimed (ingest-maintained "
            "state). Keep endpoints are EDGE-FED (dedup_edge_layout) "
            "since r11; _inplan is the from-raw decode baseline. "
            "video_stride (r12): recall_vs_exact is now the END "
            "(component/keep) recall over the star-augmented edge "
            "set — over-cap buckets emit min-doc stars instead of "
            "retracting; pair_recall_vs_exact is the conservative "
            "pair contract's number, contract recall its fidelity. "
            "dedup_image_phash_pairs deliberately NOT probed: its "
            "ANSWER is quadratic in identical-hash group size; "
            "pipeline endpoints consume the linear component-"
            "equivalent edges instead."
        ),
        "ops": results,
    }, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
