#!/usr/bin/env python
"""Regenerate PLANS.md: formatted physical plans of the flagship
queries with scale commentary. Run from the repo root."""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from logsdb_spark.registry import REGISTRY, all_queries  # noqa: E402
from logsdb_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.01"

PICKS = {
    "a1_top_event_types": (
        "Reference flagship (P1+P2+A1+O1), DEFAULT-routed through the "
        "DATE-PARTITIONED silver layout since round 5: the coarse "
        "event_date literal lands in the scan's PartitionFilters "
        "(directory pruning — at 100 TB the scan lists ~2 of N day "
        "partitions and never opens the rest), the exact ts literal lands "
        "in PushedFilters to refine the boundary day."
    ),
    "a1_top_event_types_monolithic": (
        "The explicit monolithic BASELINE for the silver-routed default: "
        "the 24h predicate is a build-time literal on the raw ts column "
        "(memoized per session+dataset), so it lands in the scan's "
        "PushedFilters — ONE events scan, row-group pruning, 3-column "
        "ReadSchema; single map-side-combined hash aggregate."
    ),
    "tpch_q5_local_supplier_volume": (
        "Multi-join TPC-H shape: dims broadcast, fact-fact shuffles only on "
        "join keys, partial aggregation before the single exchange."
    ),
    "tpch_q3_shipping_priority": (
        "Q3 (DEFAULT route since round 6) over the bucketed fact layout: orders and lineitem are "
        "hash-bucketed + sorted by their order key, so the fact-fact spine "
        "is a SortMergeJoin with ZERO hash Exchanges and the (orderkey, "
        "orderdate) aggregation reuses the bucket partitioning — the "
        "orderkey shuffle is paid once at layout time, not per query. "
        "(Dumped with auto-broadcast disabled: at sf0.01 both facts fit "
        "under the broadcast threshold, which would hide the SMJ the "
        "layout exists to serve at scale.)"
    ),
    "text_boilerplate_strip": (
        "CCNet-style boilerplate removal: one map-side-combinable token "
        "df aggregate, vocabulary-sized hot set broadcast as a 1-row "
        "array, scan-local array filter per document — the only shuffle "
        "is the token aggregate."
    ),
    "tpch_q21_monolithic": (
        "Single-scan Q21 over bronze (the pre-layout baseline): lineitem "
        "and orders shuffle once each for the join; both stacked groupBys "
        "— (l_orderkey, l_suppkey) then l_orderkey — reuse that "
        "HashPartitioning (no further fact-scale Exchange), and the sole "
        "late supplier's key + late-row count are carried up the "
        "aggregation tree so the fact is never re-joined."
    ),
    "tpch_q21_waiting_suppliers": (
        "Q21 (DEFAULT route since round 6) over the bucketed orderkey layout: even the single remaining "
        "orderkey shuffle disappears — both facts arrive bucket-partitioned "
        "and sorted, the join is a bucket-local SortMergeJoin, and the "
        "stacked groupBys reuse the bucket partitioning. Zero fact-scale "
        "Exchanges end to end. (Dumped with auto-broadcast disabled, as "
        "with tpch_q3_shipping_priority.)"
    ),
    "ann_ivf_kmeans": (
        "Fitted IVF (round-7 default route): the codebook comes from the "
        "MATERIALIZED centroid layout — a 16-row parquet scan collected "
        "into one broadcast row — so the plan is pure inverted-list "
        "search; the unrolled Lloyd fit ran once at layout-build time "
        "(ann_ivf_kmeans_lazy keeps the in-plan fit registered). The "
        "corpus is never shuffled."
    ),
    "cohort_retention": (
        "Round-7 single-scan rework: ONE silver scan → distinct "
        "(user, day) [map-side-combinable exchange] → window-min cohort "
        "over user_id → final rollup. The old broadcast-join form "
        "scanned events twice (Catalyst rewrites min-over-distinct to a "
        "scan-side min, so the branches never shared an exchange) and "
        "broadcast the whole user dimension — unbroadcastable at 1e9 "
        "users. Plan-pinned: one FileScan, no BroadcastExchange."
    ),
    "dedup_minhash_lsh_indexed": (
        "The stored-index route (round 7): signatures + shingle sets come "
        "from the materialized MinHash index layout, so the plan starts "
        "at a (doc_id, shingles, sig) parquet scan — banding, one "
        "(band,hash) bucket shuffle, est-jaccard prefilter, exact verify. "
        "The normalize/tokenize/hash chain ran once at layout time, which "
        "is what production (index maintained at ingest) looks like."
    ),
    "salted_top_users": (
        "Skew lever: two-stage GROUP BY over (user_id, salt16) then user_id "
        "— a hot key's rows spread across 16 reducers; fixed-point sums "
        "merge exactly, so output is identical to the unsalted aggregate."
    ),
    "dedup_minhash_lsh": (
        "Web-scale near-dup: signatures computed in the scan stage (no "
        "shuffle), one (band,hash) bucket shuffle, est-jaccard prefilter, "
        "exact verify on candidates only."
    ),
    "dedup_embedding_ann": (
        "IVF-blocked embedding dedup, linear production config "
        "(target_cell_rows=64 → candidate volume LINEAR), INDEX-FED since "
        "round 8: every scan below reads the materialized ivfidx layout "
        "(assignments + precomputed norms, rk=0 and column pruning pushed "
        "to the parquet scan) — the centroid-scoring chain never runs at "
        "query time. Round 10: candidates come from a per-cell fp64 GEMM "
        "prefilter (one applyInPandas over the cell grouping — vectors "
        "move ONCE, grouped by cell) with a provable no-false-negative "
        "guard; the exact ordered-fold verify re-scores only the "
        "~answer-sized survivors, so values are identical to the r8-r9 "
        "candidate-equi-join shape (100x warm ratio 3.08 vs 31.38). "
        "No O(n^2) self-join. From-raw form benched as "
        "dedup_embedding_ann_inplan."
    ),
    "o2_total_order_ranged": (
        "Distributed total order: range repartition + per-partition rank + "
        "broadcast prefix-sum offsets; the only SinglePartition exchanges "
        "feed 1-row/#partitions-row aggregates."
    ),
    "corpus_retention": (
        "Composed retention decision: scan-local quality, one fingerprint "
        "shuffle for exact reps, LSH pipeline for near-dups, broadcast "
        "cluster join-back."
    ),
    "daily_ohlc_bars": (
        "Bar aggregation as ONE map-side-combinable aggregate: open/close "
        "are min_by/max_by over a composite (epoch, id) key — no window, "
        "no per-group sort, one shuffle on the bar key."
    ),
    "gap_fill_daily_counts": (
        "Dense-grid resample over the date-partitioned silver (round-5 "
        "default): the day key comes from the event_date partition column "
        "(ts absent from ReadSchema), the fact is scanned once by the "
        "daily aggregate, and the days-by-types spine stays "
        "broadcast-side, so the corpus never reshuffles for the calendar."
    ),
    "quality_bigram_lm": (
        "Self-supervised bigram-LM fluency score: two map-side-combinable "
        "count shuffles fit the model, the scoring join shuffles pairs on "
        "the bigram key (the LM table is the product — no corpus-sized "
        "broadcast), and every per-pair probability is one integer "
        "floor-division so sums are exact in any order."
    ),
    "dedup_substring_winnow": (
        "Span-level dedup: winnowing fingerprints computed scan-locally "
        "by the batched Arrow rolling-hash kernel (round 10 — one "
        "MapInPandas node, appears EXACTLY once; "
        "test_winnow_kernel_runs_once pins it, 100x warm ratio 5.97 vs "
        "the md5 form's 50.85) — then ONE fingerprint-bucket shuffle, "
        "in-bucket pair emit (no self-join) with a hub-fingerprint cap "
        "bounding fan-out; >= 27-char shared runs are guaranteed to "
        "collide, >= 35-char runs are recall-gated at 1.0 "
        "(gate_substring_winnow_recall)."
    ),
    "dedup_media_ensemble_keep": (
        "Multimodal curator endpoint, INDEX-FED since late r10: three "
        "kind-pruned scans of the materialized perceptual-fingerprint "
        "index (PartitionFilters on the kind directory column — no "
        "decode kernel in-plan; the from-raw baseline stays registered "
        "as _inplan), three bounded band/bucket shuffles, one union, "
        "one connected-components pass over dup-sized edges, one "
        "corpus-keyed final left join."
    ),
    "dedup_corpus_keep": (
        "THE corpus curator: all FIVE dedup signals in ONE "
        "connected-components pass, so dup groups merge transitively "
        "across signals AND modalities. EDGE-FED since r11: the "
        "evidence is the materialized signal-partitioned edge layout "
        "(dedup_edge_layout, near-dup edges maintained at ingest) — "
        "one narrow edge scan, CC over dup-sized edges (tiny-regime "
        "Arrow kernel below 20M edges), one corpus-keyed left join; "
        "no tokenize/decode/band/verify chain in-plan (that route "
        "stays benched as dedup_corpus_keep_fromindex)."
    ),
    "ann_ivf_pq": (
        "Composed IVFADC (round 11): coarse argmax-cosine cell prune "
        "to nprobe=4 of 16 broadcast centroids, ADC table-lookup "
        "scoring over ONLY the probed cells' rows of the composed "
        "(vec_id, cell, codes, nrm) layout — codes stored WITH their "
        "inverted list — then per-probe 64-pool cut on the rounded "
        "approximate cosine and exact rerank. Candidate scan reads "
        "nprobe/n_centroids of a ~32x-compressed relation; probes, "
        "centroids, and codebooks broadcast; no shuffle before the "
        "WindowGroupLimit pool cut."
    ),
    "ann_pq_adc": (
        "Product-quantization ANN with asymmetric distance "
        "computation (late r10): the candidate scan reads ONLY the "
        "materialized (vec_id, codes, nrm) layout — m=8 4-bit codes "
        "per vector, 32 information bits vs 2048 raw — probes "
        "broadcast, fixed-order per-subspace lookup-sum score, "
        "per-probe 64-pool cut, exact rerank joins full-precision "
        "vectors for pool rows only. Linear scan, no shuffle before "
        "the pool cut; at 100 TB ADC slots in as the in-cell scorer "
        "of the IVF paths."
    ),
    "dedup_edge_maintenance_minhash": (
        "Round-12 MinHash edge maintenance: the shard's banded keys "
        "broadcast as the touched-bucket filter (the corpus key relation "
        "reduces map-side — no corpus shuffle per shard), ONE fused "
        "old/new capped bucket emit over touched buckets (both variants "
        "signed from a single groupBy row — the two-pass form paid the "
        "corpus scan and bucket shuffle twice), one candidate-sized "
        "full-outer merge against the stored (n_pair, n_star) counts, "
        "and the deterministic est-prefilter + exact-jaccard verify at "
        "read. Per-shard cost ∝ the shard's banded-key footprint."
    ),
    "dedup_edge_maintenance_phash": (
        "Round-12 Hamming-ball edge maintenance (additive — the "
        "exact-radius banding has no cap, so no retraction regime): "
        "exact-dup arrivals attach to stored reps via a broadcast join, "
        "new reps probe ONLY the balls they land in (shard band keys "
        "broadcast against the banded projection of the stored rep "
        "table — the corpus side scans map-side, zero corpus shuffles), "
        "plus a shard-sized internal ball; CC over stored ∪ delta gated "
        "at the component level by the keep endpoint's oracle."
    ),
    "ann_index_maintenance_ivf": (
        "Round-12 ANN index maintenance: the shard encodes against the "
        "FROZEN centroid model (one broadcast row of centroids, "
        "row-local top-2 cosine scoring in a single codegen pass) and "
        "unions with the stored inverted-list layout scan — zero "
        "corpus work per shard; model re-selection is the rare "
        "versioned refresh event. At 100x the delta measured 15.0 s vs "
        "the same-model rebuild's 140.2 s (the 1/shard-fraction bound)."
    ),
    "dsir_select_topk": (
        "Round-12 DSIR data selection: one corpus gram pass feeds BOTH "
        "the 256-bucket distribution fit (B-bounded, map-side "
        "combinable) and the per-doc (doc, bucket) count agg; the B-row "
        "log-ratio model broadcasts; weights fold bucket-ordered "
        "in-row; the final top-k is a dim-scale window over per-doc "
        "weights (one row per doc — the documented global-window "
        "exception, with the ranged-ranking pattern as the 100 TB "
        "fallback)."
    ),
    "corpus_shuffle_ranged": (
        "Round-12 deterministic corpus shuffle: scan-local seeded "
        "portable-hash key, ONE range exchange on the key, "
        "per-partition row_number (window keyed by _pid — parallelism "
        "= #partitions), broadcast prefix-sum offsets; the only "
        "SinglePartition exchange feeds the #partitions-row offset "
        "aggregate. At 100 TB the same relation feeds "
        "partitionBy(shard) writes: one shuffled epoch per range "
        "exchange."
    ),
    "tokenizer_bpe_merges": (
        "Distributed BPE training: ONE corpus-sized word-count aggregate "
        "(map-side combinable), then per merge round a vocab-sized "
        "weighted pair-count aggregate + a one-row argmax collect + a "
        "broadcast-literal re-segmentation (plain string replace — no "
        "shuffle). The dumped plan shows the final round's shape; the "
        "vocab frame is localCheckpointed once so rounds never re-run "
        "the corpus scan."
    ),
    "dedup_video_frames_cross": (
        "Cross-container video dedup (GIF + MJPEG/AVI through one "
        "format-sniffing Arrow decode kernel): scan-local decode+hash "
        "over the materialized mixed blob layout, ONE frame-hash bucket "
        "shuffle, in-bucket capped pair emit — identical shape to "
        "dedup_video_frames, the container dispatch adding zero plan "
        "cost."
    ),
    "multimodal_gif_frames_stats": (
        "REAL multi-frame animation decode: materialized blob layout, "
        "one widened scan, one Arrow kernel emitting the frame-order-"
        "sensitive checksum; per-blob compute, no shuffle until the "
        "presentation sort."
    ),
    "dedup_image_phash_pairs": (
        "Image-content near-dup (round 10): blobs decode + 56-bit dHash "
        "in one Arrow kernel over the materialized PNG layout "
        "(scan-local), 4x14-bit Hamming-ball banding — ONE band-key "
        "shuffle, in-bucket pair emit, no self-join — then "
        "bit_count(xor) verify; exact at radius 3 by pigeonhole, which "
        "is why the brute-force oracle hash-matches the banded plan."
    ),
}


def main() -> None:
    all_queries()
    spark = get_spark("plans", master="local[8]", shuffle_partitions=8)
    out = [
        "# PLANS — formatted physical plans of the flagship queries",
        "",
        "Generated at sf0.01 on local[8] (regenerate: "
        "`python scripts/dump_plans.py`).",
        "Commentary notes the property that makes each plan survive a "
        "100 TB input.",
        "",
    ]
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    # queries whose advertised plan property only shows when the
    # small-sf sides don't auto-broadcast (at sf0.01 everything fits
    # under the threshold, which would hide the SMJ the bucketed
    # layout exists for)
    NO_AUTO_BROADCAST = {"tpch_q3_shipping_priority", "tpch_q21_waiting_suppliers"}
    for name, note in PICKS.items():
        default_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        if name in NO_AUTO_BROADCAST:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            df = REGISTRY[name].spark_fn(spark, SF)
            plan = df._jdf.queryExecution().explainString(mode)
        finally:
            spark.conf.set(
                "spark.sql.autoBroadcastJoinThreshold", default_thresh
            )
        blocks = plan.split("\n\n")
        tree = blocks[0]
        # keep each scan node's detail block: PushedFilters/ReadSchema
        # are the pruning evidence the tree skeleton hides.
        scans = [
            b.strip() for b in blocks[1:]
            if b.strip().startswith("(")
            and "Scan parquet" in b.strip().splitlines()[0]
        ]
        detail = ("\n\n" + "\n\n".join(scans)) if scans else ""
        out.append(f"## {name}\n\n{note}\n\n```\n{tree}{detail}\n```\n")
    with open("PLANS.md", "w") as fp:
        fp.write("\n".join(out))


if __name__ == "__main__":
    main()
