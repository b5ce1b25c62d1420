#!/usr/bin/env python
"""10x scale probe: replicate the sf0.1 fact tables tenfold (key-shifted
so uniqueness-bearing keys stay unique) into a local sf1-equivalent
dataset, run the headline queries at both scales in ONE warmed
session, and print the per-query time ratio.

Purpose: measured evidence for the scaling claims in README "Scale
design" — a plan whose runtime grows ~linearly (ratio ~10x or less on
32 local cores, where small inputs underuse the cores) has no hidden
quadratic/SPOF stage at this step size.

The dedup/ANN corpus is replicated with PLANTED, CONTROLLED structure
instead of naive copying (which would manufacture 10-way true-dup
groups and grow the ANSWER quadratically in group size):

- copy 0 keeps the original documents/embeddings (and their original
  planted dup pairs);
- copies 1..9 get SYNTHETIC content (hash-seeded word sequences /
  pseudorandom vectors) with ~zero cross-similarity at the pipelines'
  thresholds — they add scale, not answer;
- 1% of each copy's rows are PLANTED near-dups of a copy-specific,
  disjoint slice of the originals (doc_id % 100 == copy: every 25th
  word replaced with a unique token → word-bigram jaccard ≈ 0.92,
  char-trigram jaccard ≈ 0.9, word-trigram containment ≈ 0.86;
  embeddings perturbed v + 0.03·noise, where the raw noise vector has
  norm ≈ 4.6 → perturbation norm ≈ 0.14 → cosine ≈ 0.99), so every
  planted pair is its own 2-element group and the true answer grows
  LINEARLY with the data. The probe measures both the time ratio AND
  the recall on planted pairs, so the scale path's quality is verified
  under load, not just its wall-clock.

The embedding dedup is probed through its operator at threshold 0.85
(the planted-pair regime) rather than the registered query's 0.4:
at 0.4 on this near-isotropic corpus the answer itself is quadratic
background overlap (documented at plans/extensions.dedup_embedding_ann),
which no replication scheme can linearize.

Usage: python scripts/scale_probe.py  [--rebuild] [--skip-corpus]
                                      [--copies N] [--skip-queries]
                                      [--corpus-probes a,b,...]
                                      [--re-exec]
``--skip-queries`` probes only the dedup/ANN corpus paths (the 100x
run targets those four scale paths; replicating the relational facts
100x adds build time without new information past the 30x point).
``--corpus-probes`` restricts the corpus probes by name
("ensemble" = dedup_ensemble_keep, "embedding" =
dedup_embedding_ann@0.85). ``--re-exec`` times each scaled corpus
probe a SECOND time (scaled_warm_s/ratio_warm): first execution at
Nx pays a one-time Janino/JIT compile cliff the warm number excludes
(measured r7: minhash 25.6x single-shot vs 2.8x re-executed).
Writes the replicated dataset to /tmp/logsdb_scale_probe/x{N} once per
replication factor and reuses it; --rebuild forces a rewrite. Output
JSON keys are base_s (the sf0.1 run) and scaled_s (the Nx run).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bench import warm_up  # noqa: E402
from logsdb_spark.registry import all_queries  # noqa: E402
from logsdb_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
# --copies N picks the replication factor (default 10); each factor
# gets its own dataset dir so 10x and 30x probes can coexist.
COPIES = 10
for _i, _a in enumerate(sys.argv):
    if _a == "--copies" and _i + 1 < len(sys.argv):
        COPIES = int(sys.argv[_i + 1])
DST = f"/tmp/logsdb_scale_probe/x{COPIES}"

# key columns that must stay unique per copy (shifted by copy index);
# FK columns shift with their PK so join fan-in is preserved per copy.
SHIFTS = {
    "events": {"event_id": 10_000_000_000},
    "orders": {"o_orderkey": 10_000_000_000, "o_custkey": 0},
    "lineitem": {"l_orderkey": 10_000_000_000},
    "customer": {},
    "supplier": {},
    "part": {},
    "nation": {},
    "region": {},
}
FACTS = {"events", "orders", "lineitem"}

QUERIES = [
    "a1_top_event_types",
    "a3_top_users",
    "a5_first_seen_dedup",
    "j2_bridge_collect",
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q9_product_profit",
    "tpch_q21_waiting_suppliers",
    "sessionize_events",
    "gap_fill_daily_counts",
    "salted_top_users",
    "dq_expectations_events",
    "snapshot_diff_events",
    # round-6: corpus-fitted bigram LM (two count shuffles + model
    # joins — the heaviest non-dedup documents query)
    "quality_bigram_lm",
]


_SENTINEL = os.path.join(DST, "_BUILD_COMPLETE")

ID_SHIFT = 10_000_000_000
# copy i plants near-dups of originals with id % PLANT_MOD == i — a
# DISJOINT slice per copy, so every planted pair is a 2-element group
# and the true answer grows linearly with the corpus.
PLANT_MOD = 100


def _doc_copy(df, i: int):
    """Copy ``i`` of documents: planted rows mutate the ORIGINAL text
    (every 25th word → a copy-unique token: word-bigram jaccard ≈ 0.92,
    char-trigram ≈ 0.9, word-trigram containment ≈ 0.86 vs the
    original — above every pipeline threshold); the rest get synthetic
    hash-seeded word sequences with ~zero cross-similarity."""
    planted = F.col("doc_id") % PLANT_MOD == i
    words = F.split(F.col("text"), " ")
    uniq = lambda idx: F.concat(  # noqa: E731
        F.lit(f"u{i}x"), F.col("doc_id").cast("string"), F.lit("x"),
        idx.cast("string"),
    )
    mutated = F.array_join(
        F.transform(words, lambda w, idx: F.when(idx % 25 == 3, uniq(idx)).otherwise(w)),
        " ",
    )
    synth = F.array_join(
        F.transform(
            F.sequence(F.lit(0), F.lit(44)),
            lambda j: F.concat(
                F.lit("w"),
                F.pmod(F.xxhash64(F.col("doc_id"), F.lit(i), j), F.lit(9973))
                .cast("string"),
            ),
        ),
        " ",
    )
    text_i = F.when(planted, mutated).otherwise(synth)
    return df.select(
        (F.col("doc_id") + i * ID_SHIFT).alias("doc_id"),
        text_i.alias("text"),
        "lang",
        "source",
        F.length(text_i).cast("long").alias("n_chars"),
    )


def _emb_copy(df, i: int):
    """Copy ``i`` of embeddings: planted rows are the original
    (unit-norm) vector + 0.03·noise — the raw uniform[-1,1]^64 noise
    vector has norm ≈ sqrt(64/3) ≈ 4.6, so the perturbation's norm is
    ≈ 0.14 and cosine to the original ≈ 0.99; the rest are fully
    pseudorandom vectors (cosine to anything ~N(0, 1/8))."""
    planted = F.col("vec_id") % PLANT_MOD == i
    noise = F.transform(
        F.sequence(F.lit(0), F.lit(63)),
        lambda j: (
            (F.pmod(F.xxhash64(F.col("vec_id"), F.lit(i), j), F.lit(2001)) - 1000)
            .cast("double") / 1000.0
        ),
    )
    perturbed = F.zip_with(
        F.col("embedding"), noise,
        lambda a, b: (a.cast("double") + 0.03 * b).cast("float"),
    )
    synthetic = F.transform(noise, lambda x: x.cast("float"))
    return df.select(
        (F.col("vec_id") + i * ID_SHIFT).alias("vec_id"),
        F.when(planted, perturbed).otherwise(synthetic).alias("embedding"),
        "label",
    )


def build(spark) -> None:
    # rebuild from scratch if a previous build died midway — a partial
    # dataset would silently corrupt the measured ratios
    if os.path.isdir(DST):
        shutil.rmtree(DST)
    os.makedirs(os.path.dirname(DST), exist_ok=True)
    for name, shifts in SHIFTS.items():
        src = os.path.join(SRC, f"{name}.parquet")
        dst = os.path.join(DST, f"{name}.parquet")
        df = spark.read.parquet(src)
        # --skip-queries runs only the documents/embeddings corpus
        # probes: keep the relational tables present (originals) but
        # skip replicating the facts N-fold
        if name in FACTS and "--skip-queries" not in sys.argv:
            parts = []
            for i in range(COPIES):
                p = df
                for col, step in shifts.items():
                    if step:
                        p = p.withColumn(col, F.col(col) + F.lit(i * step))
                parts.append(p)
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
        else:
            out = df
        out.write.mode("overwrite").parquet(dst)
    for name, mk in (("documents", _doc_copy), ("embeddings", _emb_copy)):
        df = spark.read.parquet(os.path.join(SRC, f"{name}.parquet"))
        out = df
        for i in range(1, COPIES):
            out = out.unionByName(mk(df, i))
        out.write.mode("overwrite").parquet(os.path.join(DST, f"{name}.parquet"))
    with open(_SENTINEL, "w") as fh:
        fh.write("ok\n")


# dedup/ANN pipelines probed at 10x with planted structure; the first
# three also get a recall-on-planted-pairs measurement.
CORPUS_QUERIES = [
    "dedup_minhash_lsh",
    "dedup_ngram_lsh",
    "dedup_containment_prefix",
    "ann_ivf_kmeans",
    # round-6: winnowing span dedup (post re-evaluation fix). The
    # planted mutation leaves 24-word (~>100 char) verbatim runs
    # between every 25th-word substitution, far past the 35-char
    # two-window guarantee, so planted pairs are true span dups and
    # get a recall measurement like the other dedup paths.
    "dedup_substring_winnow",
    # round-6: int8-quantized IVF (timing ratio only — its recall
    # contract is pinned by output-equality with the unquantized
    # path, test_ivf_quantized_matches_exact_topk)
    "ann_ivf_quantized",
    # round-10: PQ/ADC over the materialized code layout (timing
    # ratio only — recall pinned by gate_ann_pq_recall + pytest)
    "ann_pq_adc",
    # round-11: composed IVFADC (timing ratio only — recall pinned by
    # gate_ann_ivf_pq_recall + pytest; the r10 ask's target is a
    # warm ratio <= 2 vs ADC-only 3.14, the cell prune cutting the
    # code scan to nprobe/n_centroids)
    "ann_ivf_pq",
    # round-11: incremental winnow edge maintenance (timing ratio
    # only — correctness is the shared full-rebuild oracle): cost
    # should scale with the 10% shard's fingerprint footprint
    "dedup_edge_maintenance_winnow",
    # round-12: the MinHash twin (timing ratio only — shared
    # brute-force oracle): cost should scale with the shard's
    # banded-key footprint
    "dedup_edge_maintenance_minhash",
    # round-12: the Hamming-ball media delta (timing ratio only —
    # component-level keep oracle shared verbatim): cost should
    # scale with the shard's hash footprint + touched balls
    "dedup_edge_maintenance_phash",
    # round-12: the video twin (winnow deltas over the frame-hash
    # index; count + star state in one query)
    "dedup_edge_maintenance_vframe",
    # round-12: ANN index maintenance (shard encodes under the
    # frozen model, row-local broadcast scoring — the cost should be
    # the shard encode + the stored-layout scan union)
    "ann_index_maintenance_ivf",
    # round-12: deterministic corpus shuffle (timing ratio only —
    # correctness is the permutation oracle): one range exchange +
    # _pid-keyed windows, so the ratio should track data volume
    "corpus_shuffle_ranged",
]


def _n_planted(spark, table: str, id_col: str) -> int:
    """Ground-truth planted-pair count: one pair per original id with
    1 <= id % PLANT_MOD <= COPIES-1 (its twin lives in copy id%PLANT_MOD)."""
    return (
        spark.read.parquet(os.path.join(SRC, f"{table}.parquet"))
        .filter((F.col(id_col) % PLANT_MOD).between(1, COPIES - 1))
        .count()
    )


def _planted_found(out_pairs) -> int:
    """Planted pairs present in a dedup output — a pure FILTER, no
    join: the planted relation is arithmetic (b = a + (a%PLANT_MOD) *
    ID_SHIFT, a in copy 0), so membership is testable row-locally."""
    return out_pairs.filter(
        (F.col("id_a") < ID_SHIFT)
        & (F.col("id_a") % PLANT_MOD).between(1, COPIES - 1)
        & (F.col("id_b")
           == F.col("id_a") + (F.col("id_a") % PLANT_MOD) * ID_SHIFT)
    ).count()


def _recall_on_planted(out_pairs, total: int, eligible: int | None = None) -> dict:
    """``eligible`` = planted pairs whose TRUE similarity clears the
    pipeline's threshold (mutation overshoot on short docs can drop a
    planted pair below it — such pairs are CORRECTLY absent, since the
    LSH/prefix paths are exact-verify). recall_vs_eligible is the
    pipeline's real recall under load; recall (vs all planted) mixes
    in fixture overshoot."""
    hits = _planted_found(out_pairs)
    out = {"planted": total, "found": hits,
           "recall": round(hits / total, 4) if total else None}
    if eligible is not None:
        out["eligible"] = eligible
        out["recall_vs_eligible"] = (
            round(hits / eligible, 4) if eligible else None
        )
    return out


def _participants(spark, table: str, id_col: str):
    """The planted-pair member rows of the 10x dataset: originals with
    1 <= id % PLANT_MOD <= COPIES-1 plus their copy-i twins — small
    (~2% of the corpus), so O(n²) ground truth over JUST these rows is
    cheap and serves as the eligibility reference."""
    df = spark.read.parquet(os.path.join(DST, f"{table}.parquet"))
    c = F.col(id_col)
    orig = (c < ID_SHIFT) & (c % PLANT_MOD).between(1, COPIES - 1)
    twin = (c >= ID_SHIFT) & (
        (c % ID_SHIFT) % PLANT_MOD == (c / ID_SHIFT).cast("long")
    )
    return df.filter(orig | twin)


def _n_eligible(truth_pairs) -> int:
    """Planted pairs in a ground-truth pair frame (same arithmetic
    filter as _planted_found)."""
    return _planted_found(truth_pairs)


def main() -> None:
    # the 10x corpus pipelines are driver-memory-hungry in single-JVM
    # local mode (HOF-heavy signature arrays + broadcast stages); 16g
    # mirrors a realistic driver for this data size. Overridable.
    os.environ.setdefault("SPARK_DRIVER_MEM", "16g")
    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    if "--rebuild" in sys.argv and os.path.isdir(DST):
        shutil.rmtree(DST)
    if not os.path.exists(_SENTINEL):
        build(spark)
    warm_up(spark, SRC)

    # Pre-materialize the date-partitioned silver for both datasets,
    # UNTIMED: the routed queries (a1/a3/gap_fill/... since round 5)
    # read this layout, and in production it is written at INGEST time
    # (streaming/ingest.py partitions by event_date) — charging the
    # one-time layout build to the first routed query's ratio would
    # measure the build, not the query.
    from logsdb_spark.operators.silver import (
        bucketed_orderkey_tables,
        kmeans_centroid_layout,
        silver_events,
    )

    silver_events(spark, SRC)
    bucketed_orderkey_tables(spark, SRC)
    if "--skip-queries" not in sys.argv:
        silver_events(spark, DST)
        # same contract for the bucketed orderkey layout: the DEFAULT
        # q3/q4/q12/q18/q21 route reads it since round 6, and
        # production pays the write once at layout time
        bucketed_orderkey_tables(spark, DST)
    # and for the fitted k-means codebook (ann_ivf_kmeans's DEFAULT
    # route reads this model layout since round 7; the fit is paid
    # once at model-build time in production)
    kmeans_centroid_layout(spark, SRC)
    kmeans_centroid_layout(spark, DST)
    # and for the dedup index layouts (the keep queries read the
    # stored MinHash signature + winnow fingerprint indexes since
    # round 7; production maintains them at ingest)
    from logsdb_spark.operators.silver import (
        minhash_index_layout,
        winnow_fp_layout,
    )

    minhash_index_layout(spark, SRC).limit(1).count()
    minhash_index_layout(spark, DST).limit(1).count()
    winnow_fp_layout(spark, SRC).limit(1).count()
    winnow_fp_layout(spark, DST).limit(1).count()
    # and the round-8 embedding index layouts (dedup_embedding_ann's
    # default route reads the IVF assignment inverted lists;
    # ann_ivf_quantized reads the int8 code corpus)
    from logsdb_spark.operators.silver import (
        ivf_assign_layout,
        ivf_quantized_layout,
    )

    ivf_assign_layout(spark, SRC).limit(1).count()
    ivf_assign_layout(spark, DST).limit(1).count()
    ivf_quantized_layout(spark, SRC).limit(1).count()
    ivf_quantized_layout(spark, DST).limit(1).count()
    # and the round-10 PQ layouts (ann_pq_adc reads the fitted
    # codebooks + 4-bit code corpus)
    from logsdb_spark.operators.silver import (
        pq_code_layout,
        pq_codebook_layout,
    )

    pq_codebook_layout(spark, SRC).limit(1).count()
    pq_codebook_layout(spark, DST).limit(1).count()
    pq_code_layout(spark, SRC).limit(1).count()
    pq_code_layout(spark, DST).limit(1).count()
    # and the round-11 composed IVF+PQ store (ann_ivf_pq's scan side)
    from logsdb_spark.operators.silver import ivf_pq_layout

    ivf_pq_layout(spark, SRC).limit(1).count()
    ivf_pq_layout(spark, DST).limit(1).count()
    # and the round-11 dedup edge layout (the keep endpoints' evidence)
    from logsdb_spark.operators.silver import dedup_edge_layout

    dedup_edge_layout(spark, SRC).limit(1).count()
    dedup_edge_layout(spark, DST).limit(1).count()
    from logsdb_spark.operators.silver import winnow_edge_count_layout

    winnow_edge_count_layout(spark, SRC).limit(1).count()
    winnow_edge_count_layout(spark, DST).limit(1).count()
    # and the round-12 maintenance state (stored counts / reps /
    # occupancy are the operators' PREMISE — production keeps them
    # columnar and pays the build at ingest)
    from logsdb_spark.operators.silver import (
        media_edge90_layout,
        media_evidence_layout,
        media_rep90_layout,
        minhash_emission_count_layout,
        vframe_edge_count_layout,
        vframe_star_state_layout,
    )
    from logsdb_spark.operators.silver import (
        ivf_assign90_layout,
        ivf_cent90_layout,
    )

    for _d in (SRC, DST):
        media_evidence_layout(spark, _d).limit(1).count()
        media_edge90_layout(spark, _d, "phash").limit(1).count()
        media_rep90_layout(spark, _d, "phash").limit(1).count()
        minhash_emission_count_layout(spark, _d).limit(1).count()
        vframe_edge_count_layout(spark, _d).limit(1).count()
        vframe_star_state_layout(spark, _d).limit(1).count()
        ivf_cent90_layout(spark, _d).limit(1).count()
        ivf_assign90_layout(spark, _d).limit(1).count()

    results = {}
    queries = all_queries()
    if "--skip-queries" in sys.argv:
        query_list = []
    else:
        query_list = QUERIES
    for name in query_list:
        fn = queries[name]
        t0 = time.perf_counter()
        fn(spark, SRC).count()
        t_small = time.perf_counter() - t0
        t0 = time.perf_counter()
        fn(spark, DST).count()
        t_big = time.perf_counter() - t0
        results[name] = {
            "base_s": round(t_small, 3),
            "scaled_s": round(t_big, 3),
            "ratio": round(t_big / t_small, 2),
        }

    probe_filter = None
    for _i, _a in enumerate(sys.argv):
        if _a == "--corpus-probes" and _i + 1 < len(sys.argv):
            probe_filter = set(sys.argv[_i + 1].split(","))

    def probed(name: str) -> bool:
        if probe_filter is None:
            return True
        short = {"dedup_ensemble_keep": "ensemble",
                 "dedup_embedding_ann@0.85": "embedding"}.get(name)
        return name in probe_filter or short in probe_filter

    re_exec = "--re-exec" in sys.argv

    corpus = {}
    if "--skip-corpus" not in sys.argv:
        from logsdb_spark.operators.dedup import (
            brute_force_near_dups,
            char_ngram_near_dups,
            containment_near_dups,
            shared_run_pairs,
        )
        from logsdb_spark.operators.similarity import pairwise_cosine_dedup

        n_doc_planted = _n_planted(spark, "documents", "doc_id")
        n_emb_planted = _n_planted(spark, "embeddings", "vec_id")
        doc_parts = _participants(spark, "documents", "doc_id")
        emb_parts = _participants(spark, "embeddings", "vec_id")
        eligible_fns = {
            "dedup_minhash_lsh": lambda: _n_eligible(
                brute_force_near_dups(doc_parts, threshold=0.6)),
            "dedup_ngram_lsh": lambda: _n_eligible(
                char_ngram_near_dups(doc_parts, n=3, threshold=0.8)),
            "dedup_containment_prefix": lambda: _n_eligible(
                containment_near_dups(doc_parts, threshold=0.8)),
            # span truth: planted pairs still sharing a >= 35-char
            # verbatim run (the winnow two-window guarantee bound)
            "dedup_substring_winnow": lambda: _n_eligible(
                shared_run_pairs(doc_parts, run_len=35)),
            "dedup_embedding_ann@0.85": lambda: _n_eligible(
                pairwise_cosine_dedup(emb_parts, threshold=0.85)),
        }
        # eligibility ground truth is O(participants^2) — compute it
        # only for the paths actually probed this run
        eligible = {k: fn() for k, fn in eligible_fns.items() if probed(k)}

        # dedup_embedding_ann IS the linear production config since
        # round 5 (constant target-cell size → linear candidate
        # volume); probe the registered default directly so the
        # measured plan is exactly what queries() runs.
        probes = [(n, queries[n]) for n in CORPUS_QUERIES if probed(n)]
        if probed("dedup_embedding_ann@0.85"):
            probes.append(("dedup_embedding_ann@0.85",
                           queries["dedup_embedding_ann"]))
        for name, fn in probes:
            t0 = time.perf_counter()
            fn(spark, SRC).count()
            t_small = time.perf_counter() - t0
            # persist so the timed Nx run is executed ONCE and the
            # recall filter reads the materialized pairs instead of
            # re-running the whole pipeline. The BUILD is inside the
            # timer: iterative queries (connected components) run
            # their propagation jobs at build time, so timing only
            # count() would skip their real work.
            t0 = time.perf_counter()
            big = fn(spark, DST).persist()
            big.count()
            t_big = time.perf_counter() - t0
            corpus[name] = {
                "base_s": round(t_small, 3),
                "scaled_s": round(t_big, 3),
                "ratio": round(t_big / t_small, 2),
            }
            if name in eligible:
                total = (n_emb_planted if name.startswith("dedup_embedding")
                         else n_doc_planted)
                corpus[name].update(
                    _recall_on_planted(big, total, eligible[name])
                )
            big.unpersist()
            if re_exec:
                t0 = time.perf_counter()
                fn(spark, DST).count()
                t_warm = time.perf_counter() - t0
                corpus[name]["scaled_warm_s"] = round(t_warm, 3)
                corpus[name]["ratio_warm"] = round(t_warm / t_small, 2)

        # Ensemble keep decision: its output is per-doc (cluster, keep),
        # not pairs, so recall is measured as the TWIN-DROP rate — a
        # planted twin (copy i of original a, where a % PLANT_MOD == i)
        # must land in its original's component and be dropped.
        name = "dedup_ensemble_keep"
        if probed(name):
            fn = queries[name]
            t0 = time.perf_counter()
            fn(spark, SRC).count()
            t_small = time.perf_counter() - t0
            # build inside the timer — the component iterations run as
            # jobs during plan construction (see note above)
            t0 = time.perf_counter()
            big = fn(spark, DST).persist()
            big.count()
            t_big = time.perf_counter() - t0
            c = F.col("doc_id")
            twin = (c >= ID_SHIFT) & (
                (c % ID_SHIFT) % PLANT_MOD == (c / ID_SHIFT).cast("long")
            )
            dropped = big.filter(twin & ~F.col("keep")).count()
            corpus[name] = {
                "base_s": round(t_small, 3),
                "scaled_s": round(t_big, 3),
                "ratio": round(t_big / t_small, 2),
                "planted": n_doc_planted,
                "twin_dropped": dropped,
                "twin_drop_rate": (round(dropped / n_doc_planted, 4)
                                   if n_doc_planted else None),
            }
            big.unpersist()
            if re_exec:
                t0 = time.perf_counter()
                fn(spark, DST).count()
                t_warm = time.perf_counter() - t0
                corpus[name]["scaled_warm_s"] = round(t_warm, 3)
                corpus[name]["ratio_warm"] = round(t_warm / t_small, 2)
    print(json.dumps({"copies": COPIES, "queries": results, "corpus": corpus}))


if __name__ == "__main__":
    main()
