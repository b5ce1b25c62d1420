"""Similarity search over embedding columns — *[extension]*
(SURVEY §2.12).

Two tiers:
- brute-force cosine top-k (exact; the oracle baseline — cross join,
  O(probes × corpus), fine when the probe set is small and broadcast)
- LSH-bucketed ANN (random-hyperplane signatures; the scale path —
  candidates only within matching buckets, probabilistic recall)

Hyperplanes are derived deterministically from xxhash64(dim, plane) so
runs are reproducible without any RNG state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.vectors import cosine, dot


def brute_force_topk(emb: DataFrame, probes: DataFrame, k: int = 10) -> DataFrame:
    """Exact top-k cosine neighbors for each probe vector.

    ``probes`` is (probe_id, probe_vec); it broadcasts, so the corpus is
    scanned once with no shuffle of the big side. The per-probe top-k
    window partitions by probe_id — k·|probes| rows after filtering."""
    scored = emb.join(F.broadcast(probes)).select(
        "probe_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(cosine(F.col("embedding"), F.col("probe_vec")), 4).alias("cos_sim"),
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", "cos_sim", "rank")
    )


def hyperplane_signature(vec: F.Column, n_planes: int, dim: int) -> F.Column:
    """Sign-bit signature: bit p = [dot(vec, h_p) > 0] where
    h_p[i] = +1 if xxhash64(i, p) even else -1. The dot with a ±1
    hyperplane is an ordered fold of conditional adds — all JVM-side."""
    def plane_dot(p: int) -> F.Column:
        signed = F.zip_with(
            vec,
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda x, i: F.when(
                F.xxhash64(i, F.lit(p)).bitwiseAND(F.lit(1)) == 0,
                x.cast("double"),
            ).otherwise(-x.cast("double")),
        )
        return F.aggregate(signed, F.lit(0.0), lambda acc, v: acc + v)

    bits = [
        F.when(plane_dot(p) > 0, F.shiftleft(F.lit(1).cast("long"), p)).otherwise(
            F.lit(0).cast("long")
        )
        for p in range(n_planes)
    ]
    sig = bits[0]
    for b in bits[1:]:
        sig = sig.bitwiseXOR(b)
    return sig


def lsh_ann_topk(emb: DataFrame, probes: DataFrame, k: int = 10,
                 n_planes: int = 8, dim: int = 64) -> DataFrame:
    """ANN: bucket corpus and probes by hyperplane signature; search
    only the probe's bucket. At scale the corpus is hash-partitioned by
    signature (a narrow long key); each probe touches one partition's
    bucket instead of the full corpus. Recall < 1 by construction —
    verified against brute force in tests, not oracle-gated."""
    sig = hyperplane_signature(F.col("embedding"), n_planes, dim)
    bucketed = emb.select("vec_id", "embedding", sig.alias("bucket"))
    psig = hyperplane_signature(F.col("probe_vec"), n_planes, dim)
    pb = probes.select("probe_id", "probe_vec", psig.alias("bucket"))
    scored = bucketed.join(F.broadcast(pb), "bucket").select(
        "probe_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(cosine(F.col("embedding"), F.col("probe_vec")), 4).alias("cos_sim"),
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", "cos_sim", "rank")
    )


def pairwise_cosine_dedup(emb: DataFrame, threshold: float = 0.95) -> DataFrame:
    """Embedding-cosine near-dup pairs (brute force baseline)."""
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(cosine(F.col("va"), F.col("vb")), 4).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def ivf_ann_topk(emb: DataFrame, probes: DataFrame, k: int = 10,
                 n_centroids: int = 16, nprobe: int = 4) -> DataFrame:
    """IVF-style ANN: partition the corpus into centroid cells (inverted
    lists), search only the ``nprobe`` cells nearest each probe.

    The coarse quantizer here is deterministic — the first
    ``n_centroids`` corpus vectors (by vec_id) serve as centroids, the
    stand-in for an offline k-means fit (the model is tiny either way:
    centroids always broadcast). Exactly-SQL-expressible, so unlike the
    hyperplane LSH path this variant IS oracle-gated.

    Scale shape — the corpus is never shuffled:
    1. centroids → ONE collected row (array of structs), broadcast;
       each corpus vector folds over the array to find its argmax-cosine
       cell: a narrow map stage.
    2. probe×centroid ranking is |probes|×n_centroids rows — trivial.
    3. cell membership join is broadcast-hash (probe cells are a list of
       (cell, probe) pairs), filtering the corpus scan to candidate
       rows before any cosine against probe vectors is computed.
    4. the final per-probe top-k window sees only candidate rows.
    On a real deployment the corpus side would be written bucketed by
    ``cell`` so step 3 also prunes files (partition pruning), making the
    scan itself sublinear."""
    cents = emb.filter(F.col("vec_id") < n_centroids).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cent_vec")
    )
    # One row holding all centroids, sorted by cent_id so the argmax
    # fold's strict-> keeps the lowest cent_id on exact ties.
    cent_row = cents.agg(
        F.array_sort(F.collect_list(F.struct("cent_id", "cent_vec"))).alias("_cents")
    )

    def argmax_cell(vec: F.Column) -> F.Column:
        # Score every cell once, then array_max over (cos, -cent_id)
        # structs: lexicographic struct ordering gives highest cosine,
        # ties broken toward the LOWEST cent_id (negation) — the same
        # rule the oracle's ROW_NUMBER(ORDER BY cos DESC, id ASC) uses.
        scored_cells = F.transform(
            F.col("_cents"),
            lambda c: F.struct(
                cosine(vec, c["cent_vec"]).alias("cos"),
                (-c["cent_id"]).alias("negid"),
            ),
        )
        return -F.array_max(scored_cells)["negid"]

    assigned = emb.join(F.broadcast(cent_row)).select(
        "vec_id", "embedding", argmax_cell(F.col("embedding")).alias("cell")
    )

    # nprobe nearest cells per probe: |probes| × n_centroids rows.
    pc = probes.join(F.broadcast(cents)).select(
        "probe_id",
        "probe_vec",
        "cent_id",
        F.round(cosine(F.col("probe_vec"), F.col("cent_vec")), 4).alias("c_cos"),
    )
    wp = Window.partitionBy("probe_id").orderBy(F.desc("c_cos"), F.asc("cent_id"))
    probe_cells = (
        pc.withColumn("cr", F.row_number().over(wp))
        .filter(F.col("cr") <= nprobe)
        .select("probe_id", "probe_vec", F.col("cent_id").alias("cell"))
    )

    scored = assigned.join(F.broadcast(probe_cells), "cell").select(
        "probe_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(cosine(F.col("embedding"), F.col("probe_vec")), 4).alias("cos_sim"),
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", "cos_sim", "rank")
    )
