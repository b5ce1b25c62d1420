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
