"""Data SELECTION operators for the LLM-pipeline surface (SURVEY
§2.12 — *[extension]*, no reference file:line; designed Spark-native):
DSIR-style importance resampling — pick raw-corpus documents whose
hashed n-gram distribution resembles a TARGET domain sample (Xie et
al. 2023, "Data Selection for Language Models via Importance
Resampling" — the public method; this is an independent DataFrame
re-expression of its hashed-n-gram estimator).

Shape: everything is built-in Catalyst expressions over one corpus
pass — gram explode → 60-bit portable hash → ``% n_buckets`` — with
two bounded aggregations (the B-bucket target/raw distributions), a
broadcast B-row log-ratio table, and an ordered per-document fold.
No UDFs, no corpus shuffle beyond the (doc, bucket) count agg
(map-side combinable). Cross-engine parity follows the repo rules:
the hash is the md5-based portable_hash64 DuckDB re-derives, the
log-ratios are rounded to 6 dp before any multiplication (the PQ
rounded-means precedent), and the per-doc sum folds in bucket order
on both engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import normalize_text, portable_hash64, word_ngrams

DSIR_BUCKETS = 256


def _bucketed_grams(docs: DataFrame, is_target: Column,
                    n_buckets: int = DSIR_BUCKETS) -> DataFrame:
    """One row per word-bigram occurrence → (doc_id, _t, bk): grams
    from the normalized text (word_ngrams' contract: shorter-than-2
    docs contribute the whole doc as one gram), bucketed by the
    portable 60-bit hash mod ``n_buckets``. The single corpus-pass
    primitive both the distribution fit and the per-doc scoring
    read."""
    return docs.select(
        "doc_id", is_target.alias("_t"),
        F.explode(word_ngrams(normalize_text("text"), 2)).alias("g"),
    ).select(
        "doc_id", "_t",
        (portable_hash64("g") % F.lit(n_buckets)).alias("bk"),
    )


def dsir_logratio(counted: DataFrame,
                  n_buckets: int = DSIR_BUCKETS,
                  round_dp: int = 6) -> DataFrame:
    """The fitted DSIR importance model → (bk, lv): per hash bucket
    the add-one-smoothed log-probability ratio between the target
    sample and the raw pool,

        lv[b] = round( ln((t_b+1)/(T+B)) - ln((q_b+1)/(Q+B)), 6 )

    computed from ONE B-bounded aggregation over pre-counted
    (_t, bk, c) rows (the shared one-gram-pass count relation —
    see dsir_importance_weights). Buckets no gram maps to are
    omitted — nothing can reference them (a document's buckets are
    by construction present in the fit). The table is B rows
    (broadcast state); at 100 TB this fit is one map-side-combinable
    corpus aggregation, and a production pipeline materializes it as
    versioned model state exactly like the IVF centroids / PQ
    codebooks."""
    dist = counted.groupBy("bk").agg(
        F.sum(F.when(F.col("_t"), F.col("c")).otherwise(0)).alias("tc"),
        F.sum(F.when(F.col("_t"), 0).otherwise(F.col("c"))).alias("qc"),
    )
    tot = dist.agg(F.sum("tc").alias("tt"), F.sum("qc").alias("qt"))
    b = F.lit(float(n_buckets))
    return dist.join(F.broadcast(tot)).select(
        "bk",
        F.round(
            F.log((F.col("tc") + 1) / (F.col("tt") + b))
            - F.log((F.col("qc") + 1) / (F.col("qt") + b)),
            round_dp,
        ).alias("lv"),
    )


def dsir_importance_weights(docs: DataFrame, is_target: Column,
                            n_buckets: int = DSIR_BUCKETS) -> DataFrame:
    """Per-document DSIR importance weight for every NON-target
    document → (doc_id, weight_e6): Σ_b count_doc[b] · lv[b], the
    hashed-bigram log-likelihood ratio between the target and raw
    distributions — high weight means "looks like the target
    domain". The per-doc sum folds over buckets IN BUCKET ORDER
    (array_sort + F.aggregate — the repo's ordered-double-fold rule,
    mirrored by the oracle's list_sum over a bucket-ordered list).
    The OUTPUT is fixed-point integer micro-units (round(sum·1e6) as
    BIGINT), not a rounded double: the contributions are 6-dp
    quantized, so per-doc sums sit ~1e-9 from exact micro-unit
    integers — a 4-dp ROUND would land exactly ON half boundaries
    and the two engines' rounding algorithms genuinely disagree
    there (observed at sf0.001), while nearest-integer of a
    near-integer double is engine-independent. Scale: the scoring
    side is one (doc, bucket) count aggregation + a broadcast join
    against the B-row model — linear, shuffle only on the count
    agg's keys."""
    # ONE gram pass: the expensive stage (explode + md5 per gram
    # occurrence) aggregates to the doc×bucket-bounded count relation,
    # localCheckpointed once (the BPE-vocab precedent) because BOTH
    # the distribution fit and the scoring side derive from it —
    # without the checkpoint each branch of the fit-join re-runs the
    # gram pass (no cross-branch CSE in Catalyst), which measured
    # 2 gram passes -> this form's 1 at sf0.1. In production this
    # frame (or the B-row model itself) is materialized versioned
    # state, so per-run cost is the scoring side only.
    db_all = dsir_bucket_counts(docs, is_target, n_buckets).localCheckpoint()
    return dsir_weights_from_state(db_all, dsir_logratio(db_all, n_buckets))


def dsir_gumbel_keys(weights: DataFrame, seed: str = "dsir-r12",
                     round_dp: int = 6) -> DataFrame:
    """Seeded Gumbel sampling keys over the importance weights →
    (doc_id, weight_e6, key_e6): the Gumbel-top-k trick makes
    weighted sampling WITHOUT replacement a deterministic sort —
    key_i = log w_i + Gumbel_i, and the top-k keys are an exact
    sample with inclusion probability ∝ w_i (Efraimidis–Spirakis via
    Gumbel, public folklore). The noise is hash-seeded, not wall
    clock: u_i = (portable_hash64(seed || doc_id) % 2^20 + 0.5) /
    2^20 (never 0 or 1 by the +0.5), g_i = -ln(-ln(u_i)) — so
    resampling is reproducible across engines and runs, the same
    determinism-over-randomness stance as every sampler here (swap
    the seed string to draw a fresh sample). Parity: both log-ratio
    weight and Gumbel noise live in fixed-point micro-units
    (round(g·1e6) — nearest-integer of a transcendental, the lv
    precedent), so the sampling key is an exact INTEGER sum and the
    rank order cannot straddle an engine rounding seam."""
    u = (
        (portable_hash64(
            F.concat(F.lit(seed + "|"),
                     F.col("doc_id").cast("string"))
        ) % F.lit(1 << 20)) + F.lit(0.5)
    ) / F.lit(float(1 << 20))
    g_e6 = F.round(-F.log(-F.log(u)) * F.lit(1000000.0)).cast("long")
    return weights.select(
        "doc_id", "weight_e6",
        (F.col("weight_e6") + g_e6).alias("key_e6"),
    )


def dsir_weights_from_state(counted: DataFrame,
                            lr: DataFrame) -> DataFrame:
    """The SCORING tail over stored DSIR state → (doc_id, weight_e6):
    pool rows of the (doc_id, _t, bk, c) count relation joined
    against the broadcast B-row log-ratio model, folded bucket-
    ordered, emitted fixed-point (the contract dsir_importance_weights
    documents). Split out (round 12) so the layout-fed default route
    and the in-plan pipeline share one scoring definition."""
    db = counted.filter(~F.col("_t")).select("doc_id", "bk", "c")
    contrib = db.join(F.broadcast(lr), "bk").select(
        "doc_id", "bk", (F.col("c") * F.col("lv")).alias("cv")
    )
    return (
        contrib.groupBy("doc_id")
        .agg(F.array_sort(F.collect_list(F.struct("bk", "cv"))).alias("a"))
        .select(
            "doc_id",
            F.round(
                F.aggregate(
                    "a", F.lit(0.0),
                    lambda acc, x: acc + x["cv"],
                ) * F.lit(1000000.0)
            ).cast("long").alias("weight_e6"),
        )
    )


def dsir_bucket_counts(docs: DataFrame, is_target: Column,
                       n_buckets: int = DSIR_BUCKETS) -> DataFrame:
    """The (doc_id, _t, bk, c) count relation — the ONE-gram-pass
    aggregate both the fit and the scoring derive from; what
    operators/silver.dsir_count_layout materializes as stored
    state."""
    return (
        _bucketed_grams(docs, is_target, n_buckets)
        .groupBy("doc_id", "_t", "bk")
        .agg(F.count(F.lit(1)).alias("c"))
    )
