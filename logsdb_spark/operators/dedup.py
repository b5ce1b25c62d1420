"""Deduplication operators — *[extension]* (SURVEY §2.12), designed for
100 TB corpora.

Four tiers, all pure built-in expressions (no Python UDFs):

1. exact          — md5-fingerprint groupBy (one shuffle on the hash)
2. minhash + LSH  — char-shingle MinHash signatures, banded LSH
                    bucketing, candidate self-join, exact-jaccard verify
3. simhash        — 64-bit SimHash, chunk-blocked candidate pairs,
                    hamming verify via bit_count(xor)
4. n-gram jaccard — brute-force pairwise (small-N oracle baseline only)

Scale analysis (MinHash path): signatures are O(docs × perms) — narrow.
The only shuffle is on (band_idx, band_hash); bucket sizes are bounded
by true duplicate-group sizes plus hash-collision noise, so no
quadratic blowup on non-duplicate data. Exact verify touches only
candidate pairs. This is the standard web-scale dedup shape
(cf. Broder's shingling / MMDS ch. 3 — public literature).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import fingerprint, normalize_text, word_ngrams

# LSH config: 32 permutations in 16 bands of 2 rows.
# P(candidate | jaccard=s) = 1-(1-s^2)^16:  s=0.6 → 0.9992, s=0.99 → ≈1
# → full recall at the 0.6 verify threshold on any corpus whose
# near-threshold mass is small; false candidates are removed by the
# exact-jaccard verify step. (64/32 gave identical output on this
# corpus at ~2× the aggregate-codegen cost.)
#
# Shingles are WORD BIGRAMS: char n-grams over a small vocabulary give
# every document pair high background similarity (measured ~0.3-0.45
# median on the driver corpus), which turns LSH into brute force;
# word bigrams measure ~0 background vs ~0.99 for true near-dups.
N_PERM = 32
N_BANDS = 16
ROWS_PER_BAND = N_PERM // N_BANDS
SHINGLE_WORDS = 2


def exact_dedup_groups(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact dedup: group by normalized-text fingerprint; keep min id.
    One hash-partitioned shuffle on a 32-char key; at 100 TB, combine
    map-side (partial agg) so the shuffle carries one row per distinct
    fingerprint per mapper."""
    return docs.groupBy(fingerprint(text_col).alias("fp")).agg(
        F.min("doc_id").alias("keep_id"),
        F.count(F.lit(1)).alias("copies"),
    )


def shingle_sets(docs: DataFrame, text_col: str = "text",
                 n: int = SHINGLE_WORDS) -> DataFrame:
    """doc_id → distinct word-n-gram shingle set of normalized text."""
    return docs.select(
        "doc_id",
        F.array_distinct(word_ngrams(normalize_text(text_col), n)).alias("shingles"),
    )


# Universal-hash permutation constants: p-th minhash = min over
# shingles of (a_p * h31 + b_p), with h31 a 31-bit base hash and
# a_p/b_p 31-bit odd constants — products stay < 2^62, so the
# arithmetic is overflow-free under Spark's ANSI mode (default-on in
# Spark 4). 31-bit space is ample for near-dup banding; the exact
# jaccard verify removes any collision noise.
_M31 = (1 << 31) - 1


def _perm_consts(p: int) -> tuple[int, int]:
    a = ((2 * p + 1) * 0x9E3779B9) & _M31 | 1
    b = (p * 0xD1B54A33) & _M31
    return a, b


def minhash_signatures(shingled: DataFrame, n_perm: int = N_PERM) -> DataFrame:
    """MinHash signature per doc as ONE hash per shingle + n_perm
    min-aggregations in a single groupBy pass.

    Scale shape: explode → project h → partial (map-side) min per
    doc_id → final min. The shuffle carries one 64-min row per doc per
    mapper; no quadratic structure, no giant codegen expression."""
    ex = shingled.select("doc_id", F.explode("shingles").alias("sh"))
    h31 = F.xxhash64("sh").bitwiseAND(F.lit(_M31))
    aggs = []
    for p in range(n_perm):
        a, b = _perm_consts(p)
        # pmod is essential: without the reduction a*h+b is monotonic
        # in h and every "permutation" would share one argmin shingle.
        aggs.append(
            F.min(F.pmod(h31 * F.lit(a) + F.lit(b), F.lit(1 << 31))).alias(f"m{p}")
        )
    out = ex.groupBy("doc_id").agg(*aggs)
    return out.select(
        "doc_id", F.array(*[f"m{p}" for p in range(n_perm)]).alias("sig")
    )


def lsh_candidate_pairs(signed: DataFrame, n_bands: int = N_BANDS,
                        rows_per_band: int = ROWS_PER_BAND) -> DataFrame:
    """Band the signature, hash each band, self-join on
    (band_idx, band_hash) → distinct candidate id pairs (a < b)."""
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_idx"),
                F.xxhash64(F.slice("sig", b * rows_per_band + 1, rows_per_band)).alias(
                    "band_hash"
                ),
            )
            for b in range(n_bands)
        ]
    )
    exploded = signed.select("doc_id", F.explode(bands).alias("b")).select(
        "doc_id", "b.band_idx", "b.band_hash"
    )
    left = exploded.alias("l")
    right = exploded.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band_idx") == F.col("r.band_idx"))
            & (F.col("l.band_hash") == F.col("r.band_hash"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(F.col("l.doc_id").alias("id_a"), F.col("r.doc_id").alias("id_b"))
        .distinct()
    )


def jaccard(a: F.Column, b: F.Column) -> F.Column:
    inter = F.size(F.array_intersect(a, b))
    return inter / (F.size(a) + F.size(b) - inter)


def verify_pairs(candidates: DataFrame, shingled: DataFrame,
                 threshold: float) -> DataFrame:
    """Exact-jaccard verification of candidate pairs. Joins the (narrow)
    candidate list back to shingle sets twice; at scale both joins
    shuffle on doc_id which is the natural partitioning of ``shingled``."""
    sa = shingled.select(F.col("doc_id").alias("id_a"), F.col("shingles").alias("sh_a"))
    sb = shingled.select(F.col("doc_id").alias("id_b"), F.col("shingles").alias("sh_b"))
    return (
        candidates.join(sa, "id_a")
        .join(sb, "id_b")
        .select("id_a", "id_b", F.round(jaccard(F.col("sh_a"), F.col("sh_b")), 4).alias("jac"))
        .filter(F.col("jac") >= threshold)
    )


def minhash_near_dups(docs: DataFrame, text_col: str = "text",
                      threshold: float = 0.6) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline → verified (id_a, id_b, jac)."""
    shingled = shingle_sets(docs, text_col)
    cands = lsh_candidate_pairs(minhash_signatures(shingled))
    return verify_pairs(cands, shingled, threshold)


def brute_force_near_dups(docs: DataFrame, text_col: str = "text",
                          threshold: float = 0.6) -> DataFrame:
    """O(n²) baseline (oracle/verification only — NOT the scale path)."""
    shingled = shingle_sets(docs, text_col)
    sa = shingled.select(F.col("doc_id").alias("id_a"), F.col("shingles").alias("sh_a"))
    sb = shingled.select(F.col("doc_id").alias("id_b"), F.col("shingles").alias("sh_b"))
    return (
        sa.join(sb, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.round(jaccard(F.col("sh_a"), F.col("sh_b")), 4).alias("jac"))
        .filter(F.col("jac") >= threshold)
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash64(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """64-bit SimHash over word-token hashes: bit j of the fingerprint is
    the sign of sum over tokens of (2*bit_j(xxhash64(tok)) - 1).
    Expressed as one aggregate per bit over the token-hash array —
    all JVM expressions, no explode."""
    toks = F.split(normalize_text(text_col), " ")
    hashes = F.transform(toks, lambda t: F.xxhash64(t))
    return docs.select("doc_id", _simhash_expr(hashes).alias("simhash"))


def _bit_vote(hashes: F.Column, j: int) -> F.Column:
    """Sum over token hashes of ±1 by bit j (j is a Python int —
    Spark's shift functions take literal shift amounts)."""
    return F.aggregate(
        hashes,
        F.lit(0).cast("long"),
        lambda acc, h: acc
        + (F.shiftrightunsigned(h, j).bitwiseAND(F.lit(1)).cast("long") * 2 - 1),
    )


def _simhash_expr(hashes: F.Column) -> F.Column:
    """Pack the 64 bit votes into one signed long. shiftleft handles
    j=63 (1<<63 overflows a Python-literal long)."""
    sig = F.lit(0).cast("long")
    for j in range(64):
        bit = F.when(
            _bit_vote(hashes, j) > 0, F.shiftleft(F.lit(1).cast("long"), j)
        ).otherwise(F.lit(0).cast("long"))
        sig = sig.bitwiseXOR(bit)
    return sig


def simhash_near_dups(docs: DataFrame, text_col: str = "text",
                      max_hamming: int = 3) -> DataFrame:
    """SimHash near-dup: block on any shared 16-bit chunk (pigeonhole:
    hamming ≤ 3 ⇒ at least one of 4 chunks identical), verify with
    bit_count(xor) ≤ max_hamming."""
    sh = simhash64(docs, text_col).select("doc_id", "simhash")
    chunks = F.array(
        *[
            F.struct(
                F.lit(c).alias("chunk_idx"),
                F.shiftrightunsigned("simhash", c * 16)
                .bitwiseAND(F.lit(0xFFFF))
                .alias("chunk_val"),
            )
            for c in range(4)
        ]
    )
    ex = sh.select("doc_id", "simhash", F.explode(chunks).alias("c")).select(
        "doc_id", "simhash", "c.chunk_idx", "c.chunk_val"
    )
    l, r = ex.alias("l"), ex.alias("r")
    return (
        l.join(
            r,
            (F.col("l.chunk_idx") == F.col("r.chunk_idx"))
            & (F.col("l.chunk_val") == F.col("r.chunk_val"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("id_a"),
            F.col("r.doc_id").alias("id_b"),
            F.bit_count(F.col("l.simhash").bitwiseXOR(F.col("r.simhash"))).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
