"""Deduplication operators — *[extension]* (SURVEY §2.12), designed for
100 TB corpora.

Four tiers, all pure built-in expressions (no Python UDFs):

1. exact          — md5-fingerprint groupBy (one shuffle on the hash)
2. minhash + LSH  — char-shingle MinHash signatures, banded LSH
                    bucketing, candidate self-join, exact-jaccard verify
3. simhash        — 64-bit SimHash, chunk-blocked candidate pairs,
                    hamming verify via bit_count(xor)
4. n-gram jaccard — brute-force pairwise (small-N oracle baseline only)

Scale analysis (MinHash path): signatures are O(docs × perms), computed
shuffle-free inside the scan stage (array_min over transform). The only
shuffle is the (band_idx, band_hash) bucket groupBy; pairs are emitted
inside buckets (no self-join, upstream computed once). Bucket sizes are
bounded by true duplicate-group sizes plus hash-collision noise, so no
quadratic blowup on non-duplicate data. Exact verify touches only
candidate pairs. This is the standard web-scale dedup shape
(cf. Broder's shingling / MMDS ch. 3 — public literature).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from ..functions.text import fingerprint, normalize_text, word_ngrams

# LSH config: 64 permutations in 16 bands of 4 rows.
# P(candidate | jaccard=j) = 1-(1-j^4)^16. The knee sits between the
# corpus's background (word-bigram j ≈ 0.03 → P ≈ 1.3e-5) and its
# true-dup floor (measured min verified jac: 0.82 at sf0.1, 0.91 at
# sf0.01 → P(miss) ≤ 0.552^16 ≈ 7e-5 per pair; outputs verified
# identical to the O(n²) ground truth at both SFs). The earlier
# 16-bands-of-2 config had the knee at 16·j², which admitted ~715
# collision-noise candidates per true pair (183k pairs at sf0.1) —
# the est/verify joins then dominated the pipeline; bands of 4 cut
# candidates ~200× for one extra array_min pass per 2 perms.
#
# Shingles are WORD BIGRAMS: char n-grams over a small vocabulary give
# every document pair high background similarity (measured ~0.3-0.45
# median on the driver corpus), which turns LSH into brute force;
# word bigrams measure ~0 background vs ~0.99 for true near-dups.
N_PERM = 64
N_BANDS = 16
ROWS_PER_BAND = N_PERM // N_BANDS
SHINGLE_WORDS = 2

# Default per-bucket candidate cap for every ROUTED LSH/blocking dedup
# (round-7: previously the guard existed but no route set it, so one
# boilerplate-heavy band value on a pathological corpus would emit
# k²/2 pairs in one collect_list row). Semantics are STAR-EDGES, not
# drop — see lsh_candidate_pairs. 512 is ~15x the largest bucket
# measured on the driver corpora (word 34 @ sf0.1, char 26 @ sf0.01,
# simhash chunk 17 @ sf0.01 — tests/test_dedup_similarity.py pins the
# margin), so the cap provably does NOT bind on the oracle-gated
# corpora: the capped routes stay hash-identical to their brute-force
# SQL oracles, which cannot reproduce the banding itself (DuckDB has
# no xxhash64). On a corpus where it DOES bind, the worst bucket
# costs k-1 star edges instead of k²/2 pairs.
DEFAULT_MAX_BUCKET = 512


def _persist_released_on_gc(df: DataFrame) -> DataFrame:
    """persist() with an EXPLICIT lifecycle (round 14, guide §5 — the
    r13 verdict's unpersist-discipline item): the cache entry is
    released when the Python DataFrame is garbage-collected, i.e. as
    soon as the query that built it drops its frames after the action.
    Spark's CacheManager otherwise retains every persisted plan until
    an explicit unpersist — across a long-lived session running many
    query invocations those intra-query caches accumulate without
    bound (each invocation builds fresh frames, so a stale entry can
    never be re-hit; it is pure leak). The finalizer captures only the
    py4j DataFrame handle (not the Python wrapper, which must stay
    collectable) and unpersists non-blocking; a dead session/JVM makes
    it a no-op."""
    import weakref

    df.persist()
    jdf = df._jdf

    def _release(j=jdf):
        try:
            j.unpersist(False)
        except Exception:
            pass  # session/JVM already gone — nothing left to leak

    weakref.finalize(df, _release)
    return df


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


def minhash_signatures(shingled: DataFrame, n_perm: int = N_PERM,
                       keep_shingles: bool = False,
                       engine: str = "arrow") -> DataFrame:
    """MinHash signature per doc with ZERO shuffle: hash each shingle
    once (projected column → computed once, reused by all perms), then
    one ``array_min(transform(...))`` per permutation — the whole
    signature materializes inside the scan stage. At 100 TB this is the
    difference between a narrow map stage and shuffling one exploded
    row per (doc, shingle).

    The permutation constants are DATA (a literal array of structs),
    not 32 unrolled expression subtrees: one nested transform keeps the
    Catalyst tree O(1) in n_perm — planning + Janino compile time was
    the dominant cost of the unrolled form at bench scale.

    ``engine`` picks where the permute-and-min runs; values are
    INTEGER-IDENTICAL either way (parity-pinned), the choice is pure
    physics, re-measured in round 14 after the kernel moved from
    mapInPandas to mapInArrow (no pandas materialization, no per-row
    Python objects — functions/minhash_fast.py):
    - "arrow" (default since round 14): the numpy kernel. The round-10
      rejection of the kernel for corpus scans (100x probe: 10.3 s JVM
      vs 13.6 s then-mapInPandas) was the pandas boundary, not the
      math — the mapInArrow form wins the r14 100x signature probe
      7.5x (20.2 s vs 152.7 s JVM, scripts/mh_100x_probe_r14.py) and
      ties the full sf0.1 pipeline (2.53 vs 2.58 s,
      scripts/mh_engine_ab_r13.py re-run, 256-row parity), and was
      already the streaming/incremental default (a 5,000-row probe
      batch: ~4 s kernel vs 38 s serial fold).
    - "jvm": the interpreted HOF fold — kept reachable for A/B and for
      Python-worker-free deployments."""
    hashed = shingled.select(
        "doc_id",
        "shingles",
        F.transform(
            "shingles", lambda s: F.xxhash64(s).bitwiseAND(F.lit(_M31))
        ).alias("h31"),
    )
    if engine == "arrow":
        from ..functions.minhash_fast import minhash_sigs_fast

        consts = [_perm_consts(p) for p in range(n_perm)]
        if not keep_shingles:
            hashed = hashed.select("doc_id", "h31")
        return minhash_sigs_fast(
            hashed, [a for a, _ in consts], [b for _, b in consts],
            keep_shingles,
        )
    consts = F.array(
        *[
            F.struct(F.lit(a).alias("a"), F.lit(b).alias("b"))
            for a, b in (_perm_consts(p) for p in range(n_perm))
        ]
    )
    # The 2^31 reduction is essential: without it a*h+b is monotonic in
    # h and every "permutation" would share one argmin shingle. It is
    # a bitwiseAND, not pmod: for the non-negative products here
    # x & (2^31-1) == pmod(x, 2^31) exactly, and the AND skips pmod's
    # division + sign-fix in the interpreted hot loop (docs × perms ×
    # shingles evaluations).
    sig = F.transform(
        consts,
        lambda c: F.array_min(
            F.transform(
                F.col("h31"),
                lambda h: (h * c["a"] + c["b"]).bitwiseAND(F.lit(_M31)),
            )
        ),
    )
    if keep_shingles:
        # one-pass (doc_id, shingles, sig) — the stored-index shape
        # (operators/silver.minhash_index_layout)
        return hashed.select("doc_id", "shingles", sig.alias("sig"))
    return hashed.select("doc_id", sig.alias("sig"))


def lsh_candidate_pairs(signed: DataFrame, n_bands: int = N_BANDS,
                        rows_per_band: int = ROWS_PER_BAND,
                        max_bucket: int | None = None) -> DataFrame:
    """Band the signature, hash each band, group docs by
    (band_idx, band_hash) bucket, emit all intra-bucket pairs (a < b).

    Bucket-grouped generation beats the naive self-join two ways at
    scale: (1) the signature pipeline is computed ONCE, not once per
    join side; (2) the single shuffle key is the band hash — the same
    key the join would shuffle on — but the join's probe-side build
    disappears. Skew bound: a bucket of k docs emits k²/2 pairs in one
    row; true dup-group sizes bound k (collision noise is ~uniform), so
    no quadratic blowup on non-duplicate corpora. A defensive cap/salt
    per bucket is the standard guard if a pathological corpus shows up.

    Deliberately emits ONLY id pairs: an earlier form carried the
    signatures into the buckets and computed the jaccard estimate in a
    nested transform — correct, but the deep HOF tree cost ~2.5s more
    in Janino compile per cold session than joining the (narrow)
    signature table back afterwards (see estimate_jaccard).

    ``max_bucket`` is the defensive guard for pathological corpora
    (boilerplate-heavy crawls where one band value captures a huge
    fraction of documents): a bucket of k > max_bucket docs emits
    STAR edges — (min_id, other) for each other member, k-1 pairs —
    instead of all k²/2 pairs. Why star and not drop: an oversized
    bucket is either collision/boilerplate noise (star edges then
    fail the exact verify — k-1 cheap rejections instead of k²/2)
    or a genuinely huge duplicate group (star edges all VERIFY, so
    the downstream connected-components/keep decision sees ONE
    component exactly as the full clique would — pair-level output
    is sparser, group-level dedup is unchanged). Candidate volume is
    thus ≤ max(k-1, max_bucket²/2) per bucket, linear in corpus for
    fixed cap. Leave None for exact all-pairs behavior (the oracle
    baselines); routed queries default to DEFAULT_MAX_BUCKET, which
    is sized to never bind on the gated corpora (see its comment)."""
    # Bands generated by one transform over a sequence (tree O(1) in
    # n_bands — same planning-cost rationale as minhash_signatures).
    bands = F.transform(
        F.sequence(F.lit(0), F.lit(n_bands - 1)),
        lambda b: F.struct(
            b.alias("band_idx"),
            F.xxhash64(
                F.slice(F.col("sig"), b * rows_per_band + 1, F.lit(rows_per_band))
            ).alias("band_hash"),
        ),
    )
    exploded = signed.select("doc_id", F.explode(bands).alias("b")).select(
        "doc_id", "b.band_idx", "b.band_hash"
    )
    buckets = (
        exploded.groupBy("band_idx", "band_hash")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    all_pairs = F.flatten(
        F.transform(
            F.col("ids"),
            lambda x, i: F.transform(
                F.slice(F.col("ids"), i + F.lit(2), F.size(F.col("ids"))),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )
    if max_bucket is not None:
        # star edges for oversized buckets: (min_id, other) × (k-1)
        star = F.transform(
            F.slice(F.col("ids"), 2, F.size(F.col("ids"))),
            lambda y: F.struct(
                F.col("ids")[0].alias("id_a"), y.alias("id_b")
            ),
        )
        pairs = F.when(F.size("ids") <= max_bucket, all_pairs).otherwise(star)
    else:
        pairs = all_pairs
    return (
        buckets.select(F.explode(pairs).alias("p"))
        .select("p.id_a", "p.id_b")
        .distinct()
    )


def estimate_jaccard(candidates: DataFrame, signed: DataFrame,
                     n_perm: int = N_PERM) -> DataFrame:
    """Attach ``est_jac`` (signature-agreement fraction — the unbiased
    MinHash jaccard estimate) to candidate pairs by joining the narrow
    signature table twice. Lets callers discard the (measured ~700:1 on
    the driver corpus) hash-collision noise BEFORE the expensive
    exact-verify join — signatures are n_perm ints per doc vs a full
    shingle set."""
    sa = signed.select(F.col("doc_id").alias("id_a"), F.col("sig").alias("sig_a"))
    sb = signed.select(F.col("doc_id").alias("id_b"), F.col("sig").alias("sig_b"))
    est = (
        F.size(
            F.filter(F.zip_with("sig_a", "sig_b", lambda u, v: u == v), lambda e: e)
        )
        / F.lit(n_perm)
    )
    return (
        candidates.join(sa, "id_a")
        .join(sb, "id_b")
        .select("id_a", "id_b", est.alias("est_jac"))
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
        candidates.select("id_a", "id_b")
        .join(sa, "id_a")
        .join(sb, "id_b")
        .select("id_a", "id_b", F.round(jaccard(F.col("sh_a"), F.col("sh_b")), 4).alias("jac"))
        .filter(F.col("jac") >= threshold)
    )


def minhash_near_dups(docs: DataFrame, text_col: str = "text",
                      threshold: float = 0.6,
                      max_bucket: int | None = DEFAULT_MAX_BUCKET) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline → verified (id_a, id_b, jac).

    The shingle sets feed both signature generation and the exact
    verify; persist() (MEMORY_AND_DISK) stops Spark recomputing the
    normalize→tokenize→ngram chain three times. At 100 TB this persist
    spills to local disk per executor — still strictly cheaper than
    re-scanning the corpus.

    The est_jac prefilter (threshold − 0.2 on the 32-perm signature
    estimate) removes hash-collision candidates before the exact join:
    for a true pair at jaccard ≥ threshold the miss probability is
    P(Binom(32, t) < 32·(t−0.2)) ≈ 1e-8 at t=0.8; noise pairs at
    jaccard ≤ 0.2 pass with P ≈ 1e-6 — and any that do pass are then
    removed by the exact verify, so the prefilter only ever affects
    recall through that 1e-8 tail.

    ``max_bucket`` defaults to DEFAULT_MAX_BUCKET (round 7): the
    routed near-dup queries are protected against a pathological
    boilerplate band value out of the box; the cap is sized to never
    bind on the gated corpora so the brute-force oracle parity is
    unchanged there (margin pinned in tests)."""
    shingled = _persist_released_on_gc(shingle_sets(docs, text_col))
    signed = _persist_released_on_gc(minhash_signatures(shingled))
    cands = estimate_jaccard(
        lsh_candidate_pairs(signed, max_bucket=max_bucket), signed
    ).filter(F.col("est_jac") >= threshold - 0.2)
    return verify_pairs(cands, shingled, threshold)


def minhash_near_dups_prepared(index: DataFrame, threshold: float = 0.6,
                               max_bucket: int | None = DEFAULT_MAX_BUCKET,
                               n_perm: int = N_PERM,
                               n_bands: int = N_BANDS,
                               rows_per_band: int = ROWS_PER_BAND) -> DataFrame:
    """The MinHash near-dup pipeline DOWNSTREAM of signature
    computation: ``index`` is (doc_id, shingles, sig) — either built
    in-plan (minhash_near_dups) or read from the MATERIALIZED
    signature index layout (operators/silver.minhash_index_layout),
    which is what a production corpus stores columnar next to the
    documents. Banding, bucket-grouped candidate emit, est-jaccard
    prefilter, and the exact verify are identical either way, so the
    two routes are value-identical and share one oracle."""
    signed = index.select("doc_id", "sig")
    shingled = index.select("doc_id", "shingles")
    cands = estimate_jaccard(
        lsh_candidate_pairs(signed, n_bands=n_bands,
                            rows_per_band=rows_per_band,
                            max_bucket=max_bucket),
        signed,
        n_perm=n_perm,
    ).filter(F.col("est_jac") >= threshold - 0.2)
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


def minhash_near_dups_incremental(corpus: DataFrame, new_docs: DataFrame,
                                  text_col: str = "text",
                                  threshold: float = 0.6) -> DataFrame:
    """Incremental-ingest dedup: near-dup pairs (corpus_id, new_id)
    between the EXISTING corpus and a NEW batch only — the shape every
    production ingest runs, where re-pairing the corpus against itself
    per shard would be quadratic in shards.

    Asymmetry is the scale lever: the corpus side computes signatures
    and (band, hash) keys in its scan stage exactly as the batch path
    does, but the new-batch side is shard-sized → its banded keys
    BROADCAST, so candidate generation is a map-side hash probe on the
    corpus stream — no corpus shuffle at all (vs one bucket shuffle
    for the full self-dedup). Exact-jaccard verify joins only the
    candidate ids back to both shingle sets. In steady state the
    corpus side's signatures would be precomputed and stored columnar
    alongside the documents, making this a pure scan+probe."""
    c_sh = shingle_sets(corpus, text_col)
    n_sh = _persist_released_on_gc(shingle_sets(new_docs, text_col))
    # two separate corpus branches on purpose: carrying the (large)
    # signature expression tree into the shingle-verify branch as one
    # combined frame measurably deepens the optimized expression tree
    # (a combined-frame variant overflowed the driver stack at plan
    # time) — the stored-index path avoids this for free because its
    # sig/shingles are plain parquet columns
    return _minhash_cross_verify(
        minhash_signatures(c_sh, engine="arrow"), c_sh,
        minhash_signatures(n_sh, engine="arrow"), n_sh,
        threshold,
    )


def _banded_keys(signed: DataFrame, id_alias: str) -> DataFrame:
    """(doc_id, band_idx, band_hash) LSH keys from a (doc_id, sig)
    frame — the banding both the from-raw and index-fed incremental
    probes share."""
    bands = F.transform(
        F.sequence(F.lit(0), F.lit(N_BANDS - 1)),
        lambda b: F.struct(
            b.alias("band_idx"),
            F.xxhash64(
                F.slice(F.col("sig"), b * ROWS_PER_BAND + 1,
                        F.lit(ROWS_PER_BAND))
            ).alias("band_hash"),
        ),
    )
    return signed.select(
        F.col("doc_id").alias(id_alias), F.explode(bands).alias("b")
    ).select(id_alias, "b.band_idx", "b.band_hash")


def _minhash_cross_verify(c_sig: DataFrame, c_sh: DataFrame,
                          n_sig: DataFrame, n_sh: DataFrame,
                          threshold: float) -> DataFrame:
    """Shared tail of the incremental MinHash probe: band the two
    sides (batch side broadcasts), exact-jaccard verify the
    candidates. ``c_sig``/``c_sh`` carry the corpus (doc_id, sig) and
    (doc_id, shingles) — separate in-plan branches for the from-raw
    form, the same stored-index frame twice for the prepared form."""
    cands = (
        _banded_keys(c_sig, "corpus_id")
        .join(F.broadcast(_banded_keys(n_sig, "new_id")),
              ["band_idx", "band_hash"])
        .select("corpus_id", "new_id")
        .distinct()
    )
    ca = c_sh.select(F.col("doc_id").alias("corpus_id"),
                     F.col("shingles").alias("sh_a"))
    nb = n_sh.select(F.col("doc_id").alias("new_id"),
                     F.col("shingles").alias("sh_b"))
    return (
        cands.join(ca, "corpus_id")
        .join(F.broadcast(nb), "new_id")
        .select(
            "corpus_id",
            "new_id",
            F.round(jaccard(F.col("sh_a"), F.col("sh_b")), 4).alias("jac"),
        )
        .filter(F.col("jac") >= threshold)
    )


def minhash_cross_pairs_prepared(c_idx: DataFrame, new_docs: DataFrame,
                                 text_col: str = "text",
                                 threshold: float = 0.6) -> DataFrame:
    """minhash_near_dups_incremental DOWNSTREAM of the stored MinHash
    index (round 9 — makes the docstrings' "at steady state the
    corpus signatures are precomputed columnar" real for the
    INCREMENTAL/streaming path too, not just the batch keep queries):
    ``c_idx`` is the (doc_id, shingles, sig) relation read from
    operators/silver.minhash_index_layout. Signatures are
    deterministic functions of the text, so the prepared probe is
    value-identical to the from-raw form (pinned by
    tests/test_streaming.py); per batch the corpus side is a pure
    scan+probe — no shingling, hashing, or signature folds."""
    n_sh = _persist_released_on_gc(shingle_sets(new_docs, text_col))
    n_sig = minhash_signatures(n_sh, engine="arrow")
    return _minhash_cross_verify(c_idx, c_idx, n_sig, n_sh, threshold)


def winnow_cross_pairs_prepared(c_fp: DataFrame, new_docs: DataFrame,
                                text_col: str = "text", k: int = 20,
                                w: int = 8, max_fp_corpus: int = 32,
                                min_shared: int = 2) -> DataFrame:
    """winnow_cross_pairs DOWNSTREAM of the stored fingerprint index:
    ``c_fp`` is the exploded (doc_id, fp) relation read from
    operators/silver.winnow_fp_layout (``k``/``w`` must match the
    layout's — they parameterize only the batch side here).
    Fingerprints are deterministic functions of the text, so the prepared
    probe is value-identical to the from-raw form; the corpus-side
    occupancy cap behaves identically because it counts the same
    (doc_id, fp) rows."""
    from ..functions.text import winnow_fingerprints

    c_rows = c_fp.select(
        F.col("doc_id").alias("corpus_id"), "fp"
    ).distinct()
    n_rows = (
        winnow_fingerprints(new_docs, "doc_id", text_col, k=k, w=w)
        .select(F.col("doc_id").alias("new_id"),
                F.explode_outer("fps").alias("fp"))
        .filter(F.col("fp").isNotNull())
        .distinct()
    )
    ok = (
        c_rows.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") <= max_fp_corpus)
        .select("fp")
    )
    return (
        c_rows.join(ok, "fp")
        .join(F.broadcast(n_rows), "fp")
        .groupBy("corpus_id", "new_id")
        .agg(F.count(F.lit(1)).alias("n_shared_fps"))
        .filter(F.col("n_shared_fps") >= min_shared)
    )


def ensemble_near_dups_prepared(c_mh_idx: DataFrame, c_fp_idx: DataFrame,
                                new_docs: DataFrame,
                                text_col: str = "text",
                                threshold: float = 0.6) -> DataFrame:
    """ensemble_near_dups_incremental DOWNSTREAM of the stored
    indexes — the production steady state of the streaming ensemble
    probe: both corpus evidence sides read materialized columnar
    state (MinHash signature index + winnow fingerprint index), so a
    micro-batch costs two map-side broadcast probes plus the verify
    joins, never the corpus normalize/tokenize/hash chains.
    Value-identical to the from-raw incremental form (parity-pinned
    alongside the streaming == incremental == batch chain)."""
    mh = minhash_cross_pairs_prepared(
        c_mh_idx, new_docs, text_col, threshold
    ).select("corpus_id", "new_id")
    wn = winnow_cross_pairs_prepared(c_fp_idx, new_docs, text_col).select(
        "corpus_id", "new_id"
    )
    return mh.unionByName(wn).distinct()


def winnow_cross_pairs(corpus: DataFrame, new_docs: DataFrame,
                       text_col: str = "text", k: int = 20, w: int = 8,
                       max_fp_corpus: int = 32,
                       min_shared: int = 2) -> DataFrame:
    """Incremental SPAN-dedup evidence: (corpus_id, new_id, n_shared_fps)
    pairs where an arriving document shares >= ``min_shared`` winnowing
    fingerprints with an existing corpus document — the verbatim-run
    counterpart of minhash_near_dups_incremental, and the second signal
    of the streaming ensemble probe (streaming/dedup).

    Same asymmetric scale shape as the MinHash incremental: the corpus
    side computes (doc_id, fp) scan-locally (at steady state the winnow
    index is PRECOMPUTED columnar — fps are content-derived and never
    change); the new-batch side is shard-sized and BROADCASTS, so
    candidates surface as a map-side probe with no corpus shuffle.

    The hub cap (``max_fp_corpus``) counts CORPUS-side occupancy only —
    deliberately, where the batch operator (dedup_substring_winnow)
    caps the combined bucket: the corpus index is the stable reference,
    so the probe's output is invariant under how the incoming stream is
    sharded (a fp's batch-side occupancy depends on shard boundaries;
    its corpus occupancy does not). On corpora where no fp sits near
    the cap the two semantics emit identical cross pairs — pinned by
    the streaming-ensemble parity test."""
    from ..functions.text import winnow_fingerprints

    def fp_rows(docs: DataFrame, id_alias: str) -> DataFrame:
        return (
            winnow_fingerprints(docs, "doc_id", text_col, k=k, w=w)
            .select(
                F.col("doc_id").alias(id_alias),
                F.explode_outer("fps").alias("fp"),
            )
            .filter(F.col("fp").isNotNull())
            .distinct()
        )

    c_fp = fp_rows(corpus, "corpus_id")
    n_fp = fp_rows(new_docs, "new_id")
    ok = (
        c_fp.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") <= max_fp_corpus)
        .select("fp")
    )
    return (
        c_fp.join(ok, "fp")
        .join(F.broadcast(n_fp), "fp")
        .groupBy("corpus_id", "new_id")
        .agg(F.count(F.lit(1)).alias("n_shared_fps"))
        .filter(F.col("n_shared_fps") >= min_shared)
    )


def ensemble_near_dups_incremental(corpus: DataFrame, new_docs: DataFrame,
                                   text_col: str = "text",
                                   threshold: float = 0.6) -> DataFrame:
    """Incremental MULTI-SIGNAL dedup evidence (the streaming/ingest
    counterpart of dedup_ensemble_keep's edge set): an arriving doc is
    flagged against the static corpus if it is a bag-of-words near-dup
    (MinHash-LSH broadcast probe, verified jaccard >= threshold) OR
    shares a long verbatim run (winnowing span evidence). Returns the
    UNION of both signals' (corpus_id, new_id) pairs — the edges a
    downstream keep decision joins with the corpus's own components.
    Both probes broadcast only the shard side; the corpus is scanned,
    never shuffled."""
    mh = minhash_near_dups_incremental(
        corpus, new_docs, text_col, threshold
    ).select("corpus_id", "new_id")
    wn = winnow_cross_pairs(corpus, new_docs, text_col).select(
        "corpus_id", "new_id"
    )
    return mh.unionByName(wn).distinct()


def connected_components(pairs: DataFrame, id_a: str = "id_a",
                         id_b: str = "id_b",
                         max_iterations: int = 12) -> DataFrame:
    """Connected components over an undirected pair-edge list →
    (doc_id, cluster) where cluster is the component's minimum id —
    the step that turns near-dup PAIRS into dedup GROUPS with a
    canonical representative (keep min-id, drop the rest).

    TWO regimes on the measured directed-edge count (riding the
    edge-materialization job's observe): at or below 20M edges the
    whole computation runs in ONE Arrow kernel (phase 2a below —
    every dup graph measured to date, including the 100x probes, is
    deep inside this bound); above it, distributed iterative
    min-label propagation under the session's normal conf (AQE,
    full-width shuffle joins — billions of dup edges at 100 TB), each
    round costing exactly ONE Spark action. (The r8-r10 "small
    regime" that toggled session-global AQE/shuffle conf for the loop
    was removed in r11: the kernel regime covers its entire range, so
    the loop only ever runs on graphs big enough to want the normal
    conf — and the session-global-conf concurrency caveat went with
    it.) The iterative loop:

    - edges are symmetrized with an in-row ``explode(array(fwd, rev))``
      instead of a self-union, so the upstream pair pipeline appears
      ONCE in the plan (no pre-union checkpoint job needed);
    - labels initialize to the CLOSED-NEIGHBORHOOD minimum
      (``least(u, min(v))`` on the same shuffle that materializes the
      edges) — for the clique-shaped graphs near-dup evidence produces
      this IS the component minimum, so the loop's first round is
      already the convergence confirmation (init is sound for any
      graph: every init label names a node inside the component, and
      each component's true minimum labels itself);
    - the convergence test rides the propagation job itself via
      ``Observation``: the label SUM is monotonically non-increasing
      and strictly decreases until fixpoint, and ``observe(sum)``
      collects it during the localCheckpoint's materializing job — no
      second ``.agg().first()`` action per round;
    - each round POINTER-JUMPS as well as propagates: the new label is
      ``min(l(n), min neighbor l(v), l(l(n)))`` — the extra self-join
      on the label table shortcuts along label chains, cutting rounds
      on long thin components (winnow span evidence produces
      boilerplate CHAINS, not just cliques: the sf0.1 evidence graph
      has a 3.7k-node diameter-16 component, measured 11 rounds → 8;
      jumping cannot beat graph distance outright because the minimum
      id still has to FLOW through local minima, but it collapses the
      pointer trees that do form). Soundness is unchanged: ``l(n)``
      always names a node inside n's component, so ``l(l(n))`` does
      too, and at fixpoint symmetric edges force ``l(u) == l(v)`` per
      edge with the component minimum labeling itself.

    Rounds needed ≈ effective diameter (cliques: 1 confirm round).
    Each round is localCheckpoint'ed: without lineage truncation an
    iterative plan re-derives every prior round per action (at
    production scale use reliable checkpointing to cluster storage
    instead; GraphX/GraphFrames' large-star/small-star does the same
    job in O(log n) rounds if diameters ever get large — and
    _star_components is the in-repo fallback when the cap trips).
    tests/test_dedup_similarity.py pins the total action budget for a
    clique fixture (edges job + the kernel job + collect)."""
    # Phase 1 — materialize the symmetric edge list ONCE under the
    # session's normal conf: this job runs the whole upstream evidence
    # pipeline (for the keep queries: LSH banding + verify joins), so
    # it must keep full parallelism/AQE. The directed-edge count rides
    # the checkpoint via observe.
    e = F.explode(
        F.array(
            F.struct(F.col(id_a).alias("u"), F.col(id_b).alias("v")),
            F.struct(F.col(id_b).alias("u"), F.col(id_a).alias("v")),
        )
    ).alias("e")
    obs_e = Observation()
    edges = (
        pairs.select(e)
        .select("e.u", "e.v")
        .distinct()
        .observe(obs_e, F.count(F.lit(1)).alias("m"))
        .localCheckpoint()
    )
    n_edges = obs_e.get["m"]

    # Phase 2a — TINY regime (round 11): below ``kernel_edges``
    # directed edges the whole component computation runs inside ONE
    # Arrow kernel on one task — the same vectorized min-label loop
    # _bucket_component_stars uses (argsort/unique once, C-contiguous
    # minimum.reduceat per round, double searchsorted pointer jump),
    # over the already-checkpointed edge list. This is what actually
    # removes the ~2 s/query fixed floor the keep endpoints paid at
    # bench scale: the iterative regime costs one localCheckpoint JOB
    # per round (pure scheduling + re-planning latency on dup-sized
    # graphs — 8 rounds on the sf0.1 winnow evidence), the kernel
    # costs one single-partition exchange of the dup-sized edge list
    # plus microsecond in-memory rounds. High-diameter graphs are
    # FREE here (the r10 Hamming-lattice case that needed the
    # star-contraction fallback converges in-kernel at ~ms/round), so
    # the 12-round cap and fallback only govern the big regime.
    # MEMORY SIZING (r12 advice correction — the earlier "~500 MB"
    # note counted only the resident edge arrays): the single task's
    # TRANSIENT peak is ~4-6 int64 copies of the directed edge list —
    # the Arrow→pandas group materialization, np.unique(
    # return_inverse), the stable argsort, and the per-round
    # labels[srcs] gather — i.e. ~1.5-2 GB at the 20M-edge threshold.
    # Size executors accordingly (a Python worker near the threshold
    # needs ~2 GB headroom beyond the JVM heap), or lower the
    # threshold on memory-tight clusters; beyond it the distributed
    # loop takes over. Output is identical (component-minimum
    # labels) in all regimes.
    if n_edges <= 20_000_000:
        return _kernel_components(edges)

    # Phase 2 — the distributed iterative loop, reached only above
    # the kernel bound (billions of dup edges at 100 TB scale): runs
    # under the session's normal conf — AQE, full-width shuffle
    # joins — because at this edge volume the rounds are data-bound,
    # not scheduling-bound, and the label table (one row per node,
    # nodes <= n_edges > 20M) is far past any broadcast threshold.
    bc = lambda df: df  # noqa: E731 — kept as _star_components' hook
    obs0 = Observation()
    labels = (
        edges.groupBy("u")
        .agg(F.min("v").alias("_mn"))
        .select(
            F.col("u").alias("node"),
            F.least("u", "_mn").alias("label"),
        )
        .observe(obs0, F.sum("label").alias("s"))
        .localCheckpoint()
    )
    prev_sum = obs0.get["s"]
    converged = False
    for _ in range(max_iterations):
        neighbor_labels = (
            edges.join(bc(labels), edges.u == labels.node)
            .select(F.col("v").alias("node"), "label")
        )
        jumped = (
            labels.alias("a")
            .join(
                bc(labels.alias("b")),
                F.col("a.label") == F.col("b.node"),
            )
            .select(
                F.col("a.node").alias("node"),
                F.col("b.label").alias("label"),
            )
        )
        obs = Observation()
        labels = (
            labels.unionByName(neighbor_labels)
            .unionByName(jumped)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .observe(obs, F.sum("label").alias("s"))
            .localCheckpoint()
        )
        cur_sum = obs.get["s"]
        if cur_sum == prev_sum:
            converged = True
            break
        prev_sum = cur_sum
    if not converged:
        # HIGH-DIAMETER escape (round 10): min-label propagation
        # converges in O(diameter) rounds, which is right for the
        # clique/short-chain graphs near-dup evidence usually
        # produces — but a deep graph (the 100x perceptual-hash
        # lattice: long Hamming-adjacency chains, needs hundreds
        # of rounds) would previously EXIT THE CAP SILENTLY with
        # unconverged labels, and the late rounds also degrade as
        # localCheckpoint recomputation cascades (measured: round
        # 18 0.8 s -> round 24 264 s on 313k edges). Large-star /
        # small-star contraction (Kiveris et al., public
        # literature) finishes in O(log^2 n) rounds on ANY
        # diameter, so it is the guaranteed-convergence fallback;
        # the propagation loop stays the fast path because its
        # per-round cost is lower on the shallow graphs that are
        # the common case. The 12-round cap (was 25) is load-
        # bearing: the checkpoint-recompute degradation observed
        # above began around round 18, so the fast path must hand
        # off before it can manifest (every shallow graph measured
        # to date converges in <= 8 rounds with pointer jumping).
        labels = _star_components(edges, bc)
    return labels.select(F.col("node").alias("doc_id"), F.col("label").alias("cluster"))


def _kernel_components(edges: DataFrame) -> DataFrame:
    """Connected components of a SYMMETRIZED directed edge list in one
    Arrow kernel → (doc_id, cluster), cluster = component minimum —
    the tiny-regime body of connected_components (see its phase-2a
    comment for the cost argument). Vectorized min-label over int
    index edges: neighbor minima via one stable argsort + np.unique
    done ONCE and a contiguous minimum.reduceat per round, then two
    pointer jumps (labels always hold node ids present in the sorted
    id array, so searchsorted is an exact index lookup). Monotone
    non-increasing on a finite lattice ⇒ guaranteed convergence; the
    round cap is a corrupt-input backstop, far above any real graph
    (min-label with double jumping closes diameter-d graphs in
    O(log d) + label-flow rounds)."""
    import numpy as np
    import pandas as pd

    def cc(pdf: "pd.DataFrame") -> "pd.DataFrame":
        u = pdf["u"].to_numpy(np.int64)
        v = pdf["v"].to_numpy(np.int64)
        if u.size == 0:
            return pd.DataFrame({"doc_id": np.empty(0, np.int64),
                                 "cluster": np.empty(0, np.int64)})
        # symmetric edges ⇒ every node appears as a source
        ids, ei = np.unique(u, return_inverse=True)
        ej = np.searchsorted(ids, v)
        labels = ids.copy()
        o2 = np.argsort(ei, kind="stable")
        dsts = ei[o2]
        srcs = ej[o2]
        uniq, starts = np.unique(dsts, return_index=True)
        for _ in range(100_000):
            mins = np.minimum.reduceat(labels[srcs], starts)
            new = labels.copy()
            new[uniq] = np.minimum(new[uniq], mins)
            new = np.minimum(new, new[np.searchsorted(ids, new)])
            new = np.minimum(new, new[np.searchsorted(ids, new)])
            if np.array_equal(new, labels):
                break
            labels = new
        return pd.DataFrame({"doc_id": ids, "cluster": labels})

    return (
        edges.select(F.lit(0).alias("_g"), "u", "v")
        .groupBy("_g")
        .applyInPandas(cc, "doc_id long, cluster long")
    )


def _star_components(edges: DataFrame, bc,
                     max_rounds: int = 50) -> DataFrame:
    """Large-star/small-star connected components (Kiveris et al.,
    "Connected Components in MapReduce and Beyond") over a SYMMETRIC
    distinct (u, v) edge frame: alternate

      large-star: for every node u, attach each LARGER neighbor to
        m(u) = min(neighbors(u) + {u});
      small-star: for every node u, attach u and each SMALLER-or-equal
        neighbor to the minimum among them;

    until the edge set is a fixpoint — at which point every component
    is a star rooted at its minimum id. Each operator preserves
    connectivity and strictly reduces a potential function, and the
    alternation converges in O(log^2 n) rounds regardless of graph
    diameter (the property the propagation fast path lacks). Returns
    (node, label) for every non-isolated node. Fixpoint detection is
    an exact count of changed edges (the frames are dup-graph-sized
    and localCheckpointed, so the extra comparison job is cheap)."""
    cur = edges.localCheckpoint()
    for _ in range(max_rounds):
        # large-star over the symmetric adjacency of cur
        sym = cur.unionByName(
            cur.select(F.col("v").alias("u"), F.col("u").alias("v"))
        ).distinct()
        mins = sym.groupBy("u").agg(F.min("v").alias("_mn"))
        m = F.least(F.col("u"), F.col("_mn")).alias("m")
        big = (
            sym.join(bc(mins), "u")
            .select("u", "v", m)
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint()
        )
        # small-star over the symmetric adjacency of big
        sym2 = big.unionByName(
            big.select(F.col("v").alias("u"), F.col("u").alias("v"))
        ).distinct()
        small_n = sym2.filter(F.col("v") <= F.col("u"))
        mins2 = small_n.groupBy("u").agg(F.min("v").alias("_mn"))
        m2 = F.least(F.col("u"), F.col("_mn")).alias("m")
        attach = (
            small_n.join(bc(mins2), "u")
            .select(F.col("v").alias("node"), m2)
        )
        self_rows = mins2.select(
            F.col("u").alias("node"),
            F.least(F.col("u"), F.col("_mn")).alias("m"),
        )
        nxt = (
            attach.unionByName(self_rows)
            .filter(F.col("node") != F.col("m"))
            .select(F.col("m").alias("u"), F.col("node").alias("v"))
            .distinct()
            .localCheckpoint()
        )
        changed = (
            nxt.exceptAll(cur).limit(1).count()
            + cur.exceptAll(nxt).limit(1).count()
        )
        cur = nxt
        if changed == 0:
            break
    else:
        raise RuntimeError(
            "star contraction did not converge within "
            f"{max_rounds} rounds — not a known graph class"
        )
    sym = cur.unionByName(
        cur.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    return sym.groupBy("u").agg(F.min("v").alias("_mn")).select(
        F.col("u").alias("node"),
        F.least("u", "_mn").alias("label"),
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


# Bit masks 2^j as signed longs (bit 63 is the sign bit in two's
# complement). Used both to extract bits (h & p != 0) and to re-pack
# the majority votes into one long.
_BIT_MASKS = [(1 << j) if j < 63 else -(1 << 63) for j in range(64)]


def simhash64(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """64-bit SimHash over word-token hashes: bit j of the fingerprint
    is the sign of sum over tokens of (2*bit_j(xxhash64(tok)) - 1).

    ONE fold over the token-hash array with a 64-wide vote-vector
    accumulator (zip_with add of the token's ±1 bit vector), then one
    zip_with+fold to pack votes back into a long. The earlier
    one-aggregate-per-bit form re-inlined the token-hash transform 64
    times and built a ~6000-node expression tree — this form measured
    ~9x faster and stays a single codegen'd projection (no shuffle)."""
    masks = F.array(*[F.lit(p).cast("long") for p in _BIT_MASKS])
    toks = F.split(normalize_text(text_col), " ")
    hashes = F.transform(toks, lambda t: F.xxhash64(t))
    votes = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0).cast("long"), 64),
        lambda acc, h: F.zip_with(
            acc,
            F.transform(
                masks, lambda p: (h.bitwiseAND(p) != 0).cast("long") * 2 - 1
            ),
            lambda a, b: a + b,
        ),
    )
    packed = F.aggregate(
        F.zip_with(
            votes,
            masks,
            lambda v, p: F.when(v > 0, p).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda a, b: a.bitwiseXOR(b),
    )
    return docs.select("doc_id", packed.alias("simhash"))


def simhash_near_dups(docs: DataFrame, text_col: str = "text",
                      max_hamming: int = 3,
                      max_bucket: int | None = DEFAULT_MAX_BUCKET) -> DataFrame:
    """SimHash near-dup: block on any shared 16-bit chunk (pigeonhole:
    hamming ≤ 3 ⇒ at least one of 4 chunks identical), verify with
    bit_count(xor) ≤ max_hamming. ``max_bucket``: oversized chunk
    buckets emit STAR edges (min-id anchor vs rest) instead of all
    pairs — same boilerplate-corpus guard and rationale as
    lsh_candidate_pairs, defaulted for the routed query (round 7)."""
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
    # Bucket-grouped pair generation (same rationale as
    # lsh_candidate_pairs): one shuffle on the chunk key, SimHash
    # pipeline computed once. array_sort on (doc_id, simhash) structs
    # orders by doc_id (struct ordering is field-ordinal) → a < b.
    buckets = (
        ex.groupBy("chunk_idx", "chunk_val")
        .agg(F.array_sort(F.collect_list(F.struct("doc_id", "simhash"))).alias("ds"))
        .filter(F.size("ds") > 1)
    )
    all_pairs = F.flatten(
        F.transform(
            F.col("ds"),
            lambda x, i: F.transform(
                F.slice(F.col("ds"), i + F.lit(2), F.size(F.col("ds"))),
                lambda y: F.struct(
                    x["doc_id"].alias("id_a"),
                    y["doc_id"].alias("id_b"),
                    F.bit_count(x["simhash"].bitwiseXOR(y["simhash"])).alias("hamming"),
                ),
            ),
        )
    )
    if max_bucket is not None:
        star = F.transform(
            F.slice(F.col("ds"), 2, F.size(F.col("ds"))),
            lambda y: F.struct(
                F.col("ds")[0]["doc_id"].alias("id_a"),
                y["doc_id"].alias("id_b"),
                F.bit_count(
                    F.col("ds")[0]["simhash"].bitwiseXOR(y["simhash"])
                ).alias("hamming"),
            ),
        )
        pairs = F.when(F.size("ds") <= max_bucket, all_pairs).otherwise(star)
    else:
        pairs = all_pairs
    return (
        buckets.select(F.explode(pairs).alias("p"))
        .select("p.id_a", "p.id_b", "p.hamming")
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )

def hashed_char_shingles(docs: DataFrame, text_col: str = "text",
                         n: int = 3) -> DataFrame:
    """doc_id → distinct xxhash64'd char-n-gram shingle set. Jaccard is
    invariant under the (injective at these sizes) hash, and 64-bit ints
    intersect ~2x faster than strings."""
    from ..functions.text import char_ngrams

    return docs.select(
        "doc_id",
        F.array_distinct(
            F.transform(
                char_ngrams(normalize_text(text_col), n), lambda g: F.xxhash64(g)
            )
        ).alias("shingles"),
    )


# Char-ngram LSH config: 128 perms in 16 bands of 8 rows. Char n-grams
# carry HIGH background similarity (median ≈0.46, tail to ≈0.73 on the
# driver corpus), so the word-bigram config (bands of 2) would make
# nearly every pair a candidate. Bands of 8 put the S-curve's knee
# inside the corpus's empty (0.74, 0.92) gap:
#   P(candidate | j) = 1-(1-j^8)^16:  j=0.93 → 1-2.6e-6 (recall ≈ 1)
#                                     j=0.73 → 0.75 (tail is ~5 pairs)
#                                     j=0.65 → 0.41, j=0.46 → 0.03
# so candidates ≈ 7% of all pairs vs 100% for brute force, and the
# exact-jaccard verify restores precision. 25 true pairs × 2.6e-6 →
# overall exact-equality-with-ground-truth odds ≈ 1-6e-5.
N_PERM_CHAR = 128
N_BANDS_CHAR = 16
ROWS_PER_BAND_CHAR = N_PERM_CHAR // N_BANDS_CHAR


def char_ngram_near_dups_lsh(docs: DataFrame, text_col: str = "text",
                             n: int = 3, threshold: float = 0.8,
                             max_bucket: int | None = DEFAULT_MAX_BUCKET) -> DataFrame:
    """Scale path for char-n-gram Jaccard dedup: the same shingle sets
    as char_ngram_near_dups, fed through the (shingle-agnostic) MinHash
    + banded-LSH pipeline instead of the O(n²) self-join. Same output
    as the brute-force form up to the 1-in-400k recall tail above —
    the O(n²) form remains the oracle ground truth.

    Scale shape mirrors minhash_near_dups: signatures materialize in
    the scan stage, the only corpus-keyed shuffle is the (band,
    band_hash) bucket groupBy, and the exact verify touches candidate
    pairs only."""
    shingled = _persist_released_on_gc(hashed_char_shingles(docs, text_col, n))
    signed = _persist_released_on_gc(
        minhash_signatures(shingled, n_perm=N_PERM_CHAR))
    cands = estimate_jaccard(
        lsh_candidate_pairs(
            signed, n_bands=N_BANDS_CHAR, rows_per_band=ROWS_PER_BAND_CHAR,
            max_bucket=max_bucket,
        ),
        signed,
        n_perm=N_PERM_CHAR,
    ).filter(F.col("est_jac") >= threshold - 0.2)
    return verify_pairs(cands, shingled, threshold)


def char_ngram_near_dups(docs: DataFrame, text_col: str = "text",
                         n: int = 3, threshold: float = 0.8) -> DataFrame:
    """n-gram Jaccard dedup over CHARACTER n-grams — the
    tokenizer-free variant (robust to languages without word
    boundaries, where word shingles degenerate). Char n-grams carry
    high background similarity (measured median ≈0.45 on the driver
    corpus vs ≈0 for word bigrams), hence the 0.8 default threshold —
    planted dups sit ≥0.9 with an empty (0.7, 0.9) gap.

    The O(n²) pair stage intersects xxhash64-HASHED shingle sets, not
    string sets: jaccard is invariant under an injective mapping, and
    at ~300 shingles/doc the 64-bit collision odds (~n²/2⁶⁴ ≈ 5e-15
    per pair) are far below the 4-decimal rounding granularity —
    measured ~2x faster than string intersects. A size-ratio predicate
    rides in the join condition: jaccard(A,B) ≥ t implies
    min(|A|,|B|) ≥ t·max(|A|,|B|) (|A∩B| ≤ min, union ≥ max), so
    pairs failing the ratio are discarded for the cost of two array
    lengths — an EXACT bound, zero recall loss. For corpus scale, feed
    these shingle sets through char_ngram_near_dups_lsh instead (the
    pipeline is shingle-agnostic)."""
    shingled = hashed_char_shingles(docs, text_col, n)
    sa = shingled.select(F.col("doc_id").alias("id_a"), F.col("shingles").alias("sh_a"))
    sb = shingled.select(F.col("doc_id").alias("id_b"), F.col("shingles").alias("sh_b"))
    na, nb = F.size(F.col("sh_a")), F.size(F.col("sh_b"))
    return (
        sa.join(
            sb,
            (F.col("id_a") < F.col("id_b"))
            & (F.least(na, nb) >= F.lit(threshold) * F.greatest(na, nb)),
        )
        .select("id_a", "id_b", F.round(jaccard(F.col("sh_a"), F.col("sh_b")), 4).alias("jac"))
        .filter(F.col("jac") >= threshold)
    )


# ---------------------------------------------------------------------------
# Containment (asymmetric overlap) via prefix filtering
# ---------------------------------------------------------------------------


def containment_near_dups(docs: DataFrame, text_col: str = "text",
                          n: int = 3,
                          threshold: float = 0.8) -> DataFrame:
    """Containment dedup: pairs where either doc's shingle set is
    ≥ ``threshold`` CONTAINED in the other (|A∩B|/|A|) — the
    truncation/quote/boilerplate-wrap case jaccard misses (a snippet
    inside a much larger doc has low jaccard but containment ≈ 1),
    and a semantic MinHash-LSH cannot block for (minhash estimates
    the SYMMETRIC jaccard).

    Scale path is PREFIX FILTERING (the ppjoin family, public
    literature): for containment ≥ t, a doc A has at most
    (1-t)·|A| shingles outside A∩B, so ANY ⌊(1-t)·|A|⌋+1 of A's
    shingles must hit B — picking the GLOBALLY RAREST shingles as
    that prefix makes the candidate join touch only low-df posting
    lists. EXACT recall by pigeonhole, unlike LSH:

    1. shingle df table: one map-combinable agg over the exploded
       corpus;
    2. per-doc prefix: rank shingles by (df, shingle) inside the doc
       (per-doc window, bounded by doc length) and keep the first
       ⌊(1-t)·|A|⌋+1;
    3. candidates: prefix-side explode equi-joined on shingle against
       the full inverted index — ONE shuffle on the shingle key,
       volume bounded by the prefixes' posting lists (rare shingles);
    4. exact containment verify on candidate pairs only.

    The full-index side must stay unpruned (recall depends on it);
    the standard stop-shingle cap would trade exactness and is
    deliberately not applied.

    Shingles are xxhash64'd before any join/intersect: containment
    counts are invariant under the (injective at corpus scale,
    ~n²/2⁶⁴ collision odds) hash, long keys shuffle and intersect
    ~2x faster than strings, and the df/posting tables shrink.

    Shingles default to word TRIGRAMS, not the bigrams the jaccard
    pipeline uses: prefix filtering's candidate volume is the posting
    lists of the rare prefix shingles, and on a small-vocabulary
    corpus the bigram space is too dense for 'rare' to exist (the
    driver corpus measures 931 distinct bigrams with ~900 above
    df=100 → 5.5M candidates, i.e. brute force; trigrams measure 27k
    distinct / median df 9 → 177k candidates, 70x fewer than the
    pair space). The containment semantics are the n-gram parameter's
    to choose either way."""
    from pyspark.sql.window import Window

    sh = shingle_sets(docs, text_col, n).select(
        "doc_id",
        F.array_distinct(
            F.transform("shingles", lambda g: F.xxhash64(g))
        ).alias("shingles"),
    )
    sh = _persist_released_on_gc(sh)
    ex = sh.select("doc_id", F.size("shingles").alias("sz"),
                   F.explode("shingles").alias("s"))
    dfreq = ex.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy("doc_id").orderBy("df", "s")
    # Prefix bound in EXACT integer arithmetic. A qualifying pair has
    # inter >= t*|A| with inter integral, i.e. inter >= ceil(p*|A|/q)
    # for t = p/q — so |A| - ceil(p*|A|/q) + 1 prefix shingles suffice
    # (tighter than floor((1-t)|A|)+1 when t*|A| is fractional). The
    # float form of that bound is OFF BY ONE whenever (1-t)*|A| lands
    # on an exact integer (1.0-0.8 = 0.19999…96 in binary, so
    # floor(0.2*5) computed 0 instead of 1), silently breaking the
    # pigeonhole recall guarantee at the threshold boundary. Fraction
    # (of the decimal string, so 0.8 means 4/5, not the nearest
    # binary double) + ceil-as-integer-division keeps it exact; the
    # double division below is exact for these magnitudes (integer
    # quotients < 2^53 are representable, non-integer quotients can't
    # straddle an integer).
    from fractions import Fraction

    frac = Fraction(str(threshold)).limit_denominator(10**6)
    p, q = frac.numerator, frac.denominator
    ceil_t_sz = F.floor(
        (F.lit(p) * F.col("sz") + F.lit(q - 1)) / F.lit(q)
    ).cast("int")
    prefix = (
        ex.join(dfreq, "s")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= F.col("sz") - ceil_t_sz + 1)
        .select(F.col("doc_id").alias("id_x"), "s")
    )
    inverted = ex.select(F.col("doc_id").alias("id_y"), "s")
    cands = (
        prefix.join(inverted, "s")
        .filter(F.col("id_x") != F.col("id_y"))
        .select(
            F.least("id_x", "id_y").alias("id_a"),
            F.greatest("id_x", "id_y").alias("id_b"),
        )
        .distinct()
    )
    sa = sh.select(F.col("doc_id").alias("id_a"), F.col("shingles").alias("sh_a"))
    sb = sh.select(F.col("doc_id").alias("id_b"), F.col("shingles").alias("sh_b"))
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    c_ab = inter / F.size("sh_a")
    c_ba = inter / F.size("sh_b")
    return (
        cands.join(sa, "id_a")
        .join(sb, "id_b")
        .filter(F.greatest(c_ab, c_ba) >= threshold)
        .select(
            "id_a",
            "id_b",
            F.round(c_ab, 4).alias("c_ab"),
            F.round(c_ba, 4).alias("c_ba"),
        )
    )


# ---------------------------------------------------------------------------
# Exact shared-run ground truth (for the winnowing span-dedup gate/probe)
# ---------------------------------------------------------------------------


def shared_run_pairs(docs: DataFrame, run_len: int = 35,
                     text_col: str = "text") -> DataFrame:
    """EXACT pairs of docs sharing a verbatim normalized character run
    of length >= ``run_len`` — the ground truth the winnowing span
    dedup (dedup_substring_winnow) is judged against. A shared run of
    length L >= run_len contains a shared run_len-gram, and a shared
    run_len-gram IS a shared run — so identity bucketing on distinct
    run_len-grams (one groupBy + in-bucket pair emit, the same shape
    as every LSH path here; no O(n²) self-join) computes the truth
    exactly. Cost is run_len bytes of gram explode per input char —
    fine for gate/probe scales; the PRODUCTION span path remains
    winnowing, whose index is ~2/(w+1) sparse."""
    from ..functions.text import char_ngrams, normalize_text

    grams = docs.select(
        "doc_id",
        F.explode_outer(
            F.array_distinct(char_ngrams(normalize_text(text_col), run_len))
        ).alias("g"),
    ).filter(F.length("g") == run_len)
    return (
        grams.groupBy("g")
        .agg(F.array_sort(F.collect_set("doc_id")).alias("ids"))
        .filter(F.size("ids") >= 2)
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(ids, (a, i) -> "
                    "transform(slice(ids, i + 2, size(ids)), "
                    "b -> struct(a AS id_a, b AS id_b))))"
                )
            ).alias("p")
        )
        .select("p.id_a", "p.id_b")
        .distinct()
    )


# ---------------------------------------------------------------------------
# 10. image-content near-dup (round 10): Hamming-ball LSH over the
#     56-bit perceptual dHash (operators/multimodal.image_dhash)
# ---------------------------------------------------------------------------

def phash_near_dup_pairs(hashes: DataFrame, max_hamming: int = 3,
                         id_col: str = "doc_id",
                         hash_col: str = "phash") -> DataFrame:
    """Image near-dup pairs from perceptual hashes: band the 56-bit
    dHash into 4 x 14-bit slices, bucket on (band, slice value), emit
    pairs inside buckets (the winnow/LSH shape — one shuffle on the
    band key, no self-join), then verify bit_count(xor) <= ``max_ham-
    ming``. The banding is EXACT for the default radius, not
    probabilistic: a pair within Hamming distance 3 differs in at
    most 3 of the 4 bands (pigeonhole), so at least one band matches
    and the pair is guaranteed to surface — which is why the oracle
    can be the brute-force self-join and still hash-match. Radii
    above n_bands-1 would make recall probabilistic; callers wanting
    a wider ball should raise the band count to max_hamming+1.

    Buckets are NOT capped — unlike the winnow hub caps there is no
    "boilerplate" regime to discard (identical tiny images ARE the
    duplicate structure), and the oracle is the brute-force self-join
    so dropping a bucket would break parity. But bucket SIZE is not
    bounded by n/16384 background collisions either: perceptual
    hashes are low-entropy on structured corpora (tiny/flat images
    concentrate near zero), so one band value can collect tens of
    thousands of DISTINCT hashes. Two-regime pair emit (round 10 —
    the 100x media probe OOM'd the in-row form on exactly such a
    bucket): buckets <= ``in_row_bucket`` members emit pairs as an
    in-row nested transform (one shuffle, no join — the common case);
    larger buckets re-explode their members and self-join on the
    bucket key, which STREAMS the quadratic candidate space through
    the Hamming verify instead of materializing C(n,2) structs in a
    single row. The verify runs BEFORE the distinct in both regimes,
    so far pairs die in the emit stage and never shuffle. Returns
    (id_a, id_b, hamming), id_a < id_b.

    Null hashes (undecodable payloads) are dropped before banding."""
    return (
        _banded_verified_pairs(hashes, max_hamming, id_col, hash_col)
        .select("id_a", "id_b", "hamming")
        .distinct()
    )


def _banded_key_rows(hashes: DataFrame, max_hamming: int,
                     id_col: str = "doc_id",
                     hash_col: str = "phash") -> DataFrame:
    """Flat band-key rows (_id, _ph, bk) for the Hamming-ball LSH:
    band the 56-bit hash into max(4, r+1) slices and emit one row per
    (hash, band) with bk = struct(band, slice value). The SINGLE
    banding definition every Hamming-ball consumer derives from —
    the bucketed pipelines group these rows (_hamming_buckets), and
    the incremental delta (phash_edges_apply_delta) joins new-rep
    keys against them map-side — so the band geometry cannot drift
    between the build and maintenance routes."""
    h = hashes.filter(F.col(hash_col).isNotNull()).select(
        F.col(id_col).alias("_id"), F.col(hash_col).alias("_ph")
    )
    n_bands = max(4, max_hamming + 1)
    width = 56 // n_bands
    return h.select(
        "_id", "_ph",
        F.explode(F.array(*[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright(F.col("_ph"), b * width)
                .bitwiseAND(F.lit((1 << width) - 1)).alias("val"),
            )
            for b in range(n_bands)
        ])).alias("bk"),
    )


def _hamming_buckets(hashes: DataFrame, max_hamming: int,
                     id_col: str = "doc_id",
                     hash_col: str = "phash") -> DataFrame:
    """The shared LSH bucketing both Hamming-ball consumers start
    from: band the 56-bit hash into max(4, r+1) slices, bucket on
    (band, slice value), keep buckets with >= 2 members → (bk, ms)
    where ms is the sorted (_id, _ph) member set. ONE shuffle on the
    band key; the pigeonhole guarantee (a pair within distance r
    differs in at most r of the r+1 bands, so at least one band
    matches) makes downstream recall EXACT at the default radius."""
    banded = _banded_key_rows(hashes, max_hamming, id_col, hash_col)
    return (
        banded.groupBy("bk")
        .agg(F.array_sort(
            F.collect_set(F.struct("_id", "_ph"))).alias("ms"))
        .filter(F.size("ms") >= 2)
    )


def _banded_verified_pairs(hashes: DataFrame, max_hamming: int,
                           id_col: str = "doc_id",
                           hash_col: str = "phash") -> DataFrame:
    """The banded Hamming-ball PAIR pipeline behind
    phash_near_dup_pairs (which distincts away the bucket tag):
    returns (bk, id_a, id_b, hamming) — one row per verified pair PER
    surfacing bucket, id_a < id_b. Two-regime pair emit (the 100x
    media probe OOM'd the in-row form on a monster bucket): buckets
    <= the in-row bound emit pairs as an in-row nested transform (no
    join — the common case); larger buckets re-explode their members
    and self-join on the bucket key, which STREAMS the quadratic
    candidate space through the Hamming verify instead of
    materializing C(n,2) structs in a single row. The verify runs
    BEFORE the distinct in both regimes, so far pairs die in the emit
    stage and never shuffle. (The component-edge path no longer rides
    this relation — _bucket_component_stars fuses verify + CC in one
    Arrow kernel per bucket — so only the pair QUERY, whose output
    contract is the actual pair set, pays the quadratic emit.)

    The bucket table is PERSISTED (round 13, guide §4.1/§2.3): the
    small-bucket branch and BOTH sides of the big-bucket self-join
    reference it, and Spark does not share common subtrees across
    union/join branches — so a from-raw caller (image_dhash /
    audio_fingerprint over blobs) was running its DECODE KERNEL three
    times per query (three MapInPandas nodes over the same scan in
    the captured plan). One cache fill runs the decode + the one
    band-key shuffle once; the branches then read bucket rows
    ((id, hash) members — KBs per thousand docs) from cache."""
    buckets = _persist_released_on_gc(
        _hamming_buckets(hashes, max_hamming, id_col, hash_col))
    in_row_bucket = 256

    def verified(cand: DataFrame) -> DataFrame:
        return (
            cand.withColumn(
                "hamming",
                F.bit_count(
                    F.col("ph_a").bitwiseXOR(F.col("ph_b"))
                ).cast("long"),
            )
            .filter(F.col("hamming") <= max_hamming)
            .select("bk", "id_a", "id_b", "hamming")
        )

    small = verified(
        buckets.filter(F.size("ms") <= in_row_bucket)
        .select(
            "bk",
            F.explode(
                F.expr(
                    "flatten(transform(ms, (a, i) -> "
                    "transform(slice(ms, i + 2, size(ms)), "
                    "b -> struct(a._id AS id_a, b._id AS id_b, "
                    "a._ph AS ph_a, b._ph AS ph_b))))"
                )
            ).alias("p"),
        )
        .select("bk", "p.id_a", "p.id_b", "p.ph_a", "p.ph_b")
    )
    bigm = (
        buckets.filter(F.size("ms") > in_row_bucket)
        .select("bk", F.explode("ms").alias("m"))
    )
    big = verified(
        bigm.select(
            "bk", F.col("m._id").alias("id_a"), F.col("m._ph").alias("ph_a")
        )
        .join(
            bigm.select(
                "bk", F.col("m._id").alias("id_b"),
                F.col("m._ph").alias("ph_b"),
            ),
            "bk",
        )
        .filter(F.col("id_a") < F.col("id_b"))
    )
    return small.unionByName(big)


def _popcount_u64(x: "object") -> "object":
    """Vectorized SWAR popcount over a uint64 ndarray (numpy 1.x has
    no np.bitwise_count): five passes over the matrix, no 8x uint8
    expansion — the classic bit-parallel reduction."""
    import numpy as np

    m1 = np.uint64(0x5555555555555555)
    m2 = np.uint64(0x3333333333333333)
    m4 = np.uint64(0x0F0F0F0F0F0F0F0F)
    h01 = np.uint64(0x0101010101010101)
    one, two, four, s56 = (np.uint64(1), np.uint64(2), np.uint64(4),
                           np.uint64(56))
    x = x - ((x >> one) & m1)
    x = (x & m2) + ((x >> two) & m2)
    x = (x + (x >> four)) & m4
    return (x * h01) >> s56


def _bucket_component_stars(members: DataFrame, max_hamming: int,
                            edge_cap: int = 50_000_000) -> DataFrame:
    """Per-bucket Hamming-ball verify + connected components FUSED in
    one Arrow kernel → COMPONENT STARS (id_a=root, id_b=member), root
    = component-minimum id. Input: (bk, _id, _ph) member rows of the
    >= 2-member LSH buckets (_hamming_buckets exploded). Replaces the
    round-10 two-stage shape (streamed SQL self-join verify → 6.5M
    verified-pair rows shuffled into a per-bucket union-find kernel):
    the pairwise distances are computed as chunked numpy XOR +
    SWAR-popcount matrix sweeps — the whole candidate space stays in
    one cache-resident vectorized pass per chunk instead of B^2
    codegen rows through an Exchange — and the verified pairs feed a
    vectorized min-label CC WITHOUT leaving the kernel, so the pair
    set is never serialized at all. Connected components over the
    emitted stars equal components over the full verified pair set (a
    star preserves each bucket-subgraph component's connectivity
    exactly; cross-bucket connectivity rides the union over buckets
    — same argument as the r10 spanning-forest form, components
    count-checked identical at 100x).

    In-kernel CC: verified pairs accumulate as int32 INDEX arrays;
    labels (initialized to member ids, ascending-sorted) iterate
    new = min(label, min over neighbor labels, label[label]) — the
    neighbor min via one argsort/unique done ONCE then a
    C-contiguous minimum.reduceat per round, plus a searchsorted
    pointer jump — until fixpoint. Monotone-decreasing over a finite
    lattice, so termination is guaranteed; root = component minimum
    makes the output DETERMINISTIC regardless of chunk order.

    Memory bound (the r10 advice's single-task-heap concern, now
    explicit): the distance sweep is chunked to a ~64 MiB XOR matrix,
    and the verified-pair index arrays are the only quadratic-growth
    state (8 bytes/pair; 6.5M pairs measured at 100x = 52 MB). If a
    bucket ever exceeds ``edge_cap`` pairs (~400 MB), the kernel
    DROPS the materialized edges and switches to a recompute regime:
    per CC round it re-sweeps the distance chunks and folds each
    row's masked neighbor-label minimum directly — no edge state at
    all, trading ~diameter extra sweeps for a flat memory ceiling."""
    import numpy as np
    import pandas as pd

    def stars(pdf: "pd.DataFrame") -> "pd.DataFrame":
        ids = pdf["_id"].to_numpy(np.int64)
        n = ids.size
        empty = pd.DataFrame({"id_a": np.empty(0, np.int64),
                              "id_b": np.empty(0, np.int64)})
        if n < 2:
            return empty
        order = np.argsort(ids)
        ids = ids[order]
        ph = pdf["_ph"].to_numpy(np.int64)[order].view(np.uint64)
        labels = ids.copy()
        chunk = max(1, (8 << 20) // n)
        ei_parts, ej_parts, total = [], [], 0
        materialized = True
        for s in range(0, n, chunk):
            d = _popcount_u64(ph[s:s + chunk, None] ^ ph[None, :])
            ii, jj = np.nonzero(d <= max_hamming)
            ii = (ii + s).astype(np.int32)
            jj = jj.astype(np.int32)
            keep = ii < jj
            ei_parts.append(ii[keep])
            ej_parts.append(jj[keep])
            total += int(keep.sum())
            if total > edge_cap:
                materialized = False
                ei_parts = ej_parts = None
                break
        if materialized:
            ei = np.concatenate(ei_parts) if ei_parts else (
                np.empty(0, np.int32))
            ej = np.concatenate(ej_parts) if ej_parts else (
                np.empty(0, np.int32))
            if ei.size == 0:
                return empty
            dst = np.concatenate([ej, ei])
            src = np.concatenate([ei, ej])
            o2 = np.argsort(dst, kind="stable")
            dsts = dst[o2]
            srcs = src[o2]
            uniq, starts = np.unique(dsts, return_index=True)
            while True:
                mins = np.minimum.reduceat(labels[srcs], starts)
                new = labels.copy()
                new[uniq] = np.minimum(new[uniq], mins)
                new = np.minimum(new, new[np.searchsorted(ids, new)])
                if np.array_equal(new, labels):
                    break
                labels = new
        else:
            while True:
                new = labels.copy()
                for s in range(0, n, chunk):
                    d = _popcount_u64(ph[s:s + chunk, None] ^ ph[None, :])
                    lab = np.where(d <= max_hamming, labels[None, :],
                                   np.iinfo(np.int64).max)
                    np.minimum(new[s:s + chunk], lab.min(axis=1),
                               out=new[s:s + chunk])
                new = np.minimum(new, new[np.searchsorted(ids, new)])
                if np.array_equal(new, labels):
                    break
                labels = new
        mask = labels != ids
        return pd.DataFrame({"id_a": labels[mask], "id_b": ids[mask]})

    return members.groupBy("bk").applyInPandas(
        stars, "id_a long, id_b long"
    )


# ---------------------------------------------------------------------------
# 11. streaming ensemble probe, steady state (round 10): corpus-side
#     derivations hoisted out of the per-batch plan and persisted once
# ---------------------------------------------------------------------------

def prepare_ensemble_corpus_state(c_mh_idx: DataFrame,
                                  c_fp_idx: DataFrame,
                                  max_fp_corpus: int = 32,
                                  persist: bool = True):
    """One-time corpus-side state for the streaming ensemble probe:
    everything in ensemble_near_dups_prepared's plan that does NOT
    depend on the arriving batch — the banded MinHash keys, the
    (corpus_id, shingles) verify side, and the hub-capped winnow
    fingerprint rows (the distinct + occupancy groupBy, the two
    corpus-wide shuffles the r9 probe re-ran every micro-batch).
    Returns (c_banded, c_shingles, c_fp_capped), persisted so batch
    N>1 reads executor memory instead of re-deriving; call
    ``.unpersist()`` on each when the stream stops. Derivations are
    identical expressions to the per-batch form, so
    ensemble_near_dups_from_state is value-identical to
    ensemble_near_dups_prepared (parity-pinned in
    tests/test_streaming.py)."""
    c_banded = _banded_keys(c_mh_idx, "corpus_id")
    c_sh = c_mh_idx.select(F.col("doc_id").alias("corpus_id"),
                           F.col("shingles").alias("sh_a"))
    c_rows = c_fp_idx.select(
        F.col("doc_id").alias("corpus_id"), "fp"
    ).distinct()
    ok = (
        c_rows.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") <= max_fp_corpus)
        .select("fp")
    )
    c_fp_capped = c_rows.join(ok, "fp")
    state = (c_banded, c_sh, c_fp_capped)
    if persist:
        for df in state:
            df.persist()
    return state


def _ensemble_probe_tail(state, n_bands: DataFrame, nb: DataFrame,
                         n_rows: DataFrame, threshold: float,
                         min_shared: int) -> DataFrame:
    """The corpus-side half of the ensemble probe, shared by the
    in-plan and collected-batch routes: every corpus frame is a
    cached scan, every batch-derived frame broadcasts. Candidates are
    deliberately NOT distinct'd before the verify (round 12): a true
    pair collides in up to 16 bands, so the duplication is bounded
    and the FINAL distinct removes it — dropping the intermediate
    distinct removes one whole shuffle stage from every micro-batch,
    and per-stage launch latency (not row volume) was the measured
    throughput floor."""
    c_banded, c_sh, c_fp_capped = state
    cands = (
        c_banded.join(F.broadcast(n_bands), ["band_idx", "band_hash"])
        .select("corpus_id", "new_id")
    )
    mh = (
        c_sh.join(F.broadcast(cands), "corpus_id")
        .join(F.broadcast(nb), "new_id")
        .select(
            "corpus_id",
            "new_id",
            F.round(jaccard(F.col("sh_a"), F.col("sh_b")), 4).alias("jac"),
        )
        .filter(F.col("jac") >= threshold)
        .select("corpus_id", "new_id")
    )
    wn = (
        c_fp_capped.join(F.broadcast(n_rows), "fp")
        .groupBy("corpus_id", "new_id")
        .agg(F.count(F.lit(1)).alias("n_shared_fps"))
        .filter(F.col("n_shared_fps") >= min_shared)
        .select("corpus_id", "new_id")
    )
    return mh.unionByName(wn).distinct()


def ensemble_near_dups_from_state(state, new_docs: DataFrame,
                                  text_col: str = "text",
                                  threshold: float = 0.6,
                                  k: int = 20, w: int = 8,
                                  min_shared: int = 2) -> DataFrame:
    """The per-micro-batch half of the ensemble probe against a
    prepared corpus state: only the BATCH side computes (shingles,
    signatures, winnow fingerprints — all scan-local on the arriving
    rows), every corpus-side frame is a cached scan, and each join
    broadcasts its small side so no cached frame reshuffles. Same
    output as ensemble_near_dups_prepared(c_mh_idx, c_fp_idx, ...)
    whose corpus inputs produced ``state``.

    Round-12 stage cuts (the r11 "streaming ensemble" item), each
    measured on the 5,000-row probe batch at sf0.1: the intermediate
    candidate distinct is gone (see _ensemble_probe_tail), and the
    batch fingerprint rows are NOT re-distinct'd — the winnow kernel's
    per-doc fps are already sorted-distinct, so (new_id, fp) is unique
    by construction and the old .distinct() was a pure extra shuffle
    stage. Together: ~1.35 s → ~0.85 s per batch. Two heavier fusions
    were built and REJECTED on measurement (r11 advice asked for the
    experiment): a single fused Arrow pass + persist cost ~1.6 s (the
    eager materialization job exceeds what the per-consumer kernel
    re-runs cost), and a collect-to-local-literals route cost ~2-3 s
    (literal-plan serialization); numbers in
    scripts/ensemble_probe_r12.json."""
    n_sh = shingle_sets(new_docs, text_col)
    n_sig = minhash_signatures(n_sh, engine="arrow")
    nb = n_sh.select(F.col("doc_id").alias("new_id"),
                     F.col("shingles").alias("sh_b"))

    from ..functions.text import winnow_fingerprints

    n_rows = (
        winnow_fingerprints(new_docs, "doc_id", text_col, k=k, w=w)
        .select(F.col("doc_id").alias("new_id"),
                F.explode_outer("fps").alias("fp"))
        .filter(F.col("fp").isNotNull())
    )
    return _ensemble_probe_tail(
        state, _banded_keys(n_sig, "new_id"), nb, n_rows,
        threshold, min_shared,
    )


def _phash_banded(hashes: DataFrame, id_alias: str,
                  hash_col: str, n_bands: int) -> DataFrame:
    """(id, hash, band, val) LSH rows for a perceptual-hash frame —
    the banding phash_near_dup_pairs and the streaming image probe
    share (56 bits in ``n_bands`` equal slices)."""
    width = 56 // n_bands
    return hashes.filter(F.col(hash_col).isNotNull()).select(
        F.col("doc_id").alias(id_alias),
        F.col(hash_col).alias(f"_h_{id_alias}"),
        F.explode(F.array(*[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright(F.col(hash_col), b * width)
                .bitwiseAND(F.lit((1 << width) - 1)).alias("val"),
            )
            for b in range(n_bands)
        ])).alias("bk"),
    ).select(id_alias, f"_h_{id_alias}", "bk.band", "bk.val")


def prepare_phash_corpus_state(hashes: DataFrame,
                               hash_col: str = "phash",
                               n_bands: int = 4,
                               persist: bool = True) -> DataFrame:
    """One-time corpus-side state for the streaming image-dedup probe:
    the banded (corpus_id, hash, band, val) rows, persisted so every
    micro-batch is a broadcast probe against executor memory instead
    of a re-banding of the whole corpus (the same hoisting contract as
    prepare_ensemble_corpus_state). Call ``.unpersist()`` when the
    stream stops."""
    state = _phash_banded(hashes, "corpus_id", hash_col, n_bands)
    if persist:
        state.persist()
    return state


def phash_cross_pairs_from_state(state: DataFrame, new_hashes: DataFrame,
                                 max_hamming: int = 3,
                                 hash_col: str = "phash",
                                 n_bands: int = 4) -> DataFrame:
    """(corpus_id, new_id, hamming) image near-dup flags for an
    arriving batch against the prepared corpus state: the batch side
    bands and BROADCASTS (bounded by the micro-batch), the corpus
    side is a cached scan, candidates dedupe per pair, and the
    bit_count(xor) verify keeps Hamming <= ``max_hamming`` — the same
    exact-at-radius-(n_bands-1) pigeonhole guarantee as
    phash_near_dup_pairs, so flags equal the batch operator's cross
    pairs (parity-pinned)."""
    nb = _phash_banded(new_hashes, "new_id", hash_col, n_bands)
    return (
        state.join(F.broadcast(nb), ["band", "val"])
        .select("corpus_id", "new_id", "_h_corpus_id", "_h_new_id")
        .distinct()
        .select(
            "corpus_id", "new_id",
            F.bit_count(
                F.col("_h_corpus_id").bitwiseXOR(F.col("_h_new_id"))
            ).cast("long").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )


def phash_component_edges(hashes: DataFrame, max_hamming: int = 3,
                          hash_col: str = "phash") -> DataFrame:
    """COMPONENT-EQUIVALENT edge set for perceptual-hash near-dup
    clustering, linear in identical-hash group size: collapse each
    distinct hash to its minimum-id representative, run the Hamming
    ball over REPRESENTATIVES only, and add one star edge per
    non-representative member (member ↔ its rep — an exact-dup edge,
    Hamming 0 by construction). Connected components over these edges
    equal components over the full phash_near_dup_pairs graph: members
    share their rep's hash, so any <= max_hamming relation a member
    has, its rep has too, and the star keeps the member attached.
    This is what the keep/ensemble queries consume at scale — the
    full pair relation stays available as phash_near_dup_pairs, whose
    output is BY DEFINITION quadratic in identical-hash group size
    (every pair is a true near-dup; see dedup_image_phash_pairs'
    docstring for the honest-answer-size discussion).

    The representatives' Hamming ball enters as per-bucket COMPONENT
    STARS from the fused verify+CC kernel (_bucket_component_stars,
    round 11): dense hash spaces make the ball quadratic (the audio
    envelope ball measured 6.5M verified pairs at 100x — the r10
    streamed-SQL verify over those buckets was ~15 s of the 44 s
    media keep), and the fused kernel keeps the whole quadratic
    candidate space inside chunked numpy popcount sweeps, emitting
    only node-linear stars. ALL dup buckets ride the one kernel —
    the r10 small/big regime split (in-row SQL emit vs streamed
    self-join) is gone from this path, so the banding shuffle is
    built ONCE instead of once per regime (the r10 advice's
    double-bucket-build), and there is no union of two branch
    pipelines for Spark to re-evaluate."""
    h = hashes.filter(F.col(hash_col).isNotNull()).select(
        F.col("doc_id"), F.col(hash_col).alias("_ph")
    )
    reps = h.groupBy("_ph").agg(F.min("doc_id").alias("rep_id"))
    star = (
        h.join(reps, "_ph")
        .filter(F.col("doc_id") != F.col("rep_id"))
        .select(F.col("rep_id").alias("id_a"),
                F.col("doc_id").alias("id_b"))
    )
    rep_hashes = reps.select(F.col("rep_id").alias("doc_id"),
                             F.col("_ph").alias(hash_col))
    members = (
        _hamming_buckets(rep_hashes, max_hamming, hash_col=hash_col)
        .select("bk", F.explode("ms").alias("m"))
        .select("bk", F.col("m._id").alias("_id"),
                F.col("m._ph").alias("_ph"))
    )
    ball = _bucket_component_stars(members, max_hamming)
    return star.unionByName(ball)


# ---------------------------------------------------------------------------
# 12. incremental EDGE maintenance (round 11): the delta form of the
#     winnow pair evidence — what keeps dedup_edge_layout honest as
#     "maintained at ingest" rather than rebuilt per corpus change.
# ---------------------------------------------------------------------------

# The winnow/video hub cap: a fingerprint (or sampled-frame hash)
# bucket above this occupancy stops contributing PAIRS. Round 12: it
# no longer RETRACTS — over-cap buckets contribute min-doc STAR edges
# to the component-consuming keep endpoints (winnow_component_edges),
# because at replication scale the >cap clusters are exactly the
# virally-copied content a curator must dedup (the r11 probe measured
# end recall 0.0004 under retraction). Pair-contract queries
# (dedup_substring_winnow, dedup_video_frames) keep the capped 2..cap
# ≥2-shared relation via winnow_edge_counts.
WINNOW_HUB_CAP = 32


def _capped_bucket_emit(ex: DataFrame,
                        cap: int = WINNOW_HUB_CAP,
                        key_cols: tuple = ("fp",)) -> DataFrame:
    """The SINGLE implementation of the hub-capped bucket emit every
    bucket-evidence consumer derives from: one groupBy on the bucket
    key (a winnow/frame fingerprint, or the LSH (band_idx, band_hash)
    pair), then per bucket either all C(k,2) pairs (occupancy 2..cap)
    or k-1 min-doc STAR edges (occupancy > cap), tagged ``is_star``.
    One row per bucket holds k sorted ids (linear — the quadratic
    emit only ever runs under the cap; star rows are k-1 by
    construction), and the CASE branches evaluate lazily per row, so
    an over-cap bucket never materializes its clique. Counts
    (winnow_edge_counts, lsh_emission_counts), component edges
    (winnow_component_edges), and the incremental maintenance deltas
    all ride this emit, so the cap and pair semantics cannot drift
    between the pair, keep, and maintenance routes."""
    buckets = (
        ex.groupBy(*key_cols)
        .agg(F.array_sort(F.collect_set("doc_id")).alias("ids"))
        .filter(F.size("ids") >= 2)
    )
    all_pairs, star = _emit_exprs("ids")
    return buckets.select(
        F.explode(
            F.when(F.size("ids") <= cap, F.expr(all_pairs))
            .otherwise(F.expr(star))
        ).alias("p"),
        (F.size("ids") > cap).alias("is_star"),
    ).select("p.id_a", "p.id_b", "is_star")


def _emit_exprs(ids_col: str) -> tuple:
    """The in-row pair/star emission SQL over a sorted bucket id
    array — the SINGLE pair of expressions _capped_bucket_emit and
    the fused delta emit (_capped_bucket_emit_delta) both build
    from, so the emission semantics cannot drift between the
    one-shot and maintenance routes."""
    all_pairs = (
        f"flatten(transform({ids_col}, (a, i) -> "
        f"transform(slice({ids_col}, i + 2, size({ids_col})), "
        f"b -> struct(a AS id_a, b AS id_b))))"
    )
    star = (
        f"transform(slice({ids_col}, 2, size({ids_col})), "
        f"b -> struct({ids_col}[0] AS id_a, b AS id_b))"
    )
    return all_pairs, star


def _capped_bucket_emit_delta(tagged: DataFrame,
                              cap: int = WINNOW_HUB_CAP,
                              key_cols: tuple = ("fp",)) -> DataFrame:
    """The FUSED delta form of the capped bucket emit (round 12 —
    halves the maintenance deltas' dominant cost): given the touched
    buckets' rows TAGGED old/new (``is_new``), aggregate each
    bucket's old id set and full (old ∪ new) id set in ONE groupBy,
    and emit BOTH variants' capped emissions from that single row —
    old contents signed s=-1, new contents s=+1 — as one concat +
    explode. Per-pair sums of ``s`` are then exactly the
    "-emissions(old) + emissions(new)" the two-pass form computed
    with two corpus-index scans and two bucket shuffles; this does
    it with one of each. Emission semantics come verbatim from
    _emit_exprs (shared with _capped_bucket_emit), with the same cap
    CASE per variant: 2..cap docs → clique pairs (st=false), > cap →
    min-doc stars (st=true), < 2 → nothing (the star transform over
    an empty slice). Returns (id_a, id_b, is_star, s)."""
    buckets = tagged.groupBy(*key_cols).agg(
        F.array_sort(
            F.collect_set(F.when(~F.col("is_new"), F.col("doc_id")))
        ).alias("ids_old"),
        F.array_sort(F.collect_set("doc_id")).alias("ids_all"),
    )

    def variant(ids_col: str, sign: int) -> str:
        pairs, star = _emit_exprs(ids_col)
        return (
            f"CASE WHEN size({ids_col}) BETWEEN 2 AND {cap} THEN "
            f"transform({pairs}, q -> struct(q.id_a AS id_a, "
            f"q.id_b AS id_b, false AS st, {sign} AS s)) "
            f"ELSE transform({star}, q -> struct(q.id_a AS id_a, "
            f"q.id_b AS id_b, true AS st, {sign} AS s)) END"
        )

    return buckets.select(
        F.explode(F.expr(
            f"concat({variant('ids_old', -1)}, {variant('ids_all', 1)})"
        )).alias("p")
    ).select("p.id_a", "p.id_b", F.col("p.st").alias("is_star"),
             F.col("p.s").alias("s"))


def winnow_edge_counts(ex: DataFrame) -> DataFrame:
    """Per-pair shared-fingerprint COUNTS from an exploded (doc_id,
    fp) winnow index — the UNFILTERED form of the span-PAIR relation:
    hub-capped bucket groupBy (2..32 docs per fingerprint, the same
    boilerplate guard every winnow pair consumer applies), in-bucket
    pair emit, grouped to (id_a, id_b, n). Over-cap buckets
    contribute NOTHING here (the pair contract); their star edges are
    winnow_component_edges' addition for keep consumers. The
    >= 2-shared-fps decision is NOT applied here because the count is
    the delta-able quantity — incremental maintenance adds and
    subtracts per-bucket emissions, and a pair can cross the
    threshold in either direction when a shard lands (see
    winnow_edges_apply_delta)."""
    pairs = _capped_bucket_emit(ex).filter(~F.col("is_star"))
    return pairs.groupBy("id_a", "id_b").agg(F.count(F.lit(1)).alias("n"))


def winnow_component_edges(ex: DataFrame, cap: int = WINNOW_HUB_CAP,
                           min_shared: int = 2) -> DataFrame:
    """COMPONENT-EQUIVALENT edge set for the winnow-shaped dedup
    signals — what the KEEP endpoints consume (round 12): the capped
    pair relation (buckets of 2..cap docs, >= ``min_shared`` shared
    fingerprints — identical to winnow_pairs_from_counts'
    (id_a, id_b) projection) UNIONED with one min-doc STAR edge per
    member of every over-cap bucket. Under retraction (the r11
    contract) a fingerprint shared by > cap docs contributed nothing,
    so a video copied 100 times — every frame bucket over the
    corpus-size-invariant cap — produced NO edges and end recall
    collapsed to ~0 at replication scale (media_probe_r11
    recall_vs_exact 0.0004). Stars keep the curator decision intact
    on exactly those viral clusters with k-1 edges instead of C(k,2):
    the keep endpoints consume connected COMPONENTS, and a star spans
    the same component the clique would. The precision trade is
    explicit and documented: docs sharing only ONE over-cap
    fingerprint now merge (under the pair contract two shared capped
    fps were required) — for span/frame signals an over-cap bucket is
    either boilerplate-so-viral-it-is-a-duplicate (merging is the
    point) or a corpus needing a larger cap; the pair queries keep
    the conservative contract. Same one-bucket-shuffle shape as the
    pair route (shared _capped_bucket_emit), one extra boolean
    through the same two shuffles."""
    em = _capped_bucket_emit(ex, cap)
    return (
        em.groupBy("id_a", "id_b")
        .agg(
            F.sum(F.when(F.col("is_star"), 0).otherwise(1)).alias("n"),
            F.max("is_star").alias("st"),
        )
        .filter((F.col("n") >= min_shared) | F.col("st"))
        .select("id_a", "id_b")
    )


def winnow_edges_apply_delta(stored_counts: DataFrame,
                             old_ex: DataFrame,
                             new_ex: DataFrame) -> DataFrame:
    """EXACT incremental maintenance of the winnow pair-evidence
    relation under a new shard — the ingest-time operation behind the
    materialized edge layout's "near-dup edges maintained at ingest"
    contract (operators/silver.dedup_edge_layout). Given the STORED
    per-pair counts for the existing corpus (winnow_edge_counts
    output — the state a production store keeps columnar), the
    existing exploded index ``old_ex`` (doc_id, fp), and the arriving
    shard's exploded fingerprints ``new_ex``, returns the updated
    (id_a, id_b, n) relation for corpus ∪ shard.

    Why a delta needs counts, not the filtered pair set: the hub cap
    makes edges NON-MONOTONE — a fingerprint bucket at 32 docs that
    gains a 33rd crosses the boilerplate cap and every pair it was
    contributing RETRACTS, while buckets rising from 1 to 2 docs
    start contributing. Bucket emissions are bucket-LOCAL though, so
    the exact update is

        n' = n  -  emissions from TOUCHED buckets under old contents
               +  emissions from touched buckets under new contents

    where touched = the shard's distinct fingerprints. Untouched
    buckets have identical contents and cap status, so their
    emissions cancel out of the subtraction by never entering it.
    Per-shard cost: two bucket emits over touched buckets only (each
    capped at C(32,2) pairs/bucket) + one outer merge against the
    stored counts — proportional to the shard's fingerprint
    footprint, never the corpus. Consumers apply the >= 2 decision
    at read (winnow_pairs_from_counts); parity with the full rebuild
    is oracle-gated end to end by dedup_edge_maintenance_winnow.

    FUSED merge (round 13, guide §2.4): the signed per-bucket
    emissions flow STRAIGHT into the stored-count merge as raw
    (id_a, id_b, ±1) contribution rows — one union + one grouped sum
    computes n' = n + Σs per pair, value-identical to aggregating
    the delta first and outer-joining it (sum is associative), but
    with ONE pair-key shuffle for the delta instead of two and no
    SortMergeJoin (interleaved A/B: 2.43 → 2.09 s min). The
    partitioned state store still uses the explicit two-step form
    (winnow_count_delta → winnow_counts_merge_delta) because it needs
    the delta RELATION itself to derive touched partitions."""
    em = _winnow_emission_rows(old_ex, new_ex)
    return (
        stored_counts.select("id_a", "id_b", "n")
        .unionByName(
            em.filter(~F.col("is_star"))
            .select("id_a", "id_b", F.col("s").cast("long").alias("n"))
        )
        .groupBy("id_a", "id_b")
        .agg(F.sum("n").alias("n"))
        .filter(F.col("n") > 0)
    )


def _winnow_emission_rows(old_ex: DataFrame, new_ex: DataFrame) -> DataFrame:
    """The signed touched-bucket emission rows (id_a, id_b, is_star,
    s) both winnow delta consumers share — the fused batch merge
    (winnow_edges_apply_delta) aggregates them together with the
    stored counts in one pass; the partitioned-store path aggregates
    them alone first (winnow_count_delta)."""
    # BROADCAST the touched-fingerprint keys: the existing index is
    # corpus-sized and must reduce to the touched buckets map-side —
    # a hash join on fp would shuffle the whole corpus index per
    # shard, which is exactly the cost class the delta avoids. The
    # key set is shard-sized (distinct fps of the arriving docs).
    # Old- and new-contents emissions come from ONE fused pass
    # (_capped_bucket_emit_delta, round 12): the two-pass form paid
    # the corpus-index scan and the bucket shuffle twice for inputs
    # differing only by the shard rows.
    touched = F.broadcast(new_ex.select("fp").distinct())
    tagged = (
        old_ex.join(touched, "fp").select("doc_id", "fp")
        .withColumn("is_new", F.lit(False))
        .unionByName(new_ex.select("doc_id", "fp")
                     .withColumn("is_new", F.lit(True)))
    )
    return _capped_bucket_emit_delta(tagged)


def winnow_count_delta(old_ex: DataFrame, new_ex: DataFrame) -> DataFrame:
    """The SIGNED per-pair count delta (id_a, id_b, dn) of
    winnow_edges_apply_delta, exposed separately (round 13) so a
    partitioned state store can derive the TOUCHED key-bucket set
    from the delta alone and read/rewrite only those partitions of
    the stored relation (streaming/maintenance.py)."""
    em = _winnow_emission_rows(old_ex, new_ex)
    return (
        em.filter(~F.col("is_star"))
        .groupBy("id_a", "id_b")
        .agg(F.sum("s").alias("dn"))
        .filter(F.col("dn") != 0)
    )


def winnow_counts_merge_delta(stored_counts: DataFrame,
                              delta: DataFrame) -> DataFrame:
    """Merge a signed (id_a, id_b, dn) delta into the stored count
    relation — the outer-merge half of winnow_edges_apply_delta. When
    the store is partitioned by pair-key bucket, ``stored_counts``
    here is only the TOUCHED partitions (every delta row's bucket is
    touched by construction, so untouched partitions cannot change).

    Implemented as UNION + one hash aggregate, not a full-outer join
    (round 13, guide §2.4): ``coalesce(n,0) + coalesce(dn,0)`` over a
    full-outer merge IS ``sum`` over the unioned contribution rows —
    value-identical for every key present in either side — and the
    aggregate form drops the join's second Exchange, both Sort legs,
    and the SortMergeJoin itself (one Exchange + HashAggregate
    instead), with map-side partial aggregation shrinking what the
    one shuffle carries. Same bytes-class at 100 TB, strictly fewer
    stages."""
    return (
        stored_counts.select("id_a", "id_b", "n")
        .unionByName(delta.select("id_a", "id_b", F.col("dn").alias("n")))
        .groupBy("id_a", "id_b")
        .agg(F.sum("n").alias("n"))
        .filter(F.col("n") > 0)
    )


def winnow_counts_merge_outer(stored_counts: DataFrame,
                              delta: DataFrame) -> DataFrame:
    """Merge a signed (id_a, id_b, dn) delta into the stored count
    relation as a FULL OUTER JOIN with coalesce-sums — the BUCKETED-
    STORE form (round 14, guide §6): when ``stored_counts`` is read
    from a table bucketed+sorted by (id_a, id_b)
    (silver._bucketed_state_layout), the join plans with NO Exchange
    and no re-sort on the stored side — only the shard-sized delta is
    shuffled, so per-batch merge cost stops scaling with the stored
    relation. Value-identical to winnow_counts_merge_delta (the
    union+aggregate form the unbucketed partitioned store keeps):
    per-key coalesce-sum over a full outer join IS the grouped sum
    over unioned contribution rows — the same associative-merge
    equivalence, applied in the direction the bucketed layout
    rewards. Pinned by test_fused_count_merges_match_two_step."""
    merged = stored_counts.select("id_a", "id_b", "n").join(
        delta.select("id_a", "id_b", "dn"), ["id_a", "id_b"], "full_outer"
    )
    return merged.select(
        "id_a",
        "id_b",
        (F.coalesce(F.col("n"), F.lit(0))
         + F.coalesce(F.col("dn"), F.lit(0))).alias("n"),
    ).filter(F.col("n") > 0)


def winnow_pairs_from_counts(counts: DataFrame,
                             min_shared: int = 2) -> DataFrame:
    """The read-side decision over the stored count relation: pairs
    sharing >= ``min_shared`` capped fingerprints — identical output
    to the one-shot pipeline's (id_a, id_b, n_shared_fps)."""
    return counts.filter(F.col("n") >= min_shared).select(
        "id_a", "id_b", F.col("n").alias("n_shared_fps")
    )


# ---------------------------------------------------------------------------
# 13. incremental MINHASH edge maintenance (round 12): the delta form
#     of the LSH candidate evidence — extends the winnow pattern (§12)
#     to the second text signal, the r11 verdict's item 4. The
#     maintained quantity is the per-pair EMISSION relation over
#     (band_idx, band_hash) buckets: a pair can be emitted by several
#     bands, so retraction needs multiplicities (the same reason the
#     winnow delta stores counts), and the 512 bucket cap switches an
#     over-cap bucket's emissions from clique to min-doc stars — both
#     tracked (n_pair, n_star) so the cap crossing is delta-exact in
#     either direction. The VERIFY stage (est prefilter + exact
#     jaccard) is pair-deterministic, so it is applied at read over
#     the maintained candidate set — never re-run for unchanged pairs'
#     sake, and the maintained relation equals the rebuild end to end
#     (shared brute-force oracle, dedup_edge_maintenance_minhash).
# ---------------------------------------------------------------------------

def lsh_emission_counts_from_keys(keys: DataFrame,
                                  max_bucket: int = DEFAULT_MAX_BUCKET,
                                  ) -> DataFrame:
    """Per-pair emission counts over banded LSH buckets from a
    (doc_id, band_idx, band_hash) key relation (``_banded_keys``
    output — in-plan or stored): the shared capped bucket emit keyed
    on the band bucket, grouped to (id_a, id_b, n_pair, n_star).
    ``n_pair`` counts in-range (2..cap) bucket cliques, ``n_star``
    over-cap star emissions — a candidate exists while either is
    positive."""
    em = _capped_bucket_emit(keys, cap=max_bucket,
                             key_cols=("band_idx", "band_hash"))
    return em.groupBy("id_a", "id_b").agg(
        F.sum(F.when(F.col("is_star"), 0).otherwise(1)).alias("n_pair"),
        F.sum(F.when(F.col("is_star"), 1).otherwise(0)).alias("n_star"),
    )


def lsh_emission_counts(signed: DataFrame,
                        max_bucket: int = DEFAULT_MAX_BUCKET) -> DataFrame:
    """lsh_emission_counts_from_keys over in-plan banding of a
    (doc_id, sig) frame — the stored state a production curator keeps
    columnar next to the signature index (materialized by
    operators/silver.minhash_emission_count_layout)."""
    return lsh_emission_counts_from_keys(
        _banded_keys(signed, "doc_id"), max_bucket
    )


def lsh_counts_apply_delta(stored_counts: DataFrame,
                           old_signed: DataFrame,
                           new_signed: DataFrame,
                           max_bucket: int = DEFAULT_MAX_BUCKET) -> DataFrame:
    """EXACT incremental maintenance of the MinHash candidate-emission
    relation under a new shard — winnow_edges_apply_delta's shape on
    the banded signal: touched buckets are the shard's distinct
    (band_idx, band_hash) keys (broadcast, so the corpus-sized key
    relation reduces map-side — never reshuffled per shard), and

        n' = n - emissions(touched buckets, old contents)
           + emissions(touched buckets, old ∪ shard contents)

    bucket-locally for BOTH count columns; untouched buckets cancel
    by never entering. Handles every non-monotone case: a bucket
    crossing the 512 cap retracts its clique and gains stars, one
    shrinking back retracts stars and regains pairs. Per-shard cost
    ∝ the shard's banded-key footprint.

    FUSED merge (round 13): raw signed emissions union with the
    stored counts into ONE grouped sum — same associative-merge
    rewrite (and evidence) as winnow_edges_apply_delta; the
    partitioned store keeps the two-step lsh_count_delta →
    lsh_counts_merge_delta form."""
    em = _lsh_emission_rows(old_signed, new_signed, max_bucket)
    z = F.lit(0).cast("long")
    s = F.col("s").cast("long")
    return (
        stored_counts.select("id_a", "id_b", "n_pair", "n_star")
        .unionByName(em.select(
            "id_a", "id_b",
            F.when(~F.col("is_star"), s).otherwise(z).alias("n_pair"),
            F.when(F.col("is_star"), s).otherwise(z).alias("n_star"),
        ))
        .groupBy("id_a", "id_b")
        .agg(F.sum("n_pair").alias("n_pair"), F.sum("n_star").alias("n_star"))
        .filter((F.col("n_pair") > 0) | (F.col("n_star") > 0))
    )


def _lsh_emission_rows(old_signed: DataFrame, new_signed: DataFrame,
                       max_bucket: int = DEFAULT_MAX_BUCKET) -> DataFrame:
    """The signed touched-bucket emission rows (id_a, id_b, is_star,
    s) both LSH delta consumers share — fused batch merge
    (lsh_counts_apply_delta) vs explicit delta (lsh_count_delta),
    mirroring _winnow_emission_rows."""
    touched = F.broadcast(
        _banded_keys(new_signed, "doc_id")
        .select("band_idx", "band_hash").distinct()
    )
    # ONE fused old/new emission pass over the touched buckets
    # (_capped_bucket_emit_delta, round 12) instead of two
    # corpus-key scans + two bucket shuffles; per-pair signed sums
    # split by the star tag reproduce both count deltas exactly.
    keep = ("doc_id", "band_idx", "band_hash")
    tagged = (
        _banded_keys(old_signed, "doc_id")
        .join(touched, ["band_idx", "band_hash"]).select(*keep)
        .withColumn("is_new", F.lit(False))
        .unionByName(_banded_keys(new_signed, "doc_id").select(*keep)
                     .withColumn("is_new", F.lit(True)))
    )
    return _capped_bucket_emit_delta(tagged, cap=max_bucket,
                                     key_cols=("band_idx", "band_hash"))


def lsh_count_delta(old_signed: DataFrame, new_signed: DataFrame,
                    max_bucket: int = DEFAULT_MAX_BUCKET) -> DataFrame:
    """The SIGNED per-pair emission delta (id_a, id_b, _dp, _ds) of
    lsh_counts_apply_delta, exposed separately (round 13) for the
    partitioned state store — same rationale as winnow_count_delta."""
    em = _lsh_emission_rows(old_signed, new_signed, max_bucket)
    z = F.lit(0)
    return (
        em.groupBy("id_a", "id_b")
        .agg(
            F.sum(F.when(~F.col("is_star"), F.col("s")).otherwise(z))
            .alias("_dp"),
            F.sum(F.when(F.col("is_star"), F.col("s")).otherwise(z))
            .alias("_ds"),
        )
        .filter((F.col("_dp") != 0) | (F.col("_ds") != 0))
    )


def lsh_counts_merge_delta(stored_counts: DataFrame,
                           delta: DataFrame) -> DataFrame:
    """Merge a signed (_dp, _ds) delta into the stored (n_pair,
    n_star) relation — the outer-merge half of lsh_counts_apply_delta
    (partitioned-store contract as winnow_counts_merge_delta, and the
    same round-13 UNION + hash-aggregate form: per-key coalesce-sums
    over a full outer join ARE sums over unioned contribution rows,
    so the join's extra Exchange/Sorts collapse into one aggregate)."""
    return (
        stored_counts.select("id_a", "id_b", "n_pair", "n_star")
        .unionByName(delta.select(
            "id_a", "id_b",
            F.col("_dp").alias("n_pair"), F.col("_ds").alias("n_star")))
        .groupBy("id_a", "id_b")
        .agg(F.sum("n_pair").alias("n_pair"), F.sum("n_star").alias("n_star"))
        .filter((F.col("n_pair") > 0) | (F.col("n_star") > 0))
    )


def lsh_counts_merge_outer(stored_counts: DataFrame,
                           delta: DataFrame) -> DataFrame:
    """winnow_counts_merge_outer's shape on the two-column MinHash
    emission state: full-outer coalesce-sum merge of a signed
    (_dp, _ds) delta into the stored (n_pair, n_star) relation — the
    bucketed-store form (round 14, guide §6; no Exchange on a stored
    side bucketed by (id_a, id_b)). Value-identical to
    lsh_counts_merge_delta by the same associative-merge equivalence;
    pinned by test_fused_count_merges_match_two_step."""
    merged = stored_counts.select("id_a", "id_b", "n_pair", "n_star").join(
        delta.select("id_a", "id_b", "_dp", "_ds"),
        ["id_a", "id_b"], "full_outer",
    )
    z = F.lit(0)
    return merged.select(
        "id_a",
        "id_b",
        (F.coalesce(F.col("n_pair"), z)
         + F.coalesce(F.col("_dp"), z)).alias("n_pair"),
        (F.coalesce(F.col("n_star"), z)
         + F.coalesce(F.col("_ds"), z)).alias("n_star"),
    ).filter((F.col("n_pair") > 0) | (F.col("n_star") > 0))


def minhash_pairs_from_counts(counts: DataFrame, index: DataFrame,
                              threshold: float = 0.6,
                              n_perm: int = N_PERM) -> DataFrame:
    """The read-side decision over the stored emission relation:
    candidates with any live emission, est-jaccard prefiltered and
    exact-verified against the signature/shingle index — identical
    output to minhash_near_dups_prepared (the one-shot pipeline),
    because candidate emission is a deterministic function of bucket
    contents and verify is pair-deterministic."""
    cands = counts.filter(
        (F.col("n_pair") > 0) | (F.col("n_star") > 0)
    ).select("id_a", "id_b")
    signed = index.select("doc_id", "sig")
    shingled = index.select("doc_id", "shingles")
    cands = estimate_jaccard(cands, signed, n_perm=n_perm).filter(
        F.col("est_jac") >= threshold - 0.2
    )
    return verify_pairs(cands, shingled, threshold)


# ---------------------------------------------------------------------------
# 14. STAR-state maintenance (round 12): the delta form of the
#     over-cap star edges the keep endpoints consume since the
#     cap-star change — completing the "maintained at ingest" story
#     for the component-edge layout: pair evidence deltas via counts
#     (§12/§13), star evidence via per-fingerprint occupancy state.
# ---------------------------------------------------------------------------

def winnow_star_state(ex: DataFrame) -> DataFrame:
    """Per-fingerprint occupancy state (fp, c, rep): bucket size and
    minimum doc id — ONE row per distinct fingerprint (an aggregate
    of the stored inverted index, strictly smaller than it), from
    which the over-cap star edges derive at read. Map-side
    combinable; the rep is the component representative
    winnow_component_edges' stars use."""
    return ex.groupBy("fp").agg(
        F.count(F.lit(1)).alias("c"),
        F.min("doc_id").alias("rep"),
    )


def winnow_star_state_apply_delta(stored: DataFrame,
                                  new_ex: DataFrame) -> DataFrame:
    """EXACT incremental maintenance of the occupancy state under an
    arriving shard (documents only ever ARRIVE in this model — the
    same append-corpus premise as every maintenance operator here):
    merge the shard's per-fp (count, min) into the stored state —
    c' = c + c_shard, rep' = least(rep, rep_shard). Both column
    updates are associative/commutative aggregates, so the merge is
    one shard-footprint-sized full-outer join; no corpus rescan, and
    a bucket crossing the cap in either direction is just c' moving
    past the threshold at read time."""
    # UNION + aggregate, not a full-outer join (round 13): both state
    # columns are associative merges (sum / min), so the join form's
    # coalesce-sum and least() per key equal one grouped aggregate
    # over the unioned rows — fewer stages, same relation (see
    # winnow_counts_merge_delta).
    return (
        stored.select("fp", "c", "rep")
        .unionByName(winnow_star_state(new_ex))
        .groupBy("fp")
        .agg(F.sum("c").alias("c"), F.min("rep").alias("rep"))
    )


def winnow_stars_from_state(state: DataFrame, ex: DataFrame,
                            cap: int = WINNOW_HUB_CAP) -> DataFrame:
    """The read-side star derivation: over-cap fingerprints from the
    maintained occupancy state (broadcast — the over-cap set is tiny
    by the boilerplate premise), joined against the stored inverted
    index to emit one rep→member edge per over-cap membership.
    DISTINCT because one doc pair can share several over-cap
    fingerprints. Identical to winnow_component_edges' star half by
    construction (same rep = bucket minimum, same cap test)."""
    over = F.broadcast(
        state.filter(F.col("c") > cap).select("fp", "rep")
    )
    return (
        ex.join(over, "fp")
        .filter(F.col("doc_id") != F.col("rep"))
        .select(F.col("rep").alias("id_a"), F.col("doc_id").alias("id_b"))
        .distinct()
    )


# ---------------------------------------------------------------------------
# 15. incremental HAMMING-BALL edge maintenance (round 12): the delta
#     form of the media component-edge signals (iph/afp) — completing
#     "maintained at ingest" for all five partitions of the edge
#     layout. Unlike the capped winnow/LSH signals the ball relation
#     is MONOTONE (no hub cap on the exact-radius banding: docs only
#     arrive, edges only appear), so the delta is purely ADDITIVE —
#     no counts, no retraction — and the maintained state is the edge
#     relation itself plus the per-hash representative table.
# ---------------------------------------------------------------------------

def phash_reps_apply_delta(stored_reps: DataFrame,
                           new_hashes: DataFrame,
                           hash_col: str = "phash") -> DataFrame:
    """EXACT incremental maintenance of the per-hash representative
    table (hv, rep_id) under an arriving shard: merge the shard's
    per-hash minimum into the stored state — rep' = least(rep,
    rep_shard). Same associative-merge shape as
    winnow_star_state_apply_delta: one shard-footprint-sized
    full-outer join, no corpus rescan. NOTE the EDGE delta below
    deliberately attaches new members to the OLD rep even when a new
    doc id undercuts it (components are unchanged either way and the
    old rep's star edges stay valid); this table is the canonical
    min for read-side consumers that want the true representative."""
    # UNION + min aggregate, not a full-outer join (round 13): the rep
    # merge is associative, so least() over the outer join equals one
    # grouped min over unioned rows — see winnow_counts_merge_delta.
    sh = (
        new_hashes.filter(F.col(hash_col).isNotNull())
        .select(F.col(hash_col).alias("hv"), F.col("doc_id").alias("rep_id"))
    )
    return (
        stored_reps.select("hv", "rep_id")
        .unionByName(sh)
        .groupBy("hv")
        .agg(F.min("rep_id").alias("rep_id"))
    )


def phash_edges_apply_delta(stored_edges: DataFrame,
                            stored_reps: DataFrame,
                            new_hashes: DataFrame,
                            max_hamming: int = 3,
                            hash_col: str = "phash") -> DataFrame:
    """COMPONENT-EXACT incremental maintenance of a Hamming-ball
    dedup signal (the edge layout's ``iph``/``afp`` partitions) under
    an arriving shard — the media analogue of winnow_edges_apply_delta
    (the r11 verdict's "touched-ball re-sweep"). Input state is what
    a production media store keeps columnar: the component-equivalent
    edge relation (phash_component_edges output) and the per-hash
    representative table (hv, rep_id). Returns the edge relation for
    corpus ∪ shard; connected components over it EQUAL components
    over the full rebuild (gate: dedup_edge_maintenance_phash /
    _audio share the keep endpoints' recursive-CTE oracles verbatim).

    The delta is additive because the exact-radius banding has no hub
    cap (no retraction regime), in four shard-proportional pieces:

    - ATTACH: a new doc whose hash is already indexed gains one star
      edge to the STORED rep (Hamming 0). Components match the
      rebuild even when the new doc id undercuts the stored rep —
      the rebuild would star the other direction, same component.
    - NEW-REP STARS: previously-unseen hashes elect the shard-minimum
      doc as rep; other shard docs with the same hash star onto it.
    - TOUCHED-BALL PROBE: each new rep must connect to every OLD rep
      within the radius. Banding is EXACT at radius <= n_bands-1
      (pigeonhole), so candidates = old reps sharing >= 1 band key
      with a new rep: the shard reps' band keys BROADCAST against
      the in-plan banded projection of the stored rep table — the
      corpus side is scanned map-side (narrow projection + explode,
      no shuffle, no bucket materialization), survivors verify by
      popcount. This is the touched-ball re-sweep: only balls a new
      rep lands in are ever examined.
    - SHARD-INTERNAL BALL: new reps vs new reps, a shard-sized
      band-key self-join.

    Component-equality argument: every rebuild near-dup pair (u, v)
    is connected in the maintained graph — u to rep(h_u) by an
    attach/new-rep star, rep(h_u) to rep(h_v) by a stored ball edge
    (both old), a probe edge (one new), or a shard-internal edge
    (both new); conversely every emitted edge joins true near-dups
    (Hamming 0 or <= radius), so the maintained components neither
    split nor over-merge the rebuild's. Per-shard cost: broadcast
    joins against the rep table and its banded projection (map-side
    corpus scans, zero corpus shuffles) + shard-sized aggregations —
    proportional to the shard and the touched balls, never the
    corpus pair structure.

    PRECONDITION (append-only shards): ``new_hashes`` doc_ids are
    expected to be NEW to the store — the batch analogue of the
    versioned-commit replay protection the streamed winnow/minhash
    paths get for free. Replaying an already-stored doc stays
    component-correct (its attach edge re-lands on the same rep;
    a stored-rep doc's would-be self-loop is filtered below) but
    duplicates accumulate in the additive edge relation until the
    read side's distinct — callers replaying at-least-once delivery
    should dedup the shard against stored membership first, or ride
    the versioned ingest sink that already guarantees it."""
    # PERSIST the two shard-sized frames every downstream branch
    # re-derives (round 13, guide §2.4/§5): ``newh`` feeds the attach
    # build, the anti-join, and (via nreps) both banded probes, and
    # each of the ~5 BroadcastExchange builds below is a separate job
    # that would otherwise re-execute the shard scan subtree from the
    # source — measured 1.84 s (noop) to emit 209 delta edges at
    # bench scale, dominated by exactly that re-execution. Both
    # frames are shard-sized by construction (the delta premise), so
    # the cache is KBs; this is intra-query reuse, same pattern as
    # minhash_near_dups' shingle persist.
    newh = _persist_released_on_gc(
        new_hashes.filter(F.col(hash_col).isNotNull())
        .select("doc_id", F.col(hash_col).alias("hv"))
    )
    hit = stored_reps.join(F.broadcast(newh), "hv")
    attach = hit.filter(F.col("rep_id") != F.col("doc_id")).select(
        F.col("rep_id").alias("id_a"), F.col("doc_id").alias("id_b")
    )
    matched = F.broadcast(hit.select("hv").distinct())
    unmatched = newh.join(matched, "hv", "left_anti")
    nreps = _persist_released_on_gc(
        unmatched.groupBy("hv").agg(F.min("doc_id").alias("rep_id"))
    )
    nstar = (
        unmatched.join(F.broadcast(nreps), "hv")
        .filter(F.col("doc_id") != F.col("rep_id"))
        .select(F.col("rep_id").alias("id_a"),
                F.col("doc_id").alias("id_b"))
    )
    as_hashes = lambda reps: reps.select(  # noqa: E731
        F.col("rep_id").alias("doc_id"), F.col("hv").alias(hash_col)
    )
    oldk = _banded_key_rows(as_hashes(stored_reps), max_hamming,
                            hash_col=hash_col)
    newk = _banded_key_rows(as_hashes(nreps), max_hamming,
                            hash_col=hash_col)
    ham = F.bit_count(F.col("_ph").bitwiseXOR(F.col("_nph")))
    probe = (
        oldk.join(
            F.broadcast(newk.select(
                "bk", F.col("_id").alias("_nid"),
                F.col("_ph").alias("_nph"),
            )),
            "bk",
        )
        .filter(ham <= max_hamming)
        .select(F.least("_id", "_nid").alias("id_a"),
                F.greatest("_id", "_nid").alias("id_b"))
        .distinct()
    )
    selfb = (
        newk.join(
            newk.select("bk", F.col("_id").alias("_nid"),
                        F.col("_ph").alias("_nph")),
            "bk",
        )
        .filter((F.col("_id") < F.col("_nid")) & (ham <= max_hamming))
        .select(F.col("_id").alias("id_a"), F.col("_nid").alias("id_b"))
        .distinct()
    )
    delta = attach.unionByName(nstar).unionByName(probe).unionByName(selfb)
    return stored_edges.unionByName(delta)
