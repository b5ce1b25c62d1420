"""Distributed BPE tokenizer training — *[extension]* (SURVEY §2.12),
the canonical LLM-pipeline operator on top of the corpus vocabulary
head (plans/extensions.corpus_vocab_topk): K byte-pair-encoding merge
rounds (Sennrich et al., public literature) as an iterative DataFrame
loop.

Scale shape — why this is the 100 TB form: BPE trains on the WORD
FREQUENCY table, not the corpus. The one corpus-sized operation is
the word-count aggregation (map-side combinable, one shuffle keyed by
word — the same shape as corpus_vocab_topk); every merge round then
runs over the vocab-sized table: one pair-count aggregation (explode
of per-word adjacent pairs, weighted by word frequency, map-side
combinable) and ONE collected row (the argmax pair — the round's
global decision, inherently driver-sized like a k-means centroid
update). The re-segmentation is a broadcast-literal string replace,
no shuffle. K rounds = K vocab-sized jobs + K one-row collects.

Representation: a word's segmentation is ONE string of wrapped
tokens — ``low`` → ``<l><o><w><_>`` (``_`` the end-of-word marker) —
so "merge pair (a, b)" is literally ``replace(seg, '<a><b>',
'<ab>')``: leftmost non-overlapping replacement, which is exactly
BPE's one-pass merge semantics, and IDENTICAL across Spark
(Java String.replace), DuckDB (replace), and Python (str.replace) —
what makes the K-round oracle replay engine-exact. Wrapper chars
``< >`` and the marker ``_`` are disjoint from token characters by
the normalization contract (lowercased word characters).

Determinism: ties on the pair count break lexicographically on
(left_tok, right_tok) — pinned against a reference Python BPE by
tests/test_tokenizer.py and against the DuckDB replay by the
registered oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BPE_MERGES_SCHEMA = ("round long, left_tok string, right_tok string, "
                     "pair_count long")


def initial_segmentation(words: DataFrame, word_col: str = "w",
                         count_col: str = "cnt") -> DataFrame:
    """(word, count) → (w, seg, cnt): each character wrapped, plus
    the end-of-word marker token ``_``. The word rides along so the
    trained segmentation can be joined back to the corpus
    (tokenizer_bpe_encode)."""
    seg = F.concat(
        F.regexp_replace(F.col(word_col), "(.)", "<$1>"), F.lit("<_>")
    )
    return words.select(
        F.col(word_col).alias("w"), seg.alias("seg"),
        F.col(count_col).alias("cnt"),
    )


def _adjacent_pairs(seg_col) -> "F.Column":
    """Adjacent token pairs of a wrapped segmentation string, as an
    array of (a, b) structs — empty for single-token words (guarded:
    F.sequence is bidirectional, so an unguarded size-1 case would
    yield a descending range, not an empty one)."""
    t = F.split(seg_col.substr(F.lit(2), F.length(seg_col) - 2), "><")
    pairs = F.transform(
        F.sequence(F.lit(1), F.size(t) - 1),
        lambda i: F.struct(
            F.element_at(t, i).alias("a"),
            F.element_at(t, i + 1).alias("b"),
        ),
    )
    return F.when(F.size(t) >= 2, pairs).otherwise(
        F.array().cast("array<struct<a:string,b:string>>")
    )


# Vocabularies at or below this row count train DRIVER-LOCALLY (the
# tiny regime): K distributed rounds cost K job launches + K one-row
# collects (~0.25 s each at local scale — a pure fixed floor when the
# vocab is thousands of rows), while the reference list-scan BPE
# finishes the whole fit in milliseconds. Outputs are IDENTICAL by
# construction (same counts, same tie-break, same leftmost
# non-overlapping merge — the equality is what tests/test_tokenizer.py
# pins), so the cutover is pure physics, the same precedent as
# connected_components' tiny in-kernel regime. At 100 TB vocabularies
# (hundreds of millions of words) the distributed loop is the path.
BPE_LOCAL_VOCAB_MAX = 65536


def bpe_merge_rounds(spark: SparkSession, words: DataFrame,
                     n_merges: int = 8,
                     local_vocab_max: int = BPE_LOCAL_VOCAB_MAX
                     ) -> DataFrame:
    """K BPE merge rounds over a (w, cnt) word-frequency table →
    (round, left_tok, right_tok, pair_count), one row per learned
    merge in training order. Each round: weighted adjacent-pair
    counts over the current segmentations (one map-side-combinable
    aggregation), deterministic argmax (count DESC, then
    lexicographic), broadcast-literal re-segmentation. The vocab
    frame is localCheckpointed once so the K count jobs re-evaluate
    only the (cheap, expression-level) replace chain, never the
    corpus aggregation upstream. Stops early if no pair remains
    (fully merged vocabulary). Small vocabularies fit driver-side
    (see BPE_LOCAL_VOCAB_MAX)."""
    merges, _ = _run_merges(spark, words, n_merges, local_vocab_max)
    return spark.createDataFrame(merges, BPE_MERGES_SCHEMA)


def _collect_vocab_if_tiny(words: DataFrame, local_vocab_max: int):
    """dict(word -> count) when the vocab is within the tiny regime,
    else None. One count job decides; the collect is bounded by the
    threshold."""
    if local_vocab_max <= 0:
        return None
    head = words.limit(local_vocab_max + 1).collect()
    if len(head) > local_vocab_max:
        return None
    return {r[0]: int(r[1]) for r in head}


def _run_merges(spark: SparkSession, words: DataFrame, n_merges: int,
                local_vocab_max: int = BPE_LOCAL_VOCAB_MAX):
    """Shared training loop: returns (merge list, final (w, seg, cnt)
    frame or local dict) — the merge list feeds bpe_merge_rounds, the
    final segmentation feeds the corpus encode. ``final`` is a
    DataFrame on the distributed path and a {word: [tokens]} dict on
    the tiny-vocab local path."""
    wc = _collect_vocab_if_tiny(words, local_vocab_max)
    if wc is not None:
        merges, segs = _reference_merges_with_segs(wc, n_merges)
        return merges, segs
    cur = initial_segmentation(words).localCheckpoint()
    merges = []
    for rnd in range(1, n_merges + 1):
        counts = (
            cur.select(F.explode(_adjacent_pairs(F.col("seg"))).alias("p"),
                       "cnt")
            .groupBy("p.a", "p.b")
            .agg(F.sum("cnt").alias("c"))
        )
        best = counts.orderBy(F.desc("c"), "a", "b").limit(1).collect()
        if not best:
            break
        a, b, c = best[0].a, best[0].b, int(best[0].c)
        merges.append((rnd, a, b, c))
        cur = cur.select(
            "w",
            F.replace(F.col("seg"), F.lit(f"<{a}><{b}>"),
                      F.lit(f"<{a}{b}>")).alias("seg"),
            "cnt",
        )
    return merges, cur


def bpe_vocab_token_counts(spark: SparkSession, words: DataFrame,
                           n_merges: int = 8,
                           local_vocab_max: int = BPE_LOCAL_VOCAB_MAX
                           ) -> DataFrame:
    """Train K merges, then return (w, n_tok) — each vocabulary
    word's token count under the learned tokenizer (the wrapped-token
    segmentation's length). The corpus ENCODE is then a dictionary
    join: docs explode to words, words look up n_tok — the standard
    deployment shape (the trained segmentation table broadcasts; the
    corpus is never re-segmented per document)."""
    _, final = _run_merges(spark, words, n_merges, local_vocab_max)
    if isinstance(final, dict):
        return spark.createDataFrame(
            [(w, len(t)) for w, t in sorted(final.items())],
            "w string, n_tok long",
        )
    toks = F.split(
        F.col("seg").substr(F.lit(2), F.length("seg") - 2), "><"
    )
    return final.select("w", F.size(toks).cast("long").alias("n_tok"))


def _reference_merges_with_segs(word_counts: dict, n_merges: int):
    """The list-scan BPE fit: (merge list, final {word: [tokens]}).
    Both the tiny-vocab production path (_run_merges' local regime)
    and the test oracle (bpe_merges_reference) ride this one
    implementation; the distributed loop is pinned EQUAL to it by
    tests/test_tokenizer.py (which forces local_vocab_max=0)."""
    segs = {w: [*w, "_"] for w in word_counts}
    out = []
    for rnd in range(1, n_merges + 1):
        counts: dict = {}
        for w, toks in segs.items():
            for i in range(len(toks) - 1):
                p = (toks[i], toks[i + 1])
                counts[p] = counts.get(p, 0) + word_counts[w]
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), c = best
        out.append((rnd, a, b, c))
        for w, toks in segs.items():
            merged, i = [], 0
            while i < len(toks):
                if (i + 1 < len(toks) and toks[i] == a
                        and toks[i + 1] == b):
                    merged.append(a + b)
                    i += 2
                else:
                    merged.append(toks[i])
                    i += 1
            segs[w] = merged
    return out, segs


def bpe_merges_reference(word_counts: dict, n_merges: int = 8) -> list:
    """Plain-Python reference BPE (test oracle): explicit list-based
    pair counting and leftmost non-overlapping merge — deliberately
    NOT the string-replace trick, so the pytest parity is between two
    independent formulations of the same algorithm."""
    return _reference_merges_with_segs(word_counts, n_merges)[0]
