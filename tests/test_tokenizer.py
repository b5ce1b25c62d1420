"""BPE tokenizer-training tests (round 12): the distributed merge
loop pinned against an independent plain-Python reference BPE
(explicit list-scan merges, no string-replace trick), plus the
representation/determinism contracts."""

from pyspark.sql import functions as F

from logsdb_spark.operators.tokenizer import (
    bpe_merge_rounds,
    bpe_merges_reference,
    initial_segmentation,
)


def _spark_merges(spark, word_counts, k, local_vocab_max=0):
    """local_vocab_max=0 FORCES the distributed loop — the parity
    tests must pin the DataFrame implementation, not the tiny-vocab
    local regime (which IS the reference implementation); the
    dedicated cutover test covers the default routing."""
    words = spark.createDataFrame(
        list(word_counts.items()), "w string, cnt long"
    )
    return [
        (r.round, r.left_tok, r.right_tok, r.pair_count)
        for r in bpe_merge_rounds(spark, words, n_merges=k,
                                  local_vocab_max=local_vocab_max)
        .orderBy("round").collect()
    ]


def test_bpe_matches_reference_classic(spark):
    """The Sennrich et al. worked example shape: low/lower/newest/
    widest frequencies — merge order and counts must equal the
    reference implementation exactly."""
    wc = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    assert _spark_merges(spark, wc, 8) == bpe_merges_reference(wc, 8)


def test_bpe_matches_reference_overlap_and_ties(spark):
    """Adversarial cases: runs of one character (leftmost
    non-overlapping merge semantics — 'aaaa' merges to two 'aa', not
    three), and exact count ties (lexicographic tie-break)."""
    wc = {"aaaa": 3, "aaa": 2, "bc": 5, "bd": 5, "cd": 5}
    assert _spark_merges(spark, wc, 10) == bpe_merges_reference(wc, 10)


def test_bpe_early_stop_fully_merged(spark):
    """A vocabulary that collapses before K rounds: both sides stop
    at the same round (no phantom merges)."""
    wc = {"ab": 4}
    got = _spark_merges(spark, wc, 8)
    want = bpe_merges_reference(wc, 8)
    assert got == want
    # 'ab' -> a,b,_ : merges (a,b) then (ab,_) then nothing
    assert len(got) == 2


def test_bpe_merge_spans_word_frequencies(spark):
    """Counts are WEIGHTED by word frequency, not distinct-word
    presence: a pair in one frequent word must beat a pair present
    in several rare words."""
    wc = {"xy": 10, "za": 1, "zb": 1, "zc": 1}
    merges = _spark_merges(spark, wc, 1)
    assert merges == [(1, "x", "y", 10)]


def test_initial_segmentation_wraps_and_marks(spark):
    df = spark.createDataFrame([("low", 7)], "w string, cnt long")
    row = initial_segmentation(df).collect()[0]
    assert row.seg == "<l><o><w><_>" and row.cnt == 7


def test_bpe_tiny_vocab_cutover_equals_distributed(spark):
    """The tiny-vocab local regime (default routing — the registered
    query's path on the fixture corpora) must return exactly what the
    distributed loop returns, merges AND dictionary."""
    from logsdb_spark.operators.tokenizer import bpe_vocab_token_counts

    wc = {"low": 5, "lower": 2, "newest": 6, "widest": 3, "aaaa": 4}
    local = _spark_merges(spark, wc, 8, local_vocab_max=65536)
    dist = _spark_merges(spark, wc, 8, local_vocab_max=0)
    assert local == dist and local

    words = spark.createDataFrame(list(wc.items()), "w string, cnt long")
    d_local = {r.w: r.n_tok for r in bpe_vocab_token_counts(
        spark, words, 8).collect()}
    d_dist = {r.w: r.n_tok for r in bpe_vocab_token_counts(
        spark, words, 8, local_vocab_max=0).collect()}
    assert d_local == d_dist


def test_bpe_vocab_token_counts_match_reference_segs(spark):
    """The deployment dictionary (word -> token count under the
    trained tokenizer) must equal the reference implementation's
    final segmentation lengths."""
    from logsdb_spark.operators.tokenizer import bpe_vocab_token_counts

    wc = {"low": 5, "lower": 2, "newest": 6, "widest": 3, "a": 1}
    words = spark.createDataFrame(list(wc.items()), "w string, cnt long")
    got = {r.w: r.n_tok
           for r in bpe_vocab_token_counts(spark, words, 6,
                                           local_vocab_max=0).collect()}

    # reference: replay merges on list segmentations
    segs = {w: [*w, "_"] for w in wc}
    for _, a, b, _c in bpe_merges_reference(wc, 6):
        for w, toks in segs.items():
            merged, i = [], 0
            while i < len(toks):
                if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                    merged.append(a + b)
                    i += 2
                else:
                    merged.append(toks[i])
                    i += 1
            segs[w] = merged
    want = {w: len(t) for w, t in segs.items()}
    assert got == want, (got, want)


def test_bpe_merged_token_participates_next_round(spark):
    """A learned merge token must be pairable in later rounds (the
    segmentation actually advances): 'abc' x 9 learns (a,b) then
    (ab,c) — the second merge's left token IS the first merge."""
    wc = {"abc": 9}
    got = _spark_merges(spark, wc, 2)
    assert got == [(1, "a", "b", 9), (2, "ab", "c", 9)]
