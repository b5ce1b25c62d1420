"""Differential tests for the batched winnow rolling-hash kernel
(functions/winnow_fast.py): the vectorized batch path must equal the
scalar reference on every edge class, and the Spark operator must
round-trip the kernel's values through Arrow unchanged."""

from __future__ import annotations

import random
import string

from logsdb_spark.functions.winnow_fast import (
    _batch_fps,
    winnow_fps_py,
)

EDGE_TEXTS = [
    None,
    "a",
    "short",
    "  Multiple   spaces\tand\nnewlines  ",
    "x" * 26,   # == k+w-2 for (20,8): scalar fallback path
    "x" * 27,   # == k+w-1: smallest vectorized doc
    "hello world " * 30,
    "abc" * 7,  # repeated content -> duplicate fingerprints collapse
]


def _random_texts(n: int, seed: int = 7) -> list:
    rng = random.Random(seed)
    alphabet = string.ascii_letters + "  \t,.0123456789"
    return [
        "".join(rng.choice(alphabet)
                for _ in range(rng.choice((5, 20, 27, 50, 300, 2000))))
        for _ in range(n)
    ]


def test_batch_matches_scalar_reference():
    texts = EDGE_TEXTS + _random_texts(60)
    for k, w in ((5, 4), (20, 8)):
        got = _batch_fps(texts, k, w)
        for t, g in zip(texts, got):
            want = winnow_fps_py(t, k, w)
            have = None if g is None else [int(x) for x in g]
            assert have == want, (k, w, repr(t)[:60])


def test_fps_sorted_distinct_positive():
    for k, w in ((5, 4), (20, 8)):
        for fps in _batch_fps(_random_texts(30, seed=11), k, w):
            lst = [int(x) for x in fps]
            assert lst == sorted(set(lst))
            assert all(0 <= v < (1 << 62) for v in lst)


def test_spark_operator_roundtrip(spark):
    from logsdb_spark.functions.text import winnow_fingerprints

    texts = EDGE_TEXTS + _random_texts(20, seed=3)
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = {r.doc_id: r.fps
            for r in winnow_fingerprints(df, "doc_id", "text",
                                         k=20, w=8).collect()}
    for i, t in enumerate(texts):
        assert rows[i] == winnow_fps_py(t, 20, 8), repr(t)[:60]


def test_minhash_kernel_matches_jvm(spark):
    """minhash_signatures(engine="arrow") must be INTEGER-IDENTICAL
    to the default JVM fold, including the null/empty-shingle
    degenerations — which engine runs is pure physics (see the
    operator docstring), never visible in values."""
    from logsdb_spark.catalog import load_table
    from logsdb_spark.operators.dedup import (
        minhash_signatures,
        shingle_sets,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    sh = shingle_sets(docs)
    for ks in (False, True):
        a = sorted((r.doc_id, tuple(r.sig))
                   for r in minhash_signatures(
                       sh, keep_shingles=ks, engine="arrow").collect())
        b = sorted((r.doc_id, tuple(r.sig))
                   for r in minhash_signatures(
                       sh, keep_shingles=ks, engine="jvm").collect())
        assert a == b and a

    edge = spark.createDataFrame(
        [(0, None), (1, []), (2, ["x"]), (3, ["a", "b", "a"])],
        "doc_id long, shingles array<string>",
    )
    a = {r.doc_id: r.sig
         for r in minhash_signatures(edge, engine="arrow").collect()}
    b = {r.doc_id: r.sig
         for r in minhash_signatures(edge, engine="jvm").collect()}
    assert a == b
