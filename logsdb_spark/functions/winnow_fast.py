"""Vectorized winnowing-fingerprint kernel (Arrow ``mapInPandas``).

Rounds 5-9 computed winnow fingerprints JVM-side: one md5 + hex→dec
``conv`` per character k-gram through a let-bound higher-order
function.  Correct and scan-local, but the md5-per-gram constant was
the single largest scale cost in the repo — at 100x data the winnow
extraction stage was 82 s of an 82 s query (scripts/probe100_r9.json).

This module replaces the per-gram digest with a polynomial rolling
hash computed ONCE over each Arrow batch:

    H(g) = (((0*B + c_0)*B + c_1)...*B + c_{k-1})  mod 2^64, masked
    to 62 bits (B = 1000003; c_i = unicode code points of the
    normalized text).  uint64 wraparound IS the mod, and the 62-bit
    mask keeps every fingerprint positive, so signed BIGINT min/sort
    order is identical across Spark, numpy, and DuckDB — the oracle
    re-derives the same values HUGEINT-side as
    ``list_reduce(list_prepend(0, codes), (a,b) -> (a*B + b) % 2^64)
    % 2^62`` (see the winnow oracles in plans/extensions.py).

The kernel is batched across documents, not per-document: every text
in the Arrow batch is concatenated into one code-point array, the k
shifted multiply-adds and the w-1 shifted minima run over the whole
concatenation (window positions that would cross a document boundary
are simply never sliced into a document's valid range), and the
per-document distinct+sort is one global lexsort + boundary diff.
Per-batch cost is ~k+w vector ops + one sort, independent of document
count — no per-row Python in the hot loop.

Semantics are EXACTLY the previous operator's (same normalization,
same short-document degradations), only the hash family changed:
  - docs shorter than k chars yield ONE gram = the whole text;
  - fewer than w gram hashes yield ONE window = min over all hashes;
  - fingerprint set is distinct + ascending per document;
  - null text yields null fps.

NOTE: no ``from __future__ import annotations`` here — pandas_udf /
mapInPandas type handling must see real objects, not string hints.
"""

import re

import numpy as np
import pandas as pd

POLY_B = 1000003
_MASK62 = np.uint64((1 << 62) - 1)
_B = np.uint64(POLY_B)

# Java regex \s is ASCII-only ([ \t\n\x0B\f\r]); re.ASCII makes
# Python's \s the same set, so normalization here is byte-identical
# to F.lower(F.trim(F.regexp_replace(c, r"\s+", " "))) on the JVM
# and lower(trim(regexp_replace(t,'\s+',' ','g'))) in DuckDB.
_WS = re.compile(r"\s+", re.ASCII)


def normalize_py(t):
    """Python mirror of functions.text.normalize_text."""
    return _WS.sub(" ", t).strip(" ").lower()


def winnow_fps_py(text, k, w):
    """Scalar reference implementation (tests + short-doc fallback).

    Returns the sorted distinct fingerprint list for one document, or
    None for null text.
    """
    if text is None:
        return None
    t = normalize_py(text)
    grams = [t[i:i + k] for i in range(len(t) - k + 1)] if len(t) >= k else [t]
    hs = []
    for g in grams:
        acc = 0
        for ch in g:
            acc = (acc * POLY_B + ord(ch)) % (1 << 64)
        hs.append(acc & int(_MASK62))
    if len(hs) < w:
        mins = [min(hs)]
    else:
        mins = [min(hs[j:j + w]) for j in range(len(hs) - w + 1)]
    return sorted(set(mins))


def _batch_fps(texts, k, w):
    """Vectorized fingerprints for a list of (possibly-None) texts.

    Returns a list aligned with ``texts``: each entry an ascending
    int64 numpy array, or None for null input.
    """
    norm = [None if t is None else normalize_py(t) for t in texts]
    # Split out the degenerate docs (None / shorter than k+w-1, where
    # the window lattice has fallbacks) — scalar path, rare by data.
    out = [None] * len(norm)
    idx, bufs, lens = [], [], []
    for i, t in enumerate(norm):
        if t is None:
            continue
        if len(t) < k + w - 1:
            out[i] = np.asarray(winnow_fps_py(texts[i], k, w), dtype=np.int64)
            continue
        idx.append(i)
        b = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32)
        bufs.append(b)
        lens.append(len(b))
    if not idx:
        return out

    codes = np.concatenate(bufs).astype(np.uint64)
    lens = np.asarray(lens, dtype=np.int64)
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    total = codes.size

    with np.errstate(over="ignore"):
        # k-gram rolling hash over the whole concatenation: H[p] is
        # the hash of codes[p:p+k]. Positions crossing a doc boundary
        # are computed but never selected below.
        n_pos = total - k + 1
        H = np.zeros(n_pos, dtype=np.uint64)
        pw = np.uint64(1)
        for j in range(k - 1, -1, -1):
            H += codes[j:j + n_pos] * pw
            pw = pw * _B
        H &= _MASK62
        # w-window minima over the whole hash array: M[p] = min of
        # H[p:p+w]; again sliced per-doc to valid ranges only.
        n_win = n_pos - w + 1
        M = H[:n_win].copy()
        for s in range(1, w):
            np.minimum(M, H[s:s + n_win], out=M)

    # Per-doc valid window-min range: [start, start + len - k - w + 2)
    # (every doc here has len >= k+w-1, so the range is non-empty).
    counts = lens - (k - 1) - (w - 1)
    doc_of = np.repeat(np.arange(len(idx)), counts)
    pos = np.concatenate([
        np.arange(s, s + c) for s, c in zip(starts, counts)
    ])
    mins = M[pos]

    # Batched per-doc distinct+sort: lexsort by (doc, fp), drop
    # adjacent duplicates, split at doc boundaries. Fingerprints are
    # 62-bit positive, so unsigned sort order == signed BIGINT order.
    order = np.lexsort((mins, doc_of))
    sm = mins[order]
    sd = doc_of[order]
    keep = np.ones(sm.size, dtype=bool)
    keep[1:] = (sm[1:] != sm[:-1]) | (sd[1:] != sd[:-1])
    sm = sm[keep].astype(np.int64)
    sd = sd[keep]
    splits = np.searchsorted(sd, np.arange(1, len(idx)))
    for i, arr in zip(idx, np.split(sm, splits)):
        out[i] = arr
    return out


def winnow_fingerprints_fast(df, id_col, text_col, k=5, w=4):
    """(id_col, fps array<long>) winnowing fingerprints via the
    batched Arrow kernel. Drop-in for the former JVM md5 form —
    same output shape, new (portable, documented) hash family."""
    out_schema = "{} long, fps array<long>".format(id_col)

    def gen(batches):
        for pdf in batches:
            fps = _batch_fps(list(pdf[text_col]), k, w)
            yield pd.DataFrame({
                id_col: pdf[id_col].values,
                "fps": fps,
            })

    return df.select(id_col, text_col).mapInPandas(gen, schema=out_schema)
