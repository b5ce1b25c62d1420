"""Vectorized winnowing-fingerprint kernel (Arrow ``mapInArrow``).

Rounds 5-9 computed winnow fingerprints JVM-side: one md5 + hex→dec
``conv`` per character k-gram through a let-bound higher-order
function.  Correct and scan-local, but the md5-per-gram constant was
the single largest scale cost in the repo — at 100x data the winnow
extraction stage was 82 s of an 82 s query (scripts/probe100_r9.json).

Round 10 replaced the per-gram digest with a polynomial rolling hash
computed ONCE over each Arrow batch:

    H(g) = (((0*B + c_0)*B + c_1)...*B + c_{k-1})  mod 2^64, masked
    to 62 bits (B = 1000003; c_i = unicode code points of the
    normalized text).  uint64 wraparound IS the mod, and the 62-bit
    mask keeps every fingerprint positive, so signed BIGINT min/sort
    order is identical across Spark, numpy, and DuckDB — the oracle
    re-derives the same values HUGEINT-side as
    ``list_reduce(list_prepend(0, codes), (a,b) -> (a*B + b) % 2^64)
    % 2^62`` (see the winnow oracles in plans/extensions.py).

Round 11 rebuilt the OUTPUT half after profiling the r10 kernel's
small-scale regression (bench winnow_fingerprint 0.28 s → 0.43 s):
the hashing was ~30 ms but the global lexsort (176 ms), the np.split
into one small numpy array per document (230 ms), and the
pandas-object-column → Arrow list conversion dominated. Now:

  - window minima are gathered DOC-CONTIGUOUS with one cumsum-delta
    trick (no per-doc arange), so each document's fingerprint run is
    a contiguous slice;
  - per-document sort is an in-place ``.sort()`` on each slice
    (microseconds per doc) instead of one 1.4M-row two-key lexsort;
  - dedup is one vectorized adjacent-diff with segment starts forced
    kept, counted per doc by ``np.add.reduceat``;
  - the operator yields pyarrow RecordBatches via ``mapInArrow``,
    building the fps column as ONE ``pa.ListArray.from_arrays``
    (values + offsets + null mask) — zero per-document Python and no
    pandas round trip.

Semantics are EXACTLY the r10 operator's (same normalization, same
hash family, same short-document degradations):
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


def _batch_fps_flat(texts, k, w):
    """Vectorized fingerprints for a list of (possibly-None) texts in
    FLAT list-array form: (values int64, offsets int64 of len n+1,
    isnull bool of len n) — doc i's ascending distinct fingerprints
    are values[offsets[i]:offsets[i+1]], null docs flagged. This is
    the Arrow list-column layout, built without any per-document
    array objects."""
    norm = [None if t is None else normalize_py(t) for t in texts]
    n = len(norm)
    lengths = np.zeros(n, dtype=np.int64)
    isnull = np.zeros(n, dtype=bool)
    short = {}
    idx, bufs, lens = [], [], []
    for i, t in enumerate(norm):
        if t is None:
            isnull[i] = True
            continue
        if len(t) < k + w - 1:
            # degenerate window lattice — scalar path, rare by data
            short[i] = np.asarray(winnow_fps_py(texts[i], k, w),
                                  dtype=np.int64)
            lengths[i] = short[i].size
            continue
        idx.append(i)
        bufs.append(np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32))
        lens.append(len(bufs[-1]))

    vals_main = np.empty(0, dtype=np.int64)
    kept_per_doc = np.empty(0, dtype=np.int64)
    if idx:
        codes = np.concatenate(bufs).astype(np.uint64)
        lens = np.asarray(lens, dtype=np.int64)
        starts_c = np.concatenate(([0], np.cumsum(lens)[:-1]))
        total = codes.size
        with np.errstate(over="ignore"):
            # k-gram rolling hash over the whole concatenation: H[p]
            # is the hash of codes[p:p+k]. Positions crossing a doc
            # boundary are computed but never gathered below.
            n_pos = total - k + 1
            H = np.zeros(n_pos, dtype=np.uint64)
            pw = np.uint64(1)
            for j in range(k - 1, -1, -1):
                H += codes[j:j + n_pos] * pw
                pw = pw * _B
            H &= _MASK62
            # w-window minima: M[p] = min of H[p:p+w]
            n_win = n_pos - w + 1
            M = H[:n_win].copy()
            for s in range(1, w):
                np.minimum(M, H[s:s + n_win], out=M)
        # Per-doc valid window-min range: [starts_c[d], starts_c[d] +
        # counts[d]) — gathered DOC-CONTIGUOUS via one cumsum of a
        # delta vector (1 within a doc, jump at each doc start): no
        # per-doc arange, no np.concatenate of 5k slices.
        counts = lens - (k + w - 2)
        seg_starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
        m_total = int(counts.sum())
        pos = np.ones(m_total, dtype=np.int64)
        pos[0] = starts_c[0]
        pos[seg_starts[1:]] = (starts_c[1:]
                               - (starts_c[:-1] + counts[:-1]) + 1)
        pos = np.cumsum(pos)
        mins = M[pos]
        # In-place per-segment sort (docs are contiguous): thousands
        # of microsecond sorts beat one multi-key lexsort ~10x here.
        bounds = np.concatenate((seg_starts, [m_total]))
        for d in range(len(idx)):
            mins[bounds[d]:bounds[d + 1]].sort()
        # Vectorized distinct: adjacent diff with doc starts forced.
        keep = np.ones(m_total, dtype=bool)
        keep[1:] = mins[1:] != mins[:-1]
        keep[seg_starts] = True
        kept_per_doc = np.add.reduceat(keep, bounds[:-1]).astype(np.int64)
        vals_main = mins[keep].astype(np.int64)
        lengths[np.asarray(idx, dtype=np.int64)] = kept_per_doc

    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    values = np.empty(int(offsets[-1]), dtype=np.int64)
    ptr = 0
    for i in range(n):
        ln = lengths[i]
        if isnull[i] or ln == 0:
            continue
        sh = short.get(i)
        if sh is not None:
            values[offsets[i]:offsets[i] + ln] = sh
        else:
            values[offsets[i]:offsets[i] + ln] = vals_main[ptr:ptr + ln]
            ptr += ln
    return values, offsets, isnull


def _batch_fps(texts, k, w):
    """Per-document view of _batch_fps_flat (tests + streaming-side
    callers that want one array per doc): list aligned with ``texts``
    — ascending int64 numpy array per doc, None for null input."""
    values, offsets, isnull = _batch_fps_flat(texts, k, w)
    return [
        None if isnull[i] else values[offsets[i]:offsets[i + 1]]
        for i in range(len(texts))
    ]


def winnow_fingerprints_fast(df, id_col, text_col, k=5, w=4):
    """(id_col, fps array<long>) winnowing fingerprints via the
    batched Arrow kernel — ``mapInArrow``, so the fps list column is
    assembled as one pa.ListArray from the kernel's flat
    values/offsets/null-mask with no pandas round trip and no
    per-document Python objects."""
    import pyarrow as pa

    out_schema = "{} long, fps array<long>".format(id_col)

    def gen(batches):
        for rb in batches:
            # id column passes through ZERO-COPY (it is already the
            # right Arrow type); only the text column — which the
            # kernel genuinely needs as Python strings for the
            # normalization regex — is materialized.
            texts = rb.column(rb.schema.get_field_index(text_col)).to_pylist()
            values, offsets, isnull = _batch_fps_flat(texts, k, w)
            fps = pa.ListArray.from_arrays(
                pa.array(offsets, type=pa.int32()),
                pa.array(values, type=pa.int64()),
                mask=pa.array(isnull),
            )
            yield pa.RecordBatch.from_arrays(
                [rb.column(rb.schema.get_field_index(id_col)), fps],
                [id_col, "fps"],
            )

    return df.select(id_col, text_col).mapInArrow(gen, schema=out_schema)
