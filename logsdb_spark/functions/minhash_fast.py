"""Vectorized MinHash signature kernel (Arrow ``mapInPandas``) — the
STREAMING-side twin of operators/dedup.minhash_signatures.

Which form wins is a partitioning question, measured both ways in
round 10:

- CORPUS-wide pipelines (dedup_minhash_lsh, the index layouts) scan
  parquet with enough splits to saturate every core; there the
  interpreted JVM fold is compute-bound and CHEAPER than shipping the
  per-shingle hash arrays through Arrow (100x probe: 10.3 s JVM vs
  13.6 s kernel warm). The JVM form stays their default.
- STREAMING micro-batches and incremental shards arrive as 1-4
  partitions; the interpreted fold runs serially there (measured:
  a 5,000-row batch spent 38 s in the from-raw probe) while this
  kernel's numpy reduction is vectorized PER CORE (same batch: ~4 s).
  The streaming/incremental probes pass ``engine="arrow"``.

The kernel keeps the hashing JVM-side — ``xxhash64 & M31`` has no
numpy twin — and moves only the permute-and-min to numpy: per Arrow
batch, all documents' 31-bit shingle hashes are concatenated, each
permutation block is one broadcasted multiply-add + mask (products
< 2^62, uint64 exact; the mask equals the JVM bitwiseAND), and
per-document minima come from ``np.minimum.reduceat``. Signatures are
INTEGER-IDENTICAL to the JVM form, including the null/empty-shingle
degenerations (pinned by tests/test_winnow_kernel.py::
test_minhash_kernel_matches_jvm), so banding, layouts, and oracles
never see which engine ran.

NOTE: no ``from __future__ import annotations`` here (pandas_udf /
mapInPandas type handling needs real objects).
"""

import numpy as np
import pandas as pd

_M31 = np.uint64((1 << 31) - 1)
# cap each perm-block x hash-chunk working set at ~64 MB of uint64
_CHUNK_HASHES = 131072


def sig_batch(h31_arrays, a_consts, b_consts):
    """Signatures for a batch of per-doc 31-bit hash arrays.

    Returns a list aligned with the input: each entry a list of
    n_perm int minima. Null or empty hash arrays yield
    ``[None]*n_perm`` — exactly the JVM form's value (the outer
    transform over the constants array is non-null either way, and
    array_min is null per permutation on a null/empty inner array).
    """
    n_perm = len(a_consts)
    A = np.asarray(a_consts, dtype=np.uint64)[:, None]
    B = np.asarray(b_consts, dtype=np.uint64)[:, None]
    out = [None] * len(h31_arrays)
    idx, bufs, lens = [], [], []
    for i, h in enumerate(h31_arrays):
        if h is None:
            out[i] = [None] * n_perm
            continue
        arr = np.asarray(h, dtype=np.uint64)
        if arr.size == 0:
            out[i] = [None] * n_perm
            continue
        idx.append(i)
        bufs.append(arr)
        lens.append(arr.size)
    if not idx:
        return out

    # chunk documents so each (n_perm x hashes) block stays bounded
    start_doc = 0
    while start_doc < len(idx):
        end_doc = start_doc
        total = 0
        while end_doc < len(idx) and (total == 0
                                      or total + lens[end_doc]
                                      <= _CHUNK_HASHES):
            total += lens[end_doc]
            end_doc += 1
        h = np.concatenate(bufs[start_doc:end_doc])
        seg = np.asarray(lens[start_doc:end_doc], dtype=np.intp)
        starts = np.zeros(seg.size, dtype=np.intp)
        np.cumsum(seg[:-1], out=starts[1:])
        M = (h[None, :] * A + B) & _M31
        mins = np.minimum.reduceat(M, starts, axis=1)  # (n_perm, docs)
        mins = mins.astype(np.int64)
        for j in range(end_doc - start_doc):
            out[idx[start_doc + j]] = mins[:, j].tolist()
        start_doc = end_doc
    return out


def minhash_sigs_fast(hashed, a_consts, b_consts, keep_shingles):
    """(doc_id[, shingles], sig) from a (doc_id[, shingles], h31)
    frame — the Arrow half of minhash_signatures(engine="arrow")."""
    cols = "doc_id long, " + (
        "shingles array<string>, " if keep_shingles else ""
    ) + "sig array<long>"

    def gen(batches):
        for pdf in batches:
            sigs = sig_batch(list(pdf["h31"]), a_consts, b_consts)
            data = {"doc_id": pdf["doc_id"].values}
            if keep_shingles:
                data["shingles"] = pdf["shingles"]
            data["sig"] = sigs
            yield pd.DataFrame(data)

    return hashed.mapInPandas(gen, schema=cols)

