"""Arrow-batched (pandas_udf) vector kernels — the Python-side twin of
functions/vectors.py, for stages where the interpreted JVM
higher-order-function fold is the measured bottleneck.

NO ``from __future__ import annotations`` here: pandas_udf resolves its
return type from the REAL evaluated hints, and stringified hints break
that resolution (documented Spark pitfall).

Determinism contract: ``dot_arrow`` accumulates LEFT-TO-RIGHT over the
dimension axis in float64 — one vectorized numpy add per dimension —
which performs the exact same FP operation sequence per pair as the
JVM ``aggregate(zip_with(...))`` fold and as the DuckDB oracle's
``list_sum`` (also an ordered fold). The three engines therefore agree
bit-for-bit, so swapping this kernel in or out of a hash-gated query
cannot flip a 4-decimal rounding. (``np.einsum``/``np.dot`` would be
faster but use pairwise/blocked summation — a different FP order.)
"""

import numpy as np
import pandas as pd

from pyspark.sql import Column
from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def _dot_fold(va: pd.Series, vb: pd.Series) -> pd.Series:
    if len(va) == 0:
        return pd.Series(np.zeros(0))
    a = np.stack(va.to_numpy()).astype(np.float64, copy=False)
    b = np.stack(vb.to_numpy()).astype(np.float64, copy=False)
    acc = np.zeros(a.shape[0])
    for j in range(a.shape[1]):  # left-to-right: fold-identical
        acc += a[:, j] * b[:, j]
    return pd.Series(acc)


def dot_arrow(a: Column, b: Column) -> Column:
    """Arrow-batched ordered-fold dot product: bit-identical to
    functions/vectors.dot, evaluated in numpy over Arrow record
    batches instead of the JVM HOF interpreter. Worth it only when
    the per-pair fold dominates the stage (measured: ~break-even at
    sf0.1 local where serialization competes with idle cores — see
    README 'JVM vs Arrow' for the measured trade at 1x and 30x).

    Precondition: both inputs are NON-NULL, fixed-dimension float
    arrays (what every embedding pipeline here feeds it — vectors are
    required columns of the embeddings table). A NULL vector raises
    in np.stack and fails the task, where the JVM HOF fold would
    yield NULL for that row; callers with nullable vectors must
    filter first. Keeping the kernel null-free is what lets it stay
    one vectorized add per dimension."""
    return _dot_fold(a, b)


def cell_prefilter_pairs(assigned, threshold, id_col="vec_id",
                         vec_col="embedding", nrm_col="nrm",
                         cell_col="cell", block_rows=2048):
    """Per-cell BLAS candidate prefilter for the IVF embedding dedup:
    one fp64 GEMM per cell scores EVERY intra-cell pair at once and
    keeps those whose cosine clears ``threshold`` minus a conservative
    guard; the canonical JVM ordered-fold verify then re-scores only
    the survivors, so the final output is value-identical to verifying
    every candidate (_verify_cosine_pairs is unchanged downstream).

    Why this beats the candidate-join shape at scale: the old verify
    joined each (id_a, id_b) candidate to BOTH full vectors — shuffle
    and fold work proportional to CANDIDATE volume (n·cell_size). Here
    the vectors move once, grouped by cell (volume n·n_assign rows),
    and the pair space is scored inside BLAS at memory-bandwidth
    speed; what reaches the join machinery afterwards is only the
    ~answer-sized survivor set.

    Guard derivation: a pair passes the final filter iff
    round(fold_cos, 4) >= t, and for t on the 1e-4 grid that is
    fold_cos >= t - 0.5e-4 (Spark HALF_UP). The GEMM dot differs from
    the ordered fold only in summation order — |blas - fold| <=
    d·eps·|x||y| ~ 1e-14 for 64-dim unit-scale vectors — so keeping
    blas_cos >= t - 0.5e-4 - 1e-9 can drop no true pair. False
    positives in the guard band are discarded by the exact re-verify.

    The GEMM is row-blocked (``block_rows``) so a skewed cell costs
    bounded memory (block x cell score matrix), and positions are
    mapped to ids with min/max so id_a < id_b holds regardless of
    intra-cell order. Precondition (same as dot_arrow): vectors are
    non-null fixed-dimension arrays.
    """
    thr = float(threshold) - 0.5e-4 - 1e-9

    def emit(pdf):
        m = len(pdf)
        if m < 2:
            return pd.DataFrame({"id_a": np.zeros(0, np.int64),
                                 "id_b": np.zeros(0, np.int64)})
        x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
        nr = pdf[nrm_col].to_numpy().astype(np.float64)
        ids = pdf[id_col].to_numpy().astype(np.int64)
        a_out, b_out = [], []
        cols = np.arange(m)
        for s in range(0, m, block_rows):
            e = min(s + block_rows, m)
            scores = (x[s:e] @ x.T) / np.outer(nr[s:e], nr)
            mask = scores >= thr
            # strict upper triangle in GLOBAL row order: j > i
            mask &= cols[None, :] > (np.arange(s, e))[:, None]
            ri, ci = np.nonzero(mask)
            ia, ib = ids[ri + s], ids[ci]
            a_out.append(np.minimum(ia, ib))
            b_out.append(np.maximum(ia, ib))
        return pd.DataFrame({"id_a": np.concatenate(a_out),
                             "id_b": np.concatenate(b_out)})

    return (
        assigned.select(cell_col, id_col, vec_col, nrm_col)
        .groupBy(cell_col)
        .applyInPandas(emit, "id_a long, id_b long")
        .distinct()
    )
