"""Streaming EDGE-STATE maintenance (round 12) — the delta operators
wired into the ingest path, making the edge layout's "maintained at
ingest" contract literal: each arriving micro-batch of documents
fingerprints itself (the batched Arrow winnow kernel), applies the
winnow pair-count delta against the stored state
(operators/dedup.winnow_edges_apply_delta — touched buckets only),
and commits a NEW VERSION of the count relation plus its own
partition of the growing inverted index.

Exactly-once contract (the same at-least-once-replay reality every
foreachBatch sink here handles): all writes are keyed by batch_id —
the index partition is a per-batch overwrite, and the counts land in
a fresh ``counts_v{batch_id}`` directory computed from
``counts_v{latest < batch_id}``, so replaying a crashed micro-batch
recomputes and overwrites ITS version from its unchanged predecessor
instead of double-applying the delta. Readers take the newest version
bearing a _SUCCESS marker, so a partially-written version is never
visible. This is a minimal MVCC pattern (the txn.py commit-log
stance); a production store would garbage-collect old versions.

Scale: per micro-batch the work is the shard's Arrow fingerprint
kernel + the fused touched-bucket delta (one corpus-index scan
map-side reduced by the broadcast touched set, one bucket shuffle
bounded by the shard footprint) + a dup-sized full-outer merge —
never a corpus rebuild. Parity with the batch rebuild is pinned by
tests/test_streaming.py (final streamed state == winnow_edge_counts
over the whole corpus, and == the one-shot delta pipeline)."""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from .dedup import DOCS_SCHEMA

_COUNTS_SCHEMA = "id_a LONG, id_b LONG, n LONG"
_INDEX_SCHEMA = "doc_id LONG, fp LONG"


def _batch_winnow_index(batch: DataFrame, k: int, w: int) -> DataFrame:
    """The arriving shard's exploded (doc_id, fp) winnow index — the
    same derivation as operators/silver.winnow_fp_layout (explode +
    null filter over the Arrow kernel's per-doc fingerprint sets), so
    streamed state is value-comparable with the batch layouts."""
    from ..functions.text import winnow_fingerprints

    fps = winnow_fingerprints(batch.dropDuplicates(), "doc_id", "text",
                              k=k, w=w)
    return (
        fps.select("doc_id", F.explode_outer("fps").alias("fp"))
        .filter(F.col("fp").isNotNull())
    )


def _count_versions(state_dir: str, before: int | None = None,
                    prefix: str = "counts_v") -> list:
    """Committed (has _SUCCESS) count versions, ascending; optionally
    only those < ``before`` (a replaying batch must read its
    predecessor, never its own partial write)."""
    out = []
    for d in glob.glob(os.path.join(state_dir, prefix + "*")):
        if not os.path.exists(os.path.join(d, "_SUCCESS")):
            continue
        v = int(os.path.basename(d)[len(prefix):])
        if before is None or v < before:
            out.append(v)
    return sorted(out)


def read_edge_counts(spark: SparkSession, state_dir: str,
                     before: int | None = None) -> DataFrame:
    """The newest COMMITTED version of the maintained count relation
    (empty frame when no version exists yet)."""
    vs = _count_versions(state_dir, before)
    if not vs:
        return spark.createDataFrame([], _COUNTS_SCHEMA)
    return spark.read.parquet(
        os.path.join(state_dir, f"counts_v{vs[-1]:09d}"))


def _stored_index(spark: SparkSession, state_dir: str,
                  before: int) -> DataFrame:
    """Index partitions committed by batches < ``before`` (the corpus
    as of this batch's predecessor)."""
    idx_dir = os.path.join(state_dir, "winnow_idx")
    parts = glob.glob(os.path.join(idx_dir, "batch_id=*"))
    if not parts:
        return spark.createDataFrame([], _INDEX_SCHEMA)
    return (
        spark.read.option("basePath", idx_dir).parquet(idx_dir)
        .filter(F.col("batch_id") < before)
        .select("doc_id", "fp")
    )


def apply_maintenance_batch(spark: SparkSession, batch: DataFrame,
                            batch_id: int, state_dir: str,
                            k: int = 20, w: int = 8) -> None:
    """One micro-batch of streamed edge maintenance — versioned and
    replay-idempotent (module docstring has the commit protocol)."""
    from ..operators.dedup import winnow_edges_apply_delta

    new_ex = _batch_winnow_index(batch, k, w)
    old_ex = _stored_index(spark, state_dir, batch_id)
    stored = read_edge_counts(spark, state_dir, before=batch_id)
    updated = winnow_edges_apply_delta(stored, old_ex, new_ex)
    updated.write.mode("overwrite").parquet(
        os.path.join(state_dir, f"counts_v{batch_id:09d}"))
    new_ex.write.mode("overwrite").parquet(
        os.path.join(state_dir, "winnow_idx", f"batch_id={batch_id}"))


def start_edge_maintenance_stream(
    spark: SparkSession,
    source_dir: str,
    state_dir: str,
    k: int = 20,
    w: int = 8,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """File-stream documents from ``source_dir`` and maintain the
    winnow edge-count state under ``state_dir`` batch by batch."""
    reader = spark.readStream.schema(DOCS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir)

    def step(batch: DataFrame, batch_id: int) -> None:
        apply_maintenance_batch(spark, batch, batch_id, state_dir, k, w)

    return (
        stream.writeStream.foreachBatch(step)
        .option("checkpointLocation", os.path.join(state_dir, "_ckpt/maint"))
        .trigger(availableNow=True)
        .start()
    )


_MH_COUNTS_SCHEMA = "id_a LONG, id_b LONG, n_pair LONG, n_star LONG"


def read_mh_counts(spark: SparkSession, state_dir: str,
                   before: int | None = None) -> DataFrame:
    """Newest committed version of the maintained MinHash emission
    counts (the ``mh_counts_v*`` relation; empty frame before the
    first commit)."""
    vs = _count_versions(state_dir, before,
                         prefix="mh_counts_v")
    if not vs:
        return spark.createDataFrame([], _MH_COUNTS_SCHEMA)
    return spark.read.parquet(
        os.path.join(state_dir, f"mh_counts_v{vs[-1]:09d}"))


def _stored_signatures(spark: SparkSession, state_dir: str,
                       before: int) -> DataFrame:
    """Signature partitions committed by batches < ``before``."""
    idx_dir = os.path.join(state_dir, "mh_idx")
    parts = glob.glob(os.path.join(idx_dir, "batch_id=*"))
    if not parts:
        from pyspark.sql.types import (
            ArrayType, LongType, StructField, StructType,
        )

        return spark.createDataFrame([], StructType([
            StructField("doc_id", LongType()),
            StructField("sig", ArrayType(LongType())),
        ]))
    return (
        spark.read.option("basePath", idx_dir).parquet(idx_dir)
        .filter(F.col("batch_id") < before)
        .select("doc_id", "sig")
    )


def apply_mh_maintenance_batch(spark: SparkSession, batch: DataFrame,
                               batch_id: int, state_dir: str) -> None:
    """One micro-batch of streamed MINHASH candidate maintenance —
    the second text signal riding the identical versioned commit
    protocol (module docstring): the shard signs itself (the same
    shuffle-free signature derivation the batch index layout uses),
    lsh_counts_apply_delta folds its touched banded buckets into the
    stored (n_pair, n_star) relation, and both the new count version
    and the shard's signature partition land batch-id-keyed."""
    from ..operators.dedup import (
        lsh_counts_apply_delta,
        minhash_signatures,
        shingle_sets,
    )

    new_sig = minhash_signatures(
        shingle_sets(batch.dropDuplicates())
    ).select("doc_id", "sig")
    old_sig = _stored_signatures(spark, state_dir, batch_id)
    stored = read_mh_counts(spark, state_dir, before=batch_id)
    updated = lsh_counts_apply_delta(stored, old_sig, new_sig)
    updated.write.mode("overwrite").parquet(
        os.path.join(state_dir, f"mh_counts_v{batch_id:09d}"))
    new_sig.write.mode("overwrite").parquet(
        os.path.join(state_dir, "mh_idx", f"batch_id={batch_id}"))


def start_mh_maintenance_stream(
    spark: SparkSession,
    source_dir: str,
    state_dir: str,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """File-stream documents and maintain the MinHash candidate-count
    state under ``state_dir`` batch by batch."""
    reader = spark.readStream.schema(DOCS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir)

    def step(batch: DataFrame, batch_id: int) -> None:
        apply_mh_maintenance_batch(spark, batch, batch_id, state_dir)

    return (
        stream.writeStream.foreachBatch(step)
        .option("checkpointLocation",
                os.path.join(state_dir, "_ckpt/mh_maint"))
        .trigger(availableNow=True)
        .start()
    )
