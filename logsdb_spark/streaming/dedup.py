"""Streaming deduplication: exactly-once semantics on top of an
at-least-once upstream.

The reference's ingest is at-least-once by construction — a crash
mid-stream exits after some rows committed and the operator re-runs
the whole input (SURVEY §2.10; apache_access.py:143 halt semantics).
The batch dedup family (operators/dedup.py) removes duplicates at
rest; this module removes them in flight, which is what a 100 TB
pipeline actually wants: state is bounded by the watermark horizon
instead of growing with the corpus.

``dropDuplicatesWithinWatermark`` keeps one row per key and expires a
key's state once the event-time watermark passes its last-seen
timestamp + the watermark delay — i.e., "a duplicate can arrive at
most <delay> after the original". That bound is the knob: state size
= keys seen within one delay horizon, not all keys ever.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from .aggregates import read_events_stream


def dedup_events(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Drop re-delivered events by event_id, with dedup state expiring
    one watermark-delay after each key's event time."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def start_dedup_stream(
    spark: SparkSession,
    source_dir: str,
    out_dir: str,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """availableNow run: at-least-once parquet source → watermarked
    dedup → append sink. Checkpointed, so duplicates arriving in a
    LATER run (within the watermark horizon) are also dropped — the
    dedup state lives in the checkpoint, not the session."""
    events = read_events_stream(spark, source_dir, max_files_per_trigger)
    out = dedup_events(events)
    return (
        out.writeStream.outputMode("append")
        .format("parquet")
        .option("path", os.path.join(out_dir, "deduped"))
        .option("checkpointLocation", os.path.join(out_dir, "_ckpt/deduped"))
        .trigger(availableNow=True)
        .start()
    )


DOCS_SCHEMA = "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG"


def start_neardup_stream(
    spark: SparkSession,
    corpus: DataFrame,
    source_dir: str,
    out_dir: str,
    threshold: float = 0.6,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """Streaming NEAR-dup flagging: each arriving micro-batch of
    documents is probed against the STATIC corpus with the
    broadcast-LSH incremental operator
    (operators/dedup.minhash_near_dups_incremental) inside
    ``foreachBatch``, and flagged (corpus_id, new_id, jac) pairs are
    appended to a parquet sink.

    This is the in-flight counterpart of the batch
    ``dedup_incremental_batch`` query and the near-dup analogue of
    start_dedup_stream's exact-key dedup: production ingest dedups
    arriving shards against the existing corpus BEFORE they land, and
    the asymmetric probe is what makes that affordable — the corpus
    is never shuffled (its banded signature keys are probed map-side;
    at steady state they'd be precomputed columnar), state does not
    grow with the stream (foreachBatch recomputes only the shard
    side), and exactly-once delivery of the flag records comes from
    the checkpointed batch ids plus a write that is IDEMPOTENT PER
    BATCH: foreachBatch is at-least-once (a crash between the sink
    write and the checkpoint commit replays the micro-batch), so each
    batch writes its own ``batch_id=<id>`` partition directory with
    mode("overwrite") — a replay overwrites the same directory with
    the same deterministic rows instead of appending them twice
    (see _write_probe_batch). Readers of the sink get a batch_id
    partition column for free. Why foreachBatch and not a
    stream-static join: candidate generation needs the banded-key
    EXPLODE + distinct + verify join chain, which is a multi-stage
    batch plan per shard, exactly what foreachBatch exists for."""
    reader = spark.readStream.schema(DOCS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir)

    sink = os.path.join(out_dir, "neardups")

    def probe(batch: DataFrame, batch_id: int) -> None:
        _write_probe_batch(corpus, batch, batch_id, sink, threshold)

    return (
        stream.writeStream.foreachBatch(probe)
        .option("checkpointLocation", os.path.join(out_dir, "_ckpt/neardups"))
        .trigger(availableNow=True)
        .start()
    )


def _write_probe_batch(corpus: DataFrame, batch: DataFrame, batch_id: int,
                       sink: str, threshold: float) -> None:
    """One micro-batch of the near-dup probe, written idempotently:
    the flag rows land in ``<sink>/batch_id=<id>/`` with
    mode("overwrite"), so Structured Streaming's at-least-once replay
    of a micro-batch (crash after write, before checkpoint commit)
    rewrites the SAME directory with the SAME deterministic rows —
    observable output is exactly-once. Module-level (not a closure)
    so the replay contract is directly testable: calling this twice
    with one batch_id must equal calling it once.

    The batch is exact-DISTINCT'd before the probe (round 11): an
    at-least-once upstream re-delivers identical rows inside a batch
    (source replays, retried producers), and since the flag relation
    is a DISTINCT pair set, identical input rows cannot change the
    output — dropping them BEFORE the per-row kernels (shingle/hash)
    instead of letting their duplicates die in the candidate
    distinct is the difference between probing arrivals and probing
    unique documents."""
    from ..operators.dedup import minhash_near_dups_incremental

    (
        minhash_near_dups_incremental(corpus, batch.dropDuplicates(),
                                      threshold=threshold)
        .write.mode("overwrite")
        .parquet(os.path.join(sink, f"batch_id={batch_id}"))
    )


def start_ensemble_stream(
    spark: SparkSession,
    corpus: DataFrame,
    source_dir: str,
    out_dir: str,
    threshold: float = 0.6,
    max_files_per_trigger: int | None = None,
    indexes: tuple[DataFrame, DataFrame] | None = None,
    state=None,
) -> StreamingQuery:
    """Streaming MULTI-SIGNAL dedup flagging — the in-flight form of
    dedup_ensemble_keep's edge generation: each arriving micro-batch
    is probed against the static corpus for BOTH bag-of-words
    (MinHash-LSH) and verbatim-run (winnowing span) evidence, and the
    unioned (corpus_id, new_id) flags land idempotently per batch
    (same exactly-once contract as start_neardup_stream's
    _write_probe_batch). Both probes broadcast only the shard side —
    at steady state the corpus's minhash bands AND winnow fingerprint
    index are precomputed columnar, so each micro-batch is two
    map-side probes plus the candidate verify joins. Output is
    invariant under shard boundaries (each signal probes the STATIC
    corpus only; the winnow hub cap counts corpus occupancy — see
    operators/dedup.winnow_cross_pairs), pinned against the batch
    ensemble edges by tests/test_streaming.py.

    ``indexes`` = (minhash index (doc_id, shingles, sig), winnow
    fingerprint index (doc_id, fp)) — pass the materialized layouts
    (operators/silver.{minhash_index_layout,winnow_fp_layout}) to run
    the probe in its production steady state: the corpus evidence
    sides become pure stored-state scans instead of per-batch
    normalize/tokenize/hash chains (round 9; value-identical,
    parity-pinned). Round 10 hoists the batch-INVARIANT halves of
    that plan out of the per-batch loop entirely: the banded corpus
    keys, the shingle verify side, and the hub-capped fingerprint
    rows are derived ONCE at stream start and persisted
    (operators/dedup.prepare_ensemble_corpus_state), so a micro-batch
    runs only batch-side scan-local compute + broadcast probes
    against cached frames — the r9 probe re-ran two corpus-wide
    shuffles (fp distinct + occupancy groupBy) every batch. The
    cached state lives for the stream's lifetime; long-lived callers
    can ``.unpersist()`` the three frames after stopping.

    ``state`` (round 11) — an ALREADY-PREPARED corpus state tuple
    from prepare_ensemble_corpus_state: a deployment that keeps the
    probe stream up across shard arrivals builds the state once when
    the corpus (or its indexes) change, not per stream start, so
    passing it here means stream start does zero corpus-side work
    and every micro-batch — including the first — runs at steady
    state. Takes precedence over ``indexes`` (which builds the state
    at start and eagerly materializes it, so batch 1 is not the one
    paying the two corpus shuffles)."""
    reader = spark.readStream.schema(DOCS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir)

    sink = os.path.join(out_dir, "ensemble_flags")

    if state is None and indexes is not None:
        from ..operators.dedup import prepare_ensemble_corpus_state

        state = prepare_ensemble_corpus_state(indexes[0], indexes[1])
        for frame in state:
            frame.count()

    def probe(batch: DataFrame, batch_id: int) -> None:
        _write_ensemble_batch(corpus, batch, batch_id, sink, threshold,
                              state=state)

    return (
        stream.writeStream.foreachBatch(probe)
        .option("checkpointLocation", os.path.join(out_dir, "_ckpt/ensemble"))
        .trigger(availableNow=True)
        .start()
    )


def _write_ensemble_batch(corpus: DataFrame, batch: DataFrame,
                          batch_id: int, sink: str,
                          threshold: float,
                          state=None) -> None:
    """Idempotent per-batch write of the two-signal probe (same
    contract as _write_probe_batch). With ``state`` (the persisted
    corpus derivations from prepare_ensemble_corpus_state) the batch
    plan is only batch-side compute + broadcast probes (see
    start_ensemble_stream)."""
    from ..operators.dedup import (
        ensemble_near_dups_from_state,
        ensemble_near_dups_incremental,
    )

    # exact-duplicate arrivals cannot change the distinct flag set —
    # drop them before the signature/fingerprint kernels (see
    # _write_probe_batch's contract note). localCheckpoint (round 14,
    # guide §2.4/§5): the probe tail references the batch in THREE
    # broadcast builds (band keys, shingle verify side, fingerprint
    # rows), and Spark shares no subtrees across broadcast jobs — so
    # the batch scan AND the dropDuplicates shuffle re-ran once per
    # build. One eager micro-job materializes the deduped batch
    # (shard-sized by construction); every build then reads it from
    # executor memory. The checkpointed blocks are released when the
    # batch frame is GC'd at foreachBatch exit.
    batch = batch.dropDuplicates().localCheckpoint()
    if state is not None:
        flags = ensemble_near_dups_from_state(
            state, batch, threshold=threshold
        )
    else:
        flags = ensemble_near_dups_incremental(
            corpus, batch, threshold=threshold
        )
    flags.write.mode("overwrite").parquet(
        os.path.join(sink, f"batch_id={batch_id}")
    )


BLOBS_SCHEMA = "doc_id LONG, payload BINARY"


def start_image_neardup_stream(
    spark: SparkSession,
    corpus_blobs: DataFrame,
    source_dir: str,
    out_dir: str,
    max_hamming: int = 3,
    max_files_per_trigger: int | None = None,
    state: DataFrame | None = None,
) -> StreamingQuery:
    """Streaming IMAGE-content dedup flagging — the multimodal twin of
    start_ensemble_stream: arriving image blobs are decoded +
    perceptually hashed (format-sniffing dHash,
    operators/multimodal.image_dhash), banded, and probed against the
    static corpus's hashes for Hamming <= ``max_hamming`` matches;
    (corpus_id, new_id, hamming) flags land idempotently per batch
    (same exactly-once contract as _write_probe_batch). The corpus
    side is hoisted ONCE at stream start: blobs are hashed and their
    banded rows persisted (operators/dedup.prepare_phash_corpus_state)
    — per micro-batch only the arriving blobs decode, and the probe
    join broadcasts the batch side, so the corpus is never reshuffled
    and state never grows with the stream. Flags equal the batch
    operator's cross pairs (parity-pinned by
    tests/test_image_phash.py).

    ``state`` (round 11) — an already-prepared banded corpus frame
    from prepare_phash_corpus_state (e.g. over the materialized
    media fingerprint index's phash partition, so the corpus is
    never re-DECODED either): stream start then does zero
    corpus-side work and batch 1 runs at steady state. When omitted,
    the state is built from ``corpus_blobs`` at start and eagerly
    materialized, so the first micro-batch is not the one paying
    the corpus decode + banding."""
    from ..operators.dedup import (
        phash_cross_pairs_from_state,
        prepare_phash_corpus_state,
    )
    from ..operators.multimodal import image_dhash

    if state is None:
        state = prepare_phash_corpus_state(image_dhash(corpus_blobs))
        state.count()

    reader = spark.readStream.schema(BLOBS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir)

    sink = os.path.join(out_dir, "image_flags")

    def probe(batch: DataFrame, batch_id: int) -> None:
        # exact-duplicate arrivals cannot change the distinct flag
        # set — drop them before the DECODE kernel (the expensive
        # per-row stage here; see _write_probe_batch's note).
        flags = phash_cross_pairs_from_state(
            state, image_dhash(batch.dropDuplicates()),
            max_hamming=max_hamming
        )
        flags.write.mode("overwrite").parquet(
            os.path.join(sink, f"batch_id={batch_id}")
        )

    return (
        stream.writeStream.foreachBatch(probe)
        .option("checkpointLocation", os.path.join(out_dir, "_ckpt/image"))
        .trigger(availableNow=True)
        .start()
    )
