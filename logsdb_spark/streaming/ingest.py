"""Structured Streaming ingest pipelines (SURVEY §2.10, K1/K2).

The reference's "streaming" is a Unix pipe: one OS process per log
source appending one committed row per line (core.py:46-48,
apache_access.py:94). The Spark-native equivalent is a file-based
stream per source with a ``foreachBatch`` append sink:

- effectively-once per micro-batch: checkpointing dedupes *inputs*,
  and the sinks make replays idempotent — every batch writes into its
  own (…, _batch_id) partition with dynamic partition overwrite, so a
  crash between append and checkpoint commit rewrites that partition
  on replay instead of duplicating it (plain foreachBatch+append would
  only be at-least-once);
- dead letters (K2) appended to a side table inside the same batch
  function, replacing halt-on-first-error with observable routing
  (strict mode can still assert emptiness per batch);
- sink tables partitioned by event date — at 100 TB this is what makes
  the daily-report predicate (P2) a partition-pruning scan instead of
  a full scan.

No watermarks/stateful ops are needed for parity: the reference has no
streaming aggregation — reports run as batch queries at read time
(SURVEY §2.10).
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..sources import apache_access, authfail

ParseFn = Callable[[DataFrame], DataFrame]


class StrictIngestError(RuntimeError):
    """Raised (inside the stream, surfacing via awaitTermination) when
    strict mode meets an unparsable line — the reference's
    halt-on-first-error exit(1) (apache_access.py:128-143)."""


def _ingest_stream(
    spark: SparkSession,
    source_dir: str,
    out_dir: str,
    parse: ParseFn,
    good: Callable[[DataFrame], DataFrame],
    dead: Callable[[DataFrame], DataFrame],
    table_name: str,
    strict: bool = False,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """text-file stream → parse → (events, dead_letters) appends.

    ``max_files_per_trigger`` is the file source's backpressure knob:
    a replay/backfill over a large source directory is split into
    bounded micro-batches (availableNow triggers honor source limits),
    so executor memory is sized by the knob, not by the backlog — the
    at-scale replay semantics. Each bounded batch still lands in its
    own (_batch_id) partition; downstream compaction
    (operators/scale.compact_parquet) folds the resulting small files.

    ``strict=True`` restores the reference's halt-on-first-error policy
    (K2, apache_access.py:143): the batch fails before ANY append if it
    contains unparsable lines, so a re-run after fixing input repeats
    the whole batch — per-micro-batch atomicity is strictly stronger
    than the reference's halt-mid-stream (already-committed rows stay
    there, core.py:46-48)."""
    reader = spark.readStream.format("text")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    lines = reader.load(source_dir)
    parsed = parse(lines)

    events_path = os.path.join(out_dir, table_name)
    dead_path = os.path.join(out_dir, f"{table_name}_dead_letter")
    checkpoint = os.path.join(out_dir, f"_checkpoints/{table_name}")

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.persist()
        try:
            # ONE probe job decides both the strict halt and whether a
            # dead-letter write is needed (an earlier form ran
            # dead().limit(1) for strict AND dl.isEmpty() again — two
            # redundant actions on the per-batch hot path).
            dl = dead(batch_df)
            first_bad = dl.limit(1).collect()
            if strict and first_bad:
                raise StrictIngestError(
                    f"{table_name} batch {batch_id}: unparsable line: "
                    f"{first_bad[0].asDict()!r}"
                )
            # Idempotent sink: every row lands in a (event_date,
            # _batch_id) partition and the write is a DYNAMIC partition
            # overwrite — a replay of batch N (crash after append,
            # before checkpoint commit) rewrites exactly its own
            # partitions instead of appending duplicates. This is what
            # upgrades foreachBatch's native at-least-once to
            # effectively-once per micro-batch with plain parquet.
            # event_date stays the leading partition key, so the daily
            # report's date predicate still prunes.
            (
                good(batch_df)
                .withColumn("event_date", F.to_date("timestamp"))
                .withColumn("_batch_id", F.lit(batch_id))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("event_date", "_batch_id")
                .parquet(events_path)
            )
            if first_bad:
                (
                    dl.withColumn("_batch_id", F.lit(batch_id))
                    .write.mode("overwrite")
                    .option("partitionOverwriteMode", "dynamic")
                    .partitionBy("_batch_id")
                    .parquet(dead_path)
                )
        finally:
            batch_df.unpersist()

    return (
        parsed.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def ingest_apache_access(
    spark: SparkSession, source_dir: str, out_dir: str, strict: bool = False,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """S1 streaming ingest (reference process: apache_access.py:87-143)."""
    return _ingest_stream(
        spark,
        source_dir,
        out_dir,
        apache_access.parse_apache_lines,
        apache_access.good_events,
        apache_access.dead_letters,
        "apache_access",
        strict=strict,
        max_files_per_trigger=max_files_per_trigger,
    )


def ingest_authfail(
    spark: SparkSession, source_dir: str, out_dir: str, strict: bool = False,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """S2 streaming ingest (reference process: authfail.py:65-97)."""
    return _ingest_stream(
        spark,
        source_dir,
        out_dir,
        authfail.parse_authfail_lines,
        authfail.good_events,
        authfail.dead_letters,
        "authfail",
        strict=strict,
        max_files_per_trigger=max_files_per_trigger,
    )


def ingest_jsonl(
    spark: SparkSession, source_dir: str, out_dir: str, strict: bool = False
) -> StreamingQuery:
    """JSONL event-dump ingest *[extension source format]* — same
    checkpointed, dead-lettered, idempotent-partition sink as the log
    sources; the parse is a schema'd from_json (sources/jsonl.py), so
    schema drift dead-letters instead of widening columns."""
    from ..sources import jsonl

    return _ingest_stream(
        spark,
        source_dir,
        out_dir,
        jsonl.parse_jsonl_lines,  # parsed once, persisted per batch
        lambda df: jsonl.good_events(df).withColumnRenamed("ts", "timestamp"),
        jsonl.dead_letters,
        "jsonl_events",
        strict=strict,
    )


def run_until_drained(query: StreamingQuery, timeout_sec: float = 120.0) -> None:
    """availableNow triggers stop on their own; wait for completion.

    RAISES on timeout instead of silently stopping a still-draining
    query: a partial backfill reported as success would let a
    downstream report run over truncated tables. The checkpoint makes
    a re-run after the timeout resume where it left off."""
    query.awaitTermination(timeout_sec)
    if query.isActive:
        query.stop()
        raise TimeoutError(
            f"stream {query.name or query.id} still draining after "
            f"{timeout_sec}s; stopped mid-backfill — re-run to resume "
            f"from the checkpoint"
        )


def ingest_maillog(
    spark: SparkSession,
    source_dir: str,
    out_dir: str,
    now=None,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """S3 streaming ingest with the upsert choreography (reference
    process: maillog.py:141-163 → insert_entry 80-104): binaryFile
    stream (one file per message, the analogue of one stdin read per
    invocation) → header parse (Arrow-batched mapInPandas) → per batch:

    1. contacts dim: batch's distinct contacts anti-joined against the
       existing dim, ONLY the new ones appended (J3 parity — the dim is
       append-only, never rewritten);
    2. inbox facts: stable ids = row_number within batch + current
       table count (single-writer, like the reference);
    3. tocc bridge rows appended per distinct recipient.

    At 100 TB-of-mail scale the count-based id offset would move into
    checkpoint metadata; the dim stays broadcast-sized by nature
    (contacts grow sublinearly in messages).
    """
    from ..operators import upsert
    from ..sources import maillog

    # binaryFile's schema is fixed but streaming sources require it
    # stated explicitly.
    binary_schema = (
        "path STRING, modificationTime TIMESTAMP, length LONG, content BINARY"
    )
    reader = spark.readStream.format("binaryFile").schema(binary_schema)
    if max_files_per_trigger is not None:
        # same backpressure knob as the text sources: a backfill over a
        # large maildir is split into bounded micro-batches (one message
        # per file, so the knob bounds messages per batch directly)
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    files = reader.load(source_dir)
    parsed = maillog.parse_email_messages(files, now=now)

    contacts_path = os.path.join(out_dir, "inbox_contacts")
    inbox_path = os.path.join(out_dir, "inbox")
    tocc_path = os.path.join(out_dir, "inbox_tocc")
    checkpoint = os.path.join(out_dir, "_checkpoints/maillog")

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.persist()
        try:
            batch_contacts = upsert.extract_batch_contacts(batch_df)
            new_contacts = upsert.upsert_contacts(None, batch_contacts)
            base_id = 0
            if os.path.exists(contacts_path):
                existing = spark.read.parquet(contacts_path)
                new_contacts = new_contacts.join(
                    F.broadcast(existing.select("id")), "id", "left_anti"
                )
            # inbox presence is checked INDEPENDENTLY of contacts: a
            # crash between the contacts append and the first inbox
            # write (or a pre-seeded contacts dim) must not wedge every
            # replay on a missing-inbox read error.
            if os.path.exists(inbox_path):
                base_id = spark.read.parquet(inbox_path).count()
            new_contacts.write.mode("append").parquet(contacts_path)

            # Facts are replay-idempotent the same way as _ingest_stream:
            # dynamic overwrite of this batch's own _batch_id partition.
            # On a replay base_id (count of ALL rows, incl. the crashed
            # attempt's) yields different — but still unique — ids; the
            # tocc bridge is rebuilt in the same batch so fact/bridge
            # stay consistent, and id gaps are harmless (the reference's
            # serial PK also gaps on rollback). Contacts are protected
            # by the anti-join instead: replayed contacts already exist
            # and drop out.
            inbox_batch = upsert.build_inbox_batch(batch_df, base_id=base_id)
            inbox_batch.persist()
            try:
                (
                    inbox_batch.drop("recipients")
                    .withColumn("_batch_id", F.lit(batch_id))
                    .write.mode("overwrite")
                    .option("partitionOverwriteMode", "dynamic")
                    .partitionBy("_batch_id")
                    .parquet(inbox_path)
                )
                (
                    upsert.build_tocc_bridge(inbox_batch)
                    .withColumn("_batch_id", F.lit(batch_id))
                    .write.mode("overwrite")
                    .option("partitionOverwriteMode", "dynamic")
                    .partitionBy("_batch_id")
                    .parquet(tocc_path)
                )
            finally:
                inbox_batch.unpersist()
        finally:
            batch_df.unpersist()

    return (
        parsed.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
