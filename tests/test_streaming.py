"""Structured Streaming ingest tests (K1/K2): file stream →
foreachBatch append with checkpointing, dead-letter routing, and
incremental (exactly-once per batch) pickup of new files."""

from __future__ import annotations

import os

from logsdb_spark.streaming.ingest import (
    ingest_apache_access,
    ingest_authfail,
    run_until_drained,
)

APACHE_OK = (
    '2026-08-12 10:00:00 +0000|ex.com|443|203.0.113.7|10|20|30|200|'
    '["-", "GET / HTTP/1.1", "GET", "/", "HTTP/1.1", "-", "UA"]'
)
AUTH_OK = (
    "2026-08-12T14:03:11+00:00 h sshd[1]: Failed password for root "
    "from 198.51.100.23 port 1 ssh2"
)


def test_apache_stream_ingest(spark, tmp_path):
    src = tmp_path / "src"
    out = tmp_path / "out"
    src.mkdir()
    (src / "a.log").write_text(APACHE_OK + "\n" + "garbage\n")

    run_until_drained(ingest_apache_access(spark, str(src), str(out)))

    events = spark.read.parquet(str(out / "apache_access"))
    assert events.count() == 1
    r = events.collect()[0]
    assert r.reqline == "GET / HTTP/1.1"
    assert str(r.event_date) == "2026-08-12"  # date-partitioned sink
    dead = spark.read.parquet(str(out / "apache_access_dead_letter"))
    assert dead.count() == 1

    # second batch: only NEW files are processed (checkpoint state)
    (src / "b.log").write_text(APACHE_OK + "\n")
    run_until_drained(ingest_apache_access(spark, str(src), str(out)))
    assert spark.read.parquet(str(out / "apache_access")).count() == 2


def test_authfail_stream_ingest(spark, tmp_path):
    src = tmp_path / "src"
    out = tmp_path / "out"
    src.mkdir()
    (src / "auth.log").write_text(AUTH_OK + "\n")

    run_until_drained(ingest_authfail(spark, str(src), str(out)))

    events = spark.read.parquet(str(out / "authfail"))
    rows = events.collect()
    assert len(rows) == 1
    assert rows[0].username == "root"
    assert rows[0].src_addr == "198.51.100.23"
    # no dead letters → dir absent
    assert not os.path.exists(str(out / "authfail_dead_letter"))


# ---------------------------------------------------------------------------
# Streaming aggregation (extension): watermarked windows + custom state
# ---------------------------------------------------------------------------


def _write_event_files(spark, src, n_files=3):
    """Split sf0.001 events into n TIME-ORDERED parquet files (file i =
    i-th ntile by ts) so maxFilesPerTrigger=1 yields micro-batches in
    event-time order — the arrival pattern of real log files. A random
    split would make whole batches arrive behind the watermark and be
    dropped as late data (correct semantics, wrong test fixture)."""
    import glob
    import shutil
    import time

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from logsdb_spark.catalog import load_table

    ev = (
        load_table(spark, "/root/testdata/sf0.001", "events")
        .select("event_id", "ts", "user_id", "event_type", "value")
        .withColumn("tile", F.ntile(n_files).over(Window.orderBy("ts", "event_id")))
    )
    src.mkdir(parents=True, exist_ok=True)
    rows = 0
    for i in range(1, n_files + 1):
        part_dir = src.parent / f"_part{i}"
        tile = ev.filter(F.col("tile") == i).drop("tile")
        rows += tile.count()
        tile.coalesce(1).write.mode("overwrite").parquet(str(part_dir))
        part_file = glob.glob(str(part_dir / "part-*.parquet"))[0]
        shutil.copy(part_file, str(src / f"{i:02d}.parquet"))
        time.sleep(0.05)  # distinct mtimes → deterministic pickup order
    return rows


def test_streaming_windowed_counts_match_batch(spark, tmp_path):
    """Append-mode watermarked windows: every emitted (window, type) row
    must equal the batch groupBy on the same data, and windows the final
    watermark hasn't passed are withheld (append-mode finality)."""
    from pyspark.sql import functions as F

    from logsdb_spark.streaming.aggregates import start_hourly_counts
    from logsdb_spark.streaming.ingest import run_until_drained

    src, out = tmp_path / "src", tmp_path / "out"
    _write_event_files(spark, src, n_files=3)

    run_until_drained(start_hourly_counts(spark, str(src), str(out), 1))

    got = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in spark.read.parquet(str(out / "hourly_counts")).collect()
    }
    assert got, "no windows emitted"

    batch = spark.read.parquet(str(src))
    want = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in batch.groupBy(
            F.window("ts", "1 hour").alias("win"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
        .collect()
    }
    # emitted rows are final → must match batch exactly
    for k, v in got.items():
        assert want[k] == v
    # withheld rows are exactly the not-yet-finalized tail: the final
    # watermark trails max(ts) by 1h, so the newest window(s) must be
    # absent (append-mode finality), everything emitted is a subset
    assert set(got) <= set(want)
    assert len(got) < len(want)


def test_stateful_running_totals(spark, tmp_path):
    """applyInPandasWithState cumulative totals: the LAST changelog row
    per user must equal the batch count/sum — state survives across
    micro-batches (3 files, maxFilesPerTrigger=1 → 3 batches)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from logsdb_spark.streaming.aggregates import start_running_totals
    from logsdb_spark.streaming.ingest import run_until_drained

    src, out = tmp_path / "src", tmp_path / "out"
    _write_event_files(spark, src, n_files=3)

    run_until_drained(start_running_totals(spark, str(src), str(out), 1))

    log = spark.read.parquet(str(out / "user_totals"))
    assert log.select("batch_id").distinct().count() >= 2, "expected multiple batches"
    final = (
        log.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("user_id").orderBy(F.desc("batch_id"))
            ),
        )
        .filter(F.col("rn") == 1)
        .select("user_id", "n_events", "total_value")
    )
    got = {r.user_id: (r.n_events, r.total_value) for r in final.collect()}

    batch = spark.read.parquet(str(src))
    want = {
        r.user_id: (r.n, r.v)
        for r in batch.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("v"),
        )
        .collect()
    }
    assert got == want


def test_maillog_stream_ingest_with_upsert(spark, tmp_path):
    """S3 streaming ingest: two batches of .eml files; the contacts dim
    must be append-only (shared contacts not re-inserted), inbox ids
    must continue across batches, and the bridge must resolve."""
    from datetime import datetime, timezone

    from logsdb_spark.operators.upsert import inbox_with_contacts
    from logsdb_spark.streaming.ingest import ingest_maillog, run_until_drained

    now = datetime(2026, 8, 12, 12, 0, 0, tzinfo=timezone.utc)
    src, out = tmp_path / "mail", tmp_path / "out"
    src.mkdir()
    msg_a = (
        b'From: "Alice A" <alice@example.org>\n'
        b"To: bob@mydomain.example\n"
        b"Date: Tue, 12 Aug 2026 09:15:00 +0200\n"
        b"Subject: one\n\nx\n"
    )
    msg_b = (
        b'From: "Bob B" <bob@mydomain.example>\n'
        b"To: alice@example.org, carol@mydomain.example\n"
        b"Date: Tue, 12 Aug 2026 10:15:00 +0200\n"
        b"Subject: two\n\ny\n"
    )
    # msg_c re-uses ONLY batch-1 contact pairs — the cross-batch
    # anti-join must not re-insert them.
    msg_c = (
        b'From: "Alice A" <alice@example.org>\n'
        b"To: bob@mydomain.example\n"
        b"Date: Tue, 12 Aug 2026 11:15:00 +0200\n"
        b"Subject: three\n\nz\n"
    )
    (src / "a.eml").write_bytes(msg_a)
    run_until_drained(ingest_maillog(spark, str(src), str(out), now=now))
    (src / "b.eml").write_bytes(msg_b)
    (src / "c.eml").write_bytes(msg_c)
    run_until_drained(ingest_maillog(spark, str(src), str(out), now=now))

    contacts = spark.read.parquet(str(out / "inbox_contacts"))
    inbox = spark.read.parquet(str(out / "inbox"))
    tocc = spark.read.parquet(str(out / "inbox_tocc"))

    # Contact identity is the (realname, email) PAIR (reference
    # UNIQUE(realname, email_address), maillog.py:16): named and bare
    # forms of the same address are distinct contacts — alice appears
    # named (From, batch 1) and bare (To, batch 2), bob bare (To,
    # batch 1) and named (From, batch 2); carol once. Re-seen pairs are
    # NOT re-inserted (append-only dim).
    emails = sorted(r.email_address for r in contacts.collect())
    assert emails.count("alice@example.org") == 2  # named + bare
    assert emails.count("bob@mydomain.example") == 2  # bare + named
    assert emails.count("carol@mydomain.example") == 1
    assert contacts.count() == 5
    assert contacts.count() == contacts.select("id").distinct().count()

    # inbox ids continue across batches: batch1 -> 1, batch2 -> 2, 3
    assert sorted(r.id for r in inbox.collect()) == [1, 2, 3]
    assert inbox.filter("subject = 'two'").collect()[0].id == 2

    # bridge resolves: message 'two' has 2 recipients
    resolved = inbox_with_contacts(inbox, contacts, tocc)
    two = resolved.filter("subject = 'two'").collect()[0]
    assert [r.email_address for r in two.tocc] == [
        "alice@example.org",
        "carol@mydomain.example",
    ]
    assert two.sender_realname == "Bob B"


def test_strict_ingest_halts_on_bad_line(spark, tmp_path):
    """strict=True restores the reference's halt-on-first-error policy
    (apache_access.py:143): the query fails, and the batch's good rows
    are NOT committed (per-batch atomicity)."""
    import pytest

    from logsdb_spark.streaming.ingest import ingest_apache_access

    src, out = tmp_path / "src", tmp_path / "out"
    src.mkdir()
    (src / "a.log").write_text(APACHE_OK + "\ngarbage\n")

    q = ingest_apache_access(spark, str(src), str(out), strict=True)
    with pytest.raises(Exception, match="StrictIngestError|unparsable"):
        q.awaitTermination(120)
    assert not (out / "apache_access").exists()


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """At-least-once upstream → exactly-once downstream: re-delivered
    event_ids (duplicates planted within the same and the neighboring
    micro-batch) are dropped; the output is exactly the distinct set."""
    import glob
    import shutil

    from logsdb_spark.streaming.dedup import start_dedup_stream
    from logsdb_spark.streaming.ingest import run_until_drained

    src, out = tmp_path / "dsrc", tmp_path / "dout"
    _write_event_files(spark, src, n_files=2)

    # replay file 0 in full as a third file: every row is a duplicate
    files = sorted(glob.glob(str(src / "*.parquet")))
    dup = spark.read.parquet(files[0])
    dup.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "_dup"))
    part = glob.glob(str(tmp_path / "_dup" / "part-*.parquet"))[0]
    shutil.copy(part, str(src / "99_replay.parquet"))

    run_until_drained(start_dedup_stream(spark, str(src), str(out), 1))

    got = spark.read.parquet(str(out / "deduped"))
    n_distinct = spark.read.parquet(str(src)).select("event_id").distinct().count()
    assert got.count() == n_distinct
    assert got.select("event_id").distinct().count() == n_distinct


def test_replayed_batch_is_idempotent(spark, tmp_path):
    """Effectively-once: replaying a committed batch (simulated by
    wiping the checkpoint so availableNow re-reads the same files as
    batch 0 again) must overwrite its own (_batch_id) partition, not
    append duplicates — the crash-between-append-and-commit case."""
    import shutil

    src = tmp_path / "src"
    out = tmp_path / "out"
    src.mkdir()
    (src / "a.log").write_text(APACHE_OK + "\n" + "garbage\n")

    run_until_drained(ingest_apache_access(spark, str(src), str(out)))
    events = spark.read.parquet(str(out / "apache_access"))
    assert events.count() == 1
    assert "_batch_id" in events.columns

    shutil.rmtree(out / "_checkpoints")
    run_until_drained(ingest_apache_access(spark, str(src), str(out)))
    assert spark.read.parquet(str(out / "apache_access")).count() == 1
    dead = spark.read.parquet(str(out / "apache_access_dead_letter"))
    assert dead.count() == 1


def test_stream_static_enrichment_matches_batch_join(spark, tmp_path):
    """Stream-static left join with a broadcast dim must produce
    exactly the batch left-join rows — stateless per-batch probes,
    unmatched events keep NULL attributes."""
    from logsdb_spark.catalog import load_table
    from logsdb_spark.streaming.aggregates import start_enriched_stream

    src, out = tmp_path / "src", tmp_path / "out"
    _write_event_files(spark, src, n_files=3)
    dim = load_table(spark, "/root/testdata/sf0.001", "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )

    run_until_drained(start_enriched_stream(spark, str(src), str(out), dim))

    got = {
        (r.event_id, r.c_name)
        for r in spark.read.parquet(str(out / "enriched_events")).collect()
    }
    ev = spark.read.parquet(str(src))
    want = {
        (r.event_id, r.c_name)
        for r in ev.join(dim, ev.user_id == dim.c_custkey, "left").collect()
    }
    assert got == want
    assert any(name is not None for _, name in got), "no dim matches at all"


def test_stream_stream_interval_join_matches_batch(spark, tmp_path):
    """Watermarked stream-stream interval join: inner joins emit
    eagerly on match, so a drained availableNow run must contain
    EXACTLY the batch interval join's matches on the same data."""
    from pyspark.sql import functions as F

    from logsdb_spark.streaming.ingest import run_until_drained
    from logsdb_spark.streaming.joins import start_attribution_stream

    src, out = tmp_path / "src", tmp_path / "out"
    _write_event_files(spark, src, n_files=3)

    run_until_drained(start_attribution_stream(spark, str(src), str(out), 1))

    got = {
        (r.click_id, r.purchase_id)
        for r in spark.read.parquet(str(out / "attributed")).collect()
    }

    ev = spark.read.parquet(str(src))
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("cts"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("pts"),
    )
    want = {
        (r.click_id, r.purchase_id)
        for r in c.join(
            p,
            (F.col("cu") == F.col("pu"))
            & (F.col("pts") >= F.col("cts"))
            & (F.col("pts") <= F.col("cts") + F.expr("interval 30 minutes")),
        ).collect()
    }
    assert want, "test data produced no click->purchase matches"
    assert got == want


def test_streaming_session_window_matches_batch(spark, tmp_path):
    """Append-mode session windows: every emitted session must equal
    the batch session_window aggregation row-for-row, and sessions the
    final watermark hasn't closed are withheld (emitted is a subset)."""
    from pyspark.sql import functions as F

    from logsdb_spark.streaming.ingest import run_until_drained
    from logsdb_spark.streaming.joins import start_session_stream

    src, out = tmp_path / "src", tmp_path / "out"
    _write_event_files(spark, src, n_files=3)

    run_until_drained(start_session_stream(spark, str(src), str(out), 1))

    got = {
        (r.user_id, r.session_start): (r.session_end, r.n_events, r.total_value)
        for r in spark.read.parquet(str(out / "sessions")).collect()
    }
    assert got, "no sessions emitted"

    want = {
        (r.user_id, r.session_start): (r.session_end, r.n_events, r.total_value)
        for r in spark.read.parquet(str(src))
        .groupBy(F.session_window("ts", "30 minutes").alias("sw"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
            "total_value",
        )
        .collect()
    }
    for key, v in got.items():
        assert key in want and want[key] == v, (key, v, want.get(key))
    # the drained run should have closed nearly every session
    assert len(got) >= 0.5 * len(want)


def test_jsonl_stream_ingest(spark, tmp_path):
    """JSONL ingest: same checkpointed dead-lettered sink contract as
    the log sources, over the extension dump format."""
    from logsdb_spark.streaming.ingest import ingest_jsonl, run_until_drained

    src, out = tmp_path / "src", tmp_path / "out"
    src.mkdir()
    (src / "a.jsonl").write_text(
        '{"event_id": 1, "ts": "2024-01-01T00:09:58Z", "user_id": 7, '
        '"event_type": "view", "value": 1.5}\n'
        "garbage\n"
    )
    run_until_drained(ingest_jsonl(spark, str(src), str(out)))

    events = spark.read.parquet(str(out / "jsonl_events"))
    assert events.count() == 1
    r = events.collect()[0]
    assert r.event_id == 1 and str(r.event_date) == "2024-01-01"
    dead = spark.read.parquet(str(out / "jsonl_events_dead_letter"))
    assert dead.count() == 1

    (src / "b.jsonl").write_text(
        '{"event_id": 2, "ts": "2024-01-02T10:00:00Z", "user_id": 8, '
        '"event_type": "click", "value": 2.0}\n'
    )
    run_until_drained(ingest_jsonl(spark, str(src), str(out)))
    assert spark.read.parquet(str(out / "jsonl_events")).count() == 2


def test_ingest_feeds_incremental_rollup(spark, tmp_path):
    """Composition: the streaming sink's (event_date, _batch_id)
    layout is exactly what refresh_daily_rollup consumes — ingest two
    batches, refresh after each, and the rollup must equal the batch
    aggregate of everything ingested."""
    from pyspark.sql import functions as F

    from logsdb_spark.operators.rollup import read_rollup, refresh_daily_rollup
    from logsdb_spark.streaming.ingest import ingest_jsonl, run_until_drained

    src, out = tmp_path / "src", tmp_path / "out"
    src.mkdir()
    line = (
        '{"event_id": %d, "ts": "2024-01-0%dT0%d:00:00Z", "user_id": %d, '
        '"event_type": "%s", "value": %s}'
    )
    (src / "a.jsonl").write_text(
        "\n".join(
            [
                line % (1, 1, 1, 7, "view", "1.5"),
                line % (2, 1, 2, 8, "view", "2.25"),
                line % (3, 2, 3, 7, "click", "0.5"),
            ]
        )
        + "\n"
    )
    run_until_drained(ingest_jsonl(spark, str(src), str(out)))
    events_dir = str(out / "jsonl_events")
    rollup_dir = str(out / "rollup")
    assert refresh_daily_rollup(spark, events_dir, rollup_dir) == 1

    (src / "b.jsonl").write_text(line % (4, 1, 9, 9, "view", "3.0") + "\n")
    run_until_drained(ingest_jsonl(spark, str(src), str(out)))
    assert refresh_daily_rollup(spark, events_dir, rollup_dir) == 1

    got = {
        (str(r.event_date), r.event_type): (r.n_events, r.total_value)
        for r in read_rollup(spark, rollup_dir).collect()
    }
    assert got == {
        ("2024-01-01", "view"): (3, 6.75),
        ("2024-01-02", "click"): (1, 0.5),
    }


def test_backpressure_max_files_per_trigger(spark, tmp_path):
    """A backfill over many source files with maxFilesPerTrigger=2 must
    split into bounded micro-batches (availableNow honors source
    limits) — the at-scale replay semantics: memory is sized by the
    knob, not the backlog. Results must equal an unthrottled ingest,
    and the accreted per-batch small files compact away downstream."""
    from logsdb_spark.operators.scale import compact_parquet

    src = tmp_path / "src"
    out = tmp_path / "out"
    src.mkdir()
    for i in range(5):
        (src / f"f{i}.log").write_text(APACHE_OK + "\n")

    run_until_drained(
        ingest_apache_access(spark, str(src), str(out), max_files_per_trigger=2)
    )

    events = spark.read.parquet(str(out / "apache_access"))
    assert events.count() == 5
    batch_ids = {r._batch_id for r in events.select("_batch_id").distinct().collect()}
    assert len(batch_ids) == 3, f"expected ceil(5/2)=3 bounded batches, got {batch_ids}"

    # new files after the backfill keep flowing through the same checkpoint
    (src / "f5.log").write_text(APACHE_OK + "\n")
    run_until_drained(
        ingest_apache_access(spark, str(src), str(out), max_files_per_trigger=2)
    )
    assert spark.read.parquet(str(out / "apache_access")).count() == 6

    # compaction folds the per-batch small files; row count is invariant
    n_files = compact_parquet(spark, str(out / "apache_access"), str(tmp_path / "compact"))
    compacted = spark.read.parquet(str(tmp_path / "compact"))
    assert compacted.count() == 6
    assert n_files <= len(batch_ids)


def test_maillog_backpressure_max_files_per_trigger(spark, tmp_path):
    """The binaryFile mail source honors the same backpressure knob as
    the text sources: one message per file, so maxFilesPerTrigger=2
    over 5 messages must drain in 3 bounded micro-batches — and the
    upsert choreography must stay correct across them (ids continuous,
    contacts dim deduped across batches, not just within one)."""
    from datetime import datetime, timezone

    from logsdb_spark.streaming.ingest import ingest_maillog, run_until_drained

    now = datetime(2026, 8, 12, 12, 0, 0, tzinfo=timezone.utc)
    src, out = tmp_path / "mail", tmp_path / "out"
    src.mkdir()
    for i in range(5):
        (src / f"m{i}.eml").write_bytes(
            f'From: "Sender {i % 2}" <s{i % 2}@example.org>\n'
            f"To: r{i % 3}@example.net\n"
            f"Date: Tue, 12 Aug 2026 0{i}:00:00 +0000\n"
            f"Subject: msg {i}\n\nbody {i}\n".encode()
        )
    run_until_drained(
        ingest_maillog(spark, str(src), str(out), now=now,
                       max_files_per_trigger=2)
    )
    inbox = spark.read.parquet(str(out / "inbox"))
    assert sorted(r.id for r in inbox.collect()) == [1, 2, 3, 4, 5]
    assert inbox.select("_batch_id").distinct().count() == 3
    contacts = spark.read.parquet(str(out / "inbox_contacts"))
    # 2 senders + 3 recipients, each pair inserted exactly once even
    # though they recur across micro-batches
    assert contacts.count() == 5
    assert contacts.count() == contacts.select("id").distinct().count()


def test_streaming_neardup_probe_matches_batch(spark, tmp_path):
    """Streaming near-dup flagging (foreachBatch broadcast-LSH probe
    against a static corpus) must flag exactly the pairs the batch
    incremental operator finds over the same split — shard boundaries
    cannot change the answer, because each shard is probed against the
    STATIC corpus, never against other shards."""
    from pyspark.sql import functions as F

    from logsdb_spark.catalog import load_table
    from logsdb_spark.operators.dedup import minhash_near_dups_incremental
    from logsdb_spark.streaming.dedup import start_neardup_stream
    from logsdb_spark.streaming.ingest import run_until_drained

    sf_dir = "/root/testdata/sf0.001"
    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 3 != 0)
    incoming = docs.filter(F.col("doc_id") % 3 == 0)

    src, out = tmp_path / "nsrc", tmp_path / "nout"
    # two shard files -> two micro-batches under maxFilesPerTrigger=1
    incoming.filter(F.col("doc_id") % 2 == 0).coalesce(1).write.parquet(
        str(src), mode="append"
    )
    incoming.filter(F.col("doc_id") % 2 == 1).coalesce(1).write.parquet(
        str(src), mode="append"
    )

    run_until_drained(
        start_neardup_stream(spark, corpus, str(src), str(out),
                             max_files_per_trigger=1)
    )

    got = {
        (r.corpus_id, r.new_id, r.jac)
        for r in spark.read.parquet(str(out / "neardups")).collect()
    }
    want = {
        (r.corpus_id, r.new_id, r.jac)
        for r in minhash_near_dups_incremental(corpus, incoming).collect()
    }
    assert got == want and want, (len(got), len(want))

def test_streaming_neardup_replay_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: a crash between the sink write
    and the checkpoint commit replays the micro-batch. The probe's
    per-batch partition-overwrite write must therefore be idempotent —
    running the SAME (batch, batch_id) twice yields exactly the rows
    of running it once, not doubled flags."""
    from pyspark.sql import functions as F

    from logsdb_spark.catalog import load_table
    from logsdb_spark.streaming.dedup import _write_probe_batch

    sf_dir = "/root/testdata/sf0.001"
    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 3 != 0)
    shard = docs.filter(F.col("doc_id") % 3 == 0)
    sink = str(tmp_path / "neardups")

    _write_probe_batch(corpus, shard, 0, sink, 0.6)
    once = sorted(
        (r.corpus_id, r.new_id, r.jac)
        for r in spark.read.parquet(sink).collect()
    )
    assert once, "probe found no pairs — fixture lost its planted dups"
    # simulated replay of the SAME micro-batch id
    _write_probe_batch(corpus, shard, 0, sink, 0.6)
    twice = sorted(
        (r.corpus_id, r.new_id, r.jac)
        for r in spark.read.parquet(sink).collect()
    )
    assert twice == once
    # a NEW batch id still lands alongside, in its own partition dir
    _write_probe_batch(corpus, shard, 1, sink, 0.6)
    both = spark.read.parquet(sink)
    assert both.count() == 2 * len(once)
    assert both.select("batch_id").distinct().count() == 2

def test_streaming_ensemble_probe_matches_batch_edges(spark, tmp_path):
    """The two-signal streaming probe must flag exactly the
    (corpus, incoming) cross edges the BATCH ensemble derives over
    the same corpus: union of MinHash-verified pairs and winnow span
    pairs, restricted to pairs straddling the corpus/incoming split.
    Shard boundaries cannot change the answer — each signal probes
    the STATIC corpus only, and the winnow hub cap counts corpus
    occupancy, not batch occupancy."""
    from pyspark.sql import functions as F

    from logsdb_spark.catalog import load_table
    from logsdb_spark.operators.dedup import (
        ensemble_near_dups_incremental,
        minhash_near_dups,
    )
    from logsdb_spark.plans.extensions import dedup_substring_winnow
    from logsdb_spark.streaming.dedup import start_ensemble_stream
    from logsdb_spark.streaming.ingest import run_until_drained

    sf_dir = "/root/testdata/sf0.001"
    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 3 != 0)
    incoming = docs.filter(F.col("doc_id") % 3 == 0)
    incoming_ids = {r.doc_id for r in incoming.select("doc_id").collect()}

    src, out = tmp_path / "esrc", tmp_path / "eout"
    incoming.filter(F.col("doc_id") % 2 == 0).coalesce(1).write.parquet(
        str(src), mode="append"
    )
    incoming.filter(F.col("doc_id") % 2 == 1).coalesce(1).write.parquet(
        str(src), mode="append"
    )

    run_until_drained(
        start_ensemble_stream(spark, corpus, str(src), str(out),
                              max_files_per_trigger=1)
    )
    got = {
        (r.corpus_id, r.new_id)
        for r in spark.read.parquet(str(out / "ensemble_flags")).collect()
    }

    # shard-invariance: one-shot incremental over the whole incoming set
    want_inc = {
        (r.corpus_id, r.new_id)
        for r in ensemble_near_dups_incremental(corpus, incoming).collect()
    }
    assert got == want_inc and got, (len(got), len(want_inc))

    # batch parity: the full-corpus ensemble edge set, restricted to
    # pairs straddling the split, oriented (corpus_id, new_id)
    mh_all = minhash_near_dups(docs, threshold=0.6).select("id_a", "id_b")
    wn_all = dedup_substring_winnow(spark, sf_dir).select("id_a", "id_b")
    cross = set()
    for r in mh_all.unionByName(wn_all).distinct().collect():
        in_a, in_b = r.id_a in incoming_ids, r.id_b in incoming_ids
        if in_a != in_b:
            cross.add((r.id_b, r.id_a) if in_a else (r.id_a, r.id_b))
    assert got == cross, (
        len(got), len(cross), sorted(got ^ cross)[:10]
    )


def test_ensemble_prepared_matches_from_raw(spark, tmp_path):
    """Round 9: the INDEX-FED incremental ensemble probe (corpus
    evidence read from the materialized MinHash-signature and
    winnow-fingerprint layouts) must emit exactly the from-raw
    incremental edges — driven both directly and through
    start_ensemble_stream(indexes=...). This is the production
    steady state the operator docstrings describe: per batch the
    corpus sides are stored-state scans, not tokenize/hash chains."""
    from pyspark.sql import functions as F

    from logsdb_spark.catalog import load_table
    from logsdb_spark.operators.dedup import (
        ensemble_near_dups_incremental,
        ensemble_near_dups_prepared,
    )
    from logsdb_spark.operators.silver import (
        minhash_index_layout,
        winnow_fp_layout,
    )
    from logsdb_spark.streaming.dedup import start_ensemble_stream
    from logsdb_spark.streaming.ingest import run_until_drained

    sf_dir = "/root/testdata/sf0.001"
    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 3 != 0)
    incoming = docs.filter(F.col("doc_id") % 3 == 0)
    # the stored indexes cover ALL docs; restrict to the corpus split
    # with a pushed-down id filter — the same pattern a production
    # probe uses to scope the reference set
    mh_idx = minhash_index_layout(spark, sf_dir).filter(
        F.col("doc_id") % 3 != 0)
    fp_idx = winnow_fp_layout(spark, sf_dir).filter(
        F.col("doc_id") % 3 != 0)

    want = {
        (r.corpus_id, r.new_id)
        for r in ensemble_near_dups_incremental(corpus, incoming).collect()
    }
    got = {
        (r.corpus_id, r.new_id)
        for r in ensemble_near_dups_prepared(
            mh_idx, fp_idx, incoming).collect()
    }
    assert got == want and got

    src, out = tmp_path / "pe_src", tmp_path / "pe_out"
    incoming.coalesce(1).write.parquet(str(src))
    run_until_drained(
        start_ensemble_stream(spark, corpus, str(src), str(out),
                              indexes=(mh_idx, fp_idx))
    )
    flags = {
        (r.corpus_id, r.new_id)
        for r in spark.read.parquet(str(out / "ensemble_flags")).collect()
    }
    assert flags == want

def test_streaming_edge_maintenance_matches_batch_rebuild(spark, tmp_path):
    """Round-12 streamed edge maintenance: drain a 3-shard document
    stream through the versioned delta sink and the FINAL count state
    must equal the batch rebuild (winnow_edge_counts over the whole
    corpus index) — the maintained-at-ingest contract, end to end
    through real micro-batches and the per-batch commit protocol."""
    from pyspark.sql import functions as F

    from logsdb_spark.catalog import load_table
    from logsdb_spark.operators.dedup import winnow_edge_counts
    from logsdb_spark.streaming.ingest import run_until_drained
    from logsdb_spark.streaming.maintenance import (
        _batch_winnow_index,
        read_edge_counts,
        start_edge_maintenance_stream,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    src, state = tmp_path / "msrc", tmp_path / "mstate"
    for m in range(3):
        docs.filter(F.col("doc_id") % 3 == m).coalesce(1).write.parquet(
            str(src), mode="append")

    q = start_edge_maintenance_stream(
        spark, str(src), str(state), max_files_per_trigger=1)
    run_until_drained(q)

    got = sorted((r.id_a, r.id_b, r.n)
                 for r in read_edge_counts(spark, str(state)).collect())
    want = sorted(
        (r.id_a, r.id_b, r.n)
        for r in winnow_edge_counts(
            _batch_winnow_index(docs, k=20, w=8)).collect())
    assert got == want and want
    # every batch committed its own version (3 shards, 1 file each)
    from logsdb_spark.streaming.maintenance import _store_versions
    assert len(_store_versions(spark, str(state / "counts"))) == 3

def test_streaming_edge_maintenance_replay_is_idempotent(spark, tmp_path):
    """Replaying a crashed micro-batch (same batch_id) must leave the
    state exactly as one application: the version for batch k is
    recomputed from version k-1, never from its own output."""
    from pyspark.sql import functions as F

    from logsdb_spark.catalog import load_table
    from logsdb_spark.streaming.maintenance import (
        apply_maintenance_batch,
        read_edge_counts,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    state = str(tmp_path / "rstate")
    b0 = docs.filter(F.col("doc_id") % 2 == 0)
    b1 = docs.filter(F.col("doc_id") % 2 == 1)

    apply_maintenance_batch(spark, b0, 0, state)
    apply_maintenance_batch(spark, b1, 1, state)
    once = sorted((r.id_a, r.id_b, r.n)
                  for r in read_edge_counts(spark, state).collect())
    assert once
    # simulated at-least-once replay of the LAST micro-batch
    apply_maintenance_batch(spark, b1, 1, state)
    twice = sorted((r.id_a, r.id_b, r.n)
                   for r in read_edge_counts(spark, state).collect())
    assert twice == once

def test_streaming_mh_maintenance_matches_batch_rebuild(spark, tmp_path):
    """The MinHash candidate state maintained through real
    micro-batches (same versioned commit protocol as the winnow
    stream) must equal the batch rebuild — lsh_emission_counts over
    the whole corpus's signatures — and replaying the last batch must
    change nothing."""
    from pyspark.sql import functions as F

    from logsdb_spark.catalog import load_table
    from logsdb_spark.operators.dedup import (
        lsh_emission_counts,
        minhash_signatures,
        shingle_sets,
    )
    from logsdb_spark.streaming.ingest import run_until_drained
    from logsdb_spark.streaming.maintenance import (
        apply_mh_maintenance_batch,
        read_mh_counts,
        start_mh_maintenance_stream,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    src, state = tmp_path / "mhsrc", tmp_path / "mhstate"
    for m in range(3):
        docs.filter(F.col("doc_id") % 3 == m).coalesce(1).write.parquet(
            str(src), mode="append")

    q = start_mh_maintenance_stream(
        spark, str(src), str(state), max_files_per_trigger=1)
    run_until_drained(q)

    def rows(df):
        return sorted((r.id_a, r.id_b, r.n_pair, r.n_star)
                      for r in df.collect())

    got = rows(read_mh_counts(spark, str(state)))
    want = rows(lsh_emission_counts(
        minhash_signatures(shingle_sets(docs)).select("doc_id", "sig")))
    assert got == want and want

    # replay of the LAST batch id leaves the state unchanged — the
    # batch's actual content comes from its committed signature
    # partition (file-stream batch order is an implementation
    # detail, not something this test should assume)
    b2 = spark.read.parquet(
        str(state / "mh_idx" / "batch_id=2")).select("doc_id").distinct()
    last = docs.join(b2, "doc_id", "left_semi")
    apply_mh_maintenance_batch(spark, last, 2, str(state))
    assert rows(read_mh_counts(spark, str(state))) == got
