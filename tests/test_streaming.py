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
