"""Phase-3 mail model: contact upsert choreography + resolved joins
(reference maillog.py:66-104,106-138)."""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import Row

from logsdb_spark.operators import upsert
from logsdb_spark.sources import maillog

NOW = datetime(2026, 8, 12, 12, 0, 0, tzinfo=timezone.utc)

MSG_A = b"""From: "Alice Example" <alice@example.org>
To: "Bob Local" <bob@mydomain.example>, carol@mydomain.example
Date: Tue, 12 Aug 2026 09:15:00 +0200
Subject: first

x
"""

MSG_B = b"""From: "Bob Local" <bob@mydomain.example>
To: "Alice Example" <alice@example.org>
CC: carol@mydomain.example
Date: Tue, 12 Aug 2026 10:15:00 +0200
Subject: second

y
"""


def _parsed(spark):
    files = spark.createDataFrame(
        [
            Row(path="a.eml", content=bytearray(MSG_A)),
            Row(path="b.eml", content=bytearray(MSG_B)),
        ]
    )
    return maillog.parse_email_messages(files, now=NOW)


def test_contact_upsert_dedups_across_batches(spark):
    parsed = _parsed(spark)
    batch_contacts = upsert.extract_batch_contacts(parsed)
    # Alice, Bob, carol — sender/recipient overlap collapses
    assert batch_contacts.count() == 3

    dim1 = upsert.upsert_contacts(None, batch_contacts)
    assert dim1.count() == 3
    # re-upserting the same batch adds nothing (J3 get-or-insert parity)
    dim2 = upsert.upsert_contacts(dim1, batch_contacts)
    assert dim2.count() == 3
    # ids are content-stable
    ids1 = {(r.realname, r.email_address): r.id for r in dim1.collect()}
    ids2 = {(r.realname, r.email_address): r.id for r in dim2.collect()}
    assert ids1 == ids2


def test_inbox_and_bridge_resolution(spark):
    parsed = _parsed(spark)
    contacts = upsert.upsert_contacts(None, upsert.extract_batch_contacts(parsed))
    inbox = upsert.build_inbox_batch(parsed, base_id=100)
    assert sorted(r.id for r in inbox.select("id").collect()) == [101, 102]

    tocc = upsert.build_tocc_bridge(inbox)
    assert tocc.count() == 4  # 2 recipients per message

    resolved = upsert.inbox_with_contacts(inbox, contacts, tocc)
    rows = {r.subject: r for r in resolved.collect()}
    assert rows["first"].sender_realname == "Alice Example"
    assert rows["first"].sender_email == "alice@example.org"
    # tocc sorted by (realname, email): ''<'Bob Local' → carol first
    assert [c.email_address for c in rows["first"].tocc] == [
        "carol@mydomain.example",
        "bob@mydomain.example",
    ]
    assert rows["second"].sender_email == "bob@mydomain.example"


def test_txn_merge_read_after_write(spark, tmp_path):
    """Transactional contact MERGE: sequential batches land exactly
    once, read-after-write sees the committed dim (maillog.py:66-78
    read-after-write parity), versions advance monotonically."""
    from logsdb_spark.operators import txn

    path = str(tmp_path / "contacts")
    b1 = spark.createDataFrame(
        [("Ann A", "ann@example.com"), ("Bob B", "bob@example.com")],
        "realname string, email_address string",
    )
    v1 = txn.merge_contacts(spark, path, b1)
    assert v1 == 0
    got1 = {r.email_address for r in txn.read_snapshot(spark, path).collect()}
    assert got1 == {"ann@example.com", "bob@example.com"}

    b2 = spark.createDataFrame(
        [("Bob B", "bob@example.com"), ("Cyn C", "cyn@example.com")],
        "realname string, email_address string",
    )
    v2 = txn.merge_contacts(spark, path, b2)
    assert v2 == 1
    rows = txn.read_snapshot(spark, path).collect()
    assert len(rows) == 3, "duplicate contact row after merge"
    # time travel: version 0 still readable and unchanged
    assert txn.read_snapshot(spark, path, version=0).count() == 2


def test_txn_concurrent_writers_both_land(spark, tmp_path):
    """Two writers race the same version: the loser gets
    ConcurrentWriteError on the raw commit, and merge_contacts'
    retry loop folds its batch into the winner's snapshot — both
    batches land exactly once. This makes the old 'single-writer
    assumption' an enforced protocol instead of prose."""
    import pytest

    from logsdb_spark.operators import txn
    from logsdb_spark.operators.upsert import upsert_contacts

    path = str(tmp_path / "contacts")
    b1 = spark.createDataFrame(
        [("Ann A", "ann@example.com")], "realname string, email_address string"
    )
    b2 = spark.createDataFrame(
        [("Bob B", "bob@example.com")], "realname string, email_address string"
    )
    # both writers read the SAME (empty) version...
    v = txn.current_version(path)
    m1 = upsert_contacts(txn.read_snapshot(spark, path, v) if v >= 0 else None, b1)
    m2 = upsert_contacts(txn.read_snapshot(spark, path, v) if v >= 0 else None, b2)
    # ...writer 1 commits first; writer 2's blind commit must FAIL
    assert txn.commit_snapshot(m1, path, v) == 0
    with pytest.raises(txn.ConcurrentWriteError):
        txn.commit_snapshot(m2, path, v)
    # writer 2 goes through the retry protocol and lands on top
    assert txn.merge_contacts(spark, path, b2) == 1
    rows = txn.read_snapshot(spark, path).collect()
    assert {r.email_address for r in rows} == {"ann@example.com", "bob@example.com"}
    assert len(rows) == 2
