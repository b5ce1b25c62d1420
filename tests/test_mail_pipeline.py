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
