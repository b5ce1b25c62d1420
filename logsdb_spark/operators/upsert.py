"""Mail model + contact upsert (reference: src/logsdb/maillog.py:14-104).

The reference keeps a normalized star — fact ``inbox``, dim
``inbox_contacts`` (UNIQUE realname+email, maillog.py:16), bridge
``inbox_tocc`` — and does a per-recipient get-or-insert inside the
ingest transaction (``get_contact``, maillog.py:66-78).

Spark has no transactional get-or-insert; the equivalent per-batch
choreography (SURVEY §7 Phase 3) is:

1. collect the batch's distinct contacts (sender ∪ recipients)
2. anti-join against the existing dim → append only the new ones
3. join facts/bridge rows against the (updated) dim for FK ids

Contact ids must be stable across re-runs (the reference's
autoincrement PK is an insert-order accident; our tests need
determinism): id = xxhash64(realname, email) — content-addressed,
collision odds ~n²/2⁶⁴. Message ids: per-batch row_number over a
deterministic ordering + a caller-supplied base offset (monotone
batch ids come free from foreachBatch's batch_id).

Single-writer assumption documented as in the reference (one ingest
process per source).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def contact_id(realname: F.Column, email_address: F.Column) -> F.Column:
    return F.xxhash64(realname, F.lit("\x1f"), email_address)


def extract_batch_contacts(parsed: DataFrame) -> DataFrame:
    """Distinct contacts appearing in a parsed-email batch (sender and
    every recipient)."""
    senders = parsed.select(
        F.col("sender.realname").alias("realname"),
        F.col("sender.email_address").alias("email_address"),
    ).where(F.col("realname").isNotNull() | F.col("email_address").isNotNull())
    recips = parsed.select(F.explode("recipients").alias("r")).select(
        F.col("r.realname").alias("realname"),
        F.col("r.email_address").alias("email_address"),
    )
    return senders.unionByName(recips).distinct()


def upsert_contacts(existing: DataFrame | None, batch_contacts: DataFrame) -> DataFrame:
    """J3 parity (maillog.py:66-78): new dim = existing ∪ (batch ∖
    existing). Anti-join on the content id; the dim side is small and
    broadcasts. The batch is deduped on the content id HERE, not just
    upstream: the reference's UNIQUE(realname, email) constraint
    (maillog.py:16) holds regardless of caller discipline, so a batch
    carrying the same contact twice must still land once (found by the
    txn-merge property test)."""
    batch = batch_contacts.select(
        contact_id(F.col("realname"), F.col("email_address")).alias("id"),
        "realname",
        "email_address",
    ).dropDuplicates(["id"])
    if existing is None:
        return batch
    new = batch.join(F.broadcast(existing.select("id")), "id", "left_anti")
    return existing.select("id", "realname", "email_address").unionByName(new)


def build_inbox_batch(parsed: DataFrame, base_id: int = 0) -> DataFrame:
    """Fact rows with stable ids: row_number over (timestamp, path)
    within the batch + base offset (reference PK: maillog.py:49)."""
    w = Window.orderBy("timestamp", "path")
    return parsed.select(
        (F.row_number().over(w) + F.lit(base_id)).alias("id"),
        "timestamp",
        "subject",
        contact_id(F.col("sender.realname"), F.col("sender.email_address")).alias(
            "sender_id"
        ),
        "size",
        "date",
        "recipients",
    )


def build_tocc_bridge(inbox_batch: DataFrame) -> DataFrame:
    """Bridge rows (maillog.py:28-44): one (msg_id, contact_id) per
    distinct recipient — recipient dedup already applied first-seen at
    parse time (A5, maillog.py:88-94); the UNIQUE pair constraint
    (maillog.py:43) becomes a distinct()."""
    return (
        inbox_batch.select("id", F.explode("recipients").alias("r"))
        .select(
            F.col("id").alias("msg_id"),
            contact_id(F.col("r.realname"), F.col("r.email_address")).alias(
                "contact_id"
            ),
        )
        .distinct()
    )


def inbox_with_contacts(
    inbox: DataFrame, contacts: DataFrame, tocc: DataFrame
) -> DataFrame:
    """Report-side joins J1+J2 (maillog.py:53-59,127-129): resolve
    sender N:1 and collect recipients per message as a sorted array of
    (realname, email_address) structs (O3 tuple sort, maillog.py:129).
    Both dims broadcast; collect_list order is pinned by array_sort."""
    sender = contacts.select(
        F.col("id").alias("sender_id"),
        F.col("realname").alias("sender_realname"),
        F.col("email_address").alias("sender_email"),
    )
    recips = (
        tocc.join(
            F.broadcast(
                contacts.select(
                    F.col("id").alias("contact_id"), "realname", "email_address"
                )
            ),
            "contact_id",
        )
        .groupBy("msg_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("realname", "email_address"))
            ).alias("tocc")
        )
    )
    return (
        inbox.drop("recipients")
        .join(F.broadcast(sender), "sender_id", "left")
        .join(recips, inbox.id == recips.msg_id, "left")
        .drop("msg_id")
    )
