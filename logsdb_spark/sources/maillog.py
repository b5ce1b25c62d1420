"""S3 — e-mail source (reference: src/logsdb/maillog.py:141-163).

The reference consumes ONE whole RFC-5322 message as raw bytes per
process invocation (maillog.py:143), parses headers with Python's
``email`` package, and records:

- size = byte length of the raw message      (maillog.py:144)
- subject, default "NO SUBJECT", truncated to 2048 (maillog.py:98,153)
- sender = first From address                (maillog.py:154)
- recipients = To + CC addresses, deduplicated by contact with
  first-seen order preserved                 (maillog.py:88-94,147-150)
- date = parsed Date header                  (maillog.py:155)
- timestamp = ingest wall-clock              (maillog.py:97)

Spark-first shape: messages arrive as files
(``spark.read.format("binaryFile")`` / ``readStream``), one message
per file — the moral equivalent of one process per message. Header
parsing is genuinely not expressible in Catalyst expressions (RFC-5322
folding, encoded-words, address grammar), so this is one of the two
sanctioned Python paths in the engine (SURVEY §2.11): an Arrow-batched
mapInPandas, not a row-at-a-time UDF.
"""

from __future__ import annotations

import email
import email.policy
import email.utils
from collections.abc import Iterator
from datetime import datetime, timezone

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

CONTACT_STRUCT = StructType(
    [
        StructField("realname", StringType()),
        StructField("email_address", StringType()),
    ]
)

PARSED_EMAIL_SCHEMA = StructType(
    [
        StructField("path", StringType()),
        StructField("timestamp", TimestampType()),
        StructField("subject", StringType()),
        StructField("sender", CONTACT_STRUCT),
        StructField("recipients", ArrayType(CONTACT_STRUCT)),
        StructField("size", LongType()),
        StructField("date", TimestampType()),
    ]
)


def _parse_one(raw: bytes, ingest_ts: datetime) -> dict:
    """Mirror of the reference's extraction (maillog.py:141-158)."""
    msg = email.message_from_bytes(raw, policy=email.policy.default)
    recipients: list[tuple[str, str]] = []
    seen: set[tuple[str, str]] = set()
    for hdr in ("To", "CC"):
        for addr in msg.get(hdr).addresses if msg.get(hdr) else ():
            key = (addr.display_name, addr.addr_spec)
            if key not in seen:  # first-seen dedup (maillog.py:88-94)
                seen.add(key)
                recipients.append(key)
    subject = msg.get("Subject") or "NO SUBJECT"
    sender = None
    if msg.get("From") and msg["From"].addresses:
        a = msg["From"].addresses[0]
        sender = (a.display_name, a.addr_spec)
    date = None
    if msg.get("Date"):
        try:
            date = msg["Date"].datetime
        except (TypeError, ValueError):
            date = None
    return {
        "timestamp": ingest_ts,
        "subject": str(subject)[:2048],
        "sender": sender,
        "recipients": recipients,
        "size": len(raw),
        "date": date,
    }


def parse_email_messages(
    files: DataFrame, now: datetime | None = None
) -> DataFrame:
    """(path, content:binary) → PARSED_EMAIL_SCHEMA rows.

    ``now`` injects the ingest timestamp for deterministic tests
    (reference uses wall-clock at maillog.py:97)."""
    fixed_now = now

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ts = fixed_now or datetime.now(timezone.utc)
        for pdf in batches:
            out = []
            for path, content in zip(pdf["path"], pdf["content"]):
                rec = _parse_one(bytes(content), ts)
                rec["path"] = path
                out.append(rec)
            yield pd.DataFrame(out, columns=[f.name for f in PARSED_EMAIL_SCHEMA.fields])

    return files.select("path", "content").mapInPandas(run, PARSED_EMAIL_SCHEMA)
