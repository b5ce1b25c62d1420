"""Parser unit tests (SURVEY §5.3): per-line cases for S1/S2/S3
including the tricky ones — 'message repeated', 'invalid user',
non-ASCII reencode, missing Subject, recipient dedup."""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import Row

from logsdb_spark.sources import apache_access, authfail, maillog

APACHE_LINE = (
    '2026-08-12 23:59:58 +0000|example.com|443|203.0.113.7|412|15032|2741|200|'
    '["-", "GET /index.html HTTP/1.1", "GET", "/index.html", "HTTP/1.1", '
    '"https://ref.example/", "Mozilla/5.0"]'
)
# UTF-8 'Grüße' mangled through latin-1, as Apache logs it (ü -> Ã¼ etc.)
APACHE_NONASCII = (
    '2026-08-12 10:00:00 +0000|example.com|443|203.0.113.7|10|20|30|404|'
    '["-", "GET /GrÃ¼Ãe HTTP/1.1", "GET", "/GrÃ¼Ãe", '
    '"HTTP/1.1", "-", "curl"]'
)


def test_apache_parse_basic(spark):
    df = spark.createDataFrame([Row(value=APACHE_LINE)])
    out = apache_access.good_events(apache_access.parse_apache_lines(df)).collect()
    assert len(out) == 1
    r = out[0]
    assert r.host == "example.com"
    assert r.port == 443
    assert r.src_addr == "203.0.113.7"
    assert r.authuser == "-"
    assert r.bytesin == 412
    assert r.bytesout == 15032
    assert r.microsecs == 2741
    assert r.status == 200
    assert r.reqline == "GET /index.html HTTP/1.1"
    assert r.method == "GET"
    assert r.path == "/index.html"
    assert r.protocol == "HTTP/1.1"
    assert r.referer == "https://ref.example/"
    assert r.user_agent == "Mozilla/5.0"
    assert r.timestamp == datetime(2026, 8, 12, 23, 59, 58)


def test_apache_reencode_latin1_utf8(spark):
    """F4 (apache_access.py:146-147): latin-1-mangled UTF-8 restored."""
    df = spark.createDataFrame([Row(value=APACHE_NONASCII)])
    r = apache_access.good_events(apache_access.parse_apache_lines(df)).collect()[0]
    assert r.path == "/Grüße"
    assert r.reqline == "GET /Grüße HTTP/1.1"


def test_apache_dead_letter(spark):
    df = spark.createDataFrame(
        [Row(value="garbage line"), Row(value=APACHE_LINE)]
    )
    parsed = apache_access.parse_apache_lines(df)
    assert apache_access.good_events(parsed).count() == 1
    dead = apache_access.dead_letters(parsed).collect()
    assert len(dead) == 1
    assert "garbage line" in dead[0].error_json


AUTH_LINES = [
    # plain failed password
    "2026-08-12T14:03:11.528452+00:00 myhost sshd[12345]: Failed password for invalid user admin from 198.51.100.23 port 54712 ssh2",
    # no 'invalid user' prefix
    "2026-08-12T14:03:12.100000+00:00 myhost sshd[12345]: Failed password for root from 198.51.100.23 port 54713 ssh2",
    # Invalid-user shape (no ssh2)
    "2026-08-12T14:03:13+00:00 myhost sshd[12346]: Invalid user oracle from 203.0.113.99 port 40022",
    # repeated wrapper (authfail.py:51-52,58)
    "2026-08-12T14:03:14+00:00 myhost sshd[12347]: message repeated 3 times: [ Failed password for root from 198.51.100.23 port 54714 ssh2]",
    # keyboard-interactive method + username with spaces
    "2026-08-12T14:03:15+00:00 myhost sshd[12348]: Failed keyboard-interactive/pam for invalid user a b c from 192.0.2.1 port 2222 ssh2",
]


def test_authfail_parse_shapes(spark):
    df = spark.createDataFrame([Row(value=ln) for ln in AUTH_LINES])
    out = authfail.good_events(authfail.parse_authfail_lines(df)).orderBy("timestamp").collect()
    assert len(out) == 5
    assert [r.username for r in out] == ["admin", "root", "oracle", "root", "a b c"]
    assert out[0].src_addr == "198.51.100.23"
    assert out[2].src_addr == "203.0.113.99"
    assert out[4].src_addr == "192.0.2.1"
    assert out[0].timestamp == datetime(2026, 8, 12, 14, 3, 11, 528452)


def test_authfail_unmatched_goes_dead(spark):
    """authfail.py:80-81: unparsable line is an error — routed to the
    dead-letter side here rather than halting the stream."""
    df = spark.createDataFrame(
        [Row(value="2026-08-12T14:03:16+00:00 myhost sshd[1]: something else")]
    )
    parsed = authfail.parse_authfail_lines(df)
    assert authfail.good_events(parsed).count() == 0
    assert authfail.dead_letters(parsed).count() == 1


RAW_EMAIL = b"""From: "Alice Example" <alice@example.org>
To: "Bob Local" <bob@mydomain.example>, carol@mydomain.example
CC: "Bob Local" <bob@mydomain.example>
Subject: =?utf-8?q?Gr=C3=BC=C3=9Fe_aus_Berlin?=
Date: Tue, 12 Aug 2026 09:15:00 +0200

Body text
"""

NO_SUBJECT_EMAIL = b"""From: x@y.example
To: z@mydomain.example
Date: Tue, 12 Aug 2026 10:00:00 +0000

hi
"""


def test_maillog_parse(spark):
    now = datetime(2026, 8, 12, 12, 0, 0, tzinfo=timezone.utc)
    files = spark.createDataFrame(
        [Row(path="m1.eml", content=bytearray(RAW_EMAIL)),
         Row(path="m2.eml", content=bytearray(NO_SUBJECT_EMAIL))]
    )
    out = {r.path: r for r in maillog.parse_email_messages(files, now=now).collect()}
    m1 = out["m1.eml"]
    assert m1.subject == "Grüße aus Berlin"
    assert m1.sender.realname == "Alice Example"
    assert m1.sender.email_address == "alice@example.org"
    # To ∪ CC deduped first-seen (maillog.py:88-94): Bob appears once
    assert [(c.realname, c.email_address) for c in m1.recipients] == [
        ("Bob Local", "bob@mydomain.example"),
        ("", "carol@mydomain.example"),
    ]
    assert m1.size == len(RAW_EMAIL)
    m2 = out["m2.eml"]
    assert m2.subject == "NO SUBJECT"  # maillog.py:153
    assert m2.sender.realname == ""


def test_apache_bad_numeric_goes_dead(spark):
    """A non-numeric value in an always-present numeric field (port,
    bytes, status...) must flag the line corrupt — the reference's
    int() raises there; a silent NULL metric would be data corruption
    (sources/apache_access.py numerics block)."""
    bad = APACHE_LINE.replace("|443|", "|not_a_port|")
    df = spark.createDataFrame([Row(value=bad), Row(value=APACHE_LINE)])
    parsed = apache_access.parse_apache_lines(df)
    assert apache_access.good_events(parsed).count() == 1
    dead = apache_access.dead_letters(parsed).collect()
    assert len(dead) == 1
    assert "not_a_port" in dead[0].error_json


def test_jsonl_good_and_dead_split(spark):
    """JSONL source: valid rows parse typed; unparsable JSON, missing
    required fields, and bad timestamps dead-letter with a JSON error
    record (never silently NULL into good rows)."""
    from logsdb_spark.sources.jsonl import (
        dead_letters,
        good_events,
        parse_jsonl_lines,
    )

    lines = spark.createDataFrame(
        [
            ('{"event_id": 1, "ts": "2024-01-01T00:09:58.778549Z", '
             '"user_id": 7, "event_type": "view", "value": 12.5}',),
            ('{"event_id": 2, "ts": "2024-01-01T01:00:00Z", '
             '"user_id": 8, "event_type": "click"}',),  # value optional
            ("not json at all",),
            ('{"event_id": 3, "user_id": 9, "event_type": "view"}',),  # no ts
            ('{"event_id": 4, "ts": "yesterday-ish", '
             '"user_id": 10, "event_type": "view"}',),  # bad ts
        ],
        "value string",
    )
    parsed = parse_jsonl_lines(lines)
    good = good_events(parsed).collect()
    assert {r.event_id for r in good} == {1, 2}
    by_id = {r.event_id: r for r in good}
    assert by_id[1].value == 12.5 and by_id[2].value is None
    assert by_id[1].ts.isoformat().startswith("2024-01-01T00:09:58.778549")

    dead = dead_letters(parsed).collect()
    assert len(dead) == 3
    import json as _json

    errs = sorted(_json.loads(r.error)["error"] for r in dead)
    assert errs == ["bad timestamp", "missing required field", "unparsable JSON"]


def test_apache_invalid_utf8_goes_dead(spark):
    """Genuinely latin-1 bytes (not mangled UTF-8) fail the reencode
    round-trip and must dead-letter — the reference's
    encode('latin-1').decode('utf-8') RAISES there
    (apache_access.py:128-143); silently committing U+FFFD mojibake
    as a good event would diverge."""
    line = (
        '2026-08-12 10:00:00 +0000|example.com|443|203.0.113.7|10|20|30|404|'
        '["-", "GET /café HTTP/1.1", "GET", "/café", '
        '"HTTP/1.1", "-", "curl"]'
    )
    parsed = apache_access.parse_apache_lines(
        spark.createDataFrame([Row(value=line)])
    )
    assert apache_access.good_events(parsed).count() == 0
    assert apache_access.dead_letters(parsed).count() == 1


def test_authfail_wrapped_invalid_user_parses(spark):
    """'message repeated N times: [ Invalid user ... ]' — the syslog
    wrapper around shape 2. The reference's pattern omits the closing
    bracket and HALTS on such lines; we parse them (documented
    divergence, see INVALID_RE) so brute-force counts stay complete."""
    line = (
        "2024-01-01T00:00:00+00:00 host sshd[1]: message repeated 3 times: "
        "[ Invalid user bob from 1.2.3.4 port 22]"
    )
    out = authfail.parse_authfail_lines(
        spark.createDataFrame([Row(value=line)])
    ).collect()
    assert len(out) == 1 and not out[0]._corrupt
    assert out[0].username == "bob" and out[0].src_addr == "1.2.3.4"
