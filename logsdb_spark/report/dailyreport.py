"""Daily-report assembly (reference: src/logsdb/dailyreport.py:116-142
plus the three per-source daily_report methods).

Shape: the Spark queries produce the (human-scale) aggregate rows;
everything after ``collect()`` is plain driver Python reproducing the
reference's exact text formats. Host checks (load, disk, errlogs,
reboot, vnstat, mailbox — dailyreport.py:12-107) are injectable
callables so tests can fake the host and the report stays
byte-deterministic.

"now" is injectable everywhere (§4 trap 2): the reference evaluates
``one_day_ago()`` at query-build time (core.py:60-61); we thread an
explicit anchor timestamp into the window predicate.
"""

from __future__ import annotations

import socket
import time
from dataclasses import dataclass, field
from datetime import datetime, timedelta
from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .render import longint, render_address, text_table, width_aligned_pair

# Subject-tag priority sequence (dailyreport.py:14,134-141).
TAGSEQ = ("DISK", "LOGERR", "REBOOT", "MAIL")
DISK_THRESHOLD = 50


def _window(df: DataFrame, now: datetime, ts_col: str = "timestamp") -> DataFrame:
    """P2: timestamp >= now - 24h with an injected 'now'."""
    return df.filter(F.col(ts_col) >= F.lit(now - timedelta(days=1)))


def apache_daily_report(events: DataFrame, now: datetime) -> str:
    """A1+A2+O1 rendered (apache_access.py:52-84): 'Hits | Request'
    table ordered qty desc / reqline asc, then width-aligned byte
    totals via longint. Totals are SUM-of-group-sums accumulated
    driver-side exactly like the reference's Python loop — but the
    group rows themselves come from one distributed agg."""
    rows = (
        _window(events, now)
        .groupBy("reqline")
        .agg(
            F.count(F.lit(1)).alias("qty"),
            F.sum("bytesin").alias("byin"),
            F.sum("bytesout").alias("byout"),
        )
        .orderBy(F.desc("qty"), F.asc("reqline"))
        .collect()
    )
    bytes_in = sum(r.byin for r in rows)
    bytes_out = sum(r.byout for r in rows)
    report = "Website activity in the past 24 hours:\n"
    report += text_table(
        ["Hits", "Request"], [(r.qty, r.reqline) for r in rows], ["r", "l"]
    )
    report += "\n"
    report += width_aligned_pair(
        "Total bytes sent:     ",
        longint(bytes_out),
        "Total bytes received: ",
        longint(bytes_in),
    )
    return report


def authfail_daily_report(events: DataFrame, now: datetime) -> str:
    """A3 rendered (authfail.py:30-45): 'Attempts | IP Address'."""
    rows = (
        _window(events, now)
        .groupBy("src_addr")
        .agg(F.count(F.lit(1)).alias("qty"))
        .orderBy(F.desc("qty"), F.asc("src_addr"))
        .collect()
    )
    return (
        "Failed SSH login attempts in the past 24 hours:\n"
        + text_table(["Attempts", "IP Address"], [(r.qty, r.src_addr) for r in rows], ["r", "l"])
        + "\n"
    )


def maillog_daily_report(
    inbox_resolved: DataFrame, now: datetime, local_domains: set[str]
) -> str:
    """Mail listing (maillog.py:106-138): chronological (O2: timestamp,
    id), sender via J1, recipients via J2 filtered by the local-domain
    semi-join J4 (domain set lowercased, contact side compared raw —
    matching maillog.py:119-128) and sorted by (realname, email) (O3).

    ``inbox_resolved`` is operators.upsert.inbox_with_contacts output.
    """
    title = "E-mails received in the past 24 hours:"
    msgs = (
        _window(inbox_resolved, now)
        .orderBy(F.asc("timestamp"), F.asc("id"))
        .collect()
    )
    if not msgs:
        return title + " none\n"
    dests = {d.lower() for d in local_domains}
    report = title + "\n---\n"
    for m in msgs:
        recips = [
            c
            for c in (m.tocc or [])
            if c.email_address.partition("@")[2] in dests
        ]
        recips.sort(key=lambda c: (c.realname, c.email_address))
        sender = render_address(m.sender_realname, m.sender_email)
        to = ", ".join(render_address(c.realname, c.email_address) for c in recips)
        # The reference's date column is non-nullable because its
        # ingest CRASHES on a Date-less message (maillog.py:155 reads
        # msg["Date"].datetime unguarded); our parser tolerates and
        # stores NULL, so the report renders it instead of raising —
        # one bad header must not kill the whole daily report.
        date_s = (
            m.date.strftime("%Y-%m-%dT%H:%M:%SZ") if m.date else "NO DATE"
        )
        report += (
            f"From:    {sender}\n"
            f"To:      {to}\n"
            f"Subject: {m.subject}\n"
            f"Date:    {date_s}\n"
            f"Size:    {m.size}\n"
            "---\n"
        )
    return report


# ---------------------------------------------------------------------------
# Host checks (dailyreport.py:12-107) — pure driver probes, injectable.
# ---------------------------------------------------------------------------


def check_load(loadavg: tuple[float, float, float]) -> str:
    return "Load: " + ", ".join(str(x) for x in loadavg) + "\n"


def check_disk(fssize: int, fsused: int, tags: set[str]) -> str:
    sused, ssize = longint(fsused), longint(fssize)
    width = max(len(sused), len(ssize))
    pct = 100 * fsused / fssize
    if pct >= DISK_THRESHOLD:
        tags.add("DISK")
    return "Space used on root partition:\n    %*s\n  / %*s\n   (%f%%)\n" % (
        width,
        sused,
        width,
        ssize,
        pct,
    )


def check_errlogs(nonempty_names: list[str], logs_dir: str, tags: set[str]) -> str | None:
    if not nonempty_names:
        return None
    tags.add("LOGERR")
    listing = "".join(f"    {n}\n" for n in nonempty_names)
    return f"The following files in {logs_dir} are nonempty:\n{listing}"


def check_reboot(required: bool, pkgs: list[str], tags: set[str]) -> str | None:
    if not required:
        return None
    tags.add("REBOOT")
    report = "Reboot required by the following packages:"
    if pkgs:
        report += "\n" + "".join(f"    {p}\n" for p in pkgs)
    else:
        report += " UNKNOWN\n"
    return report


def check_vnstat(tx: int, rx: int) -> str:
    return width_aligned_pair(
        "Data sent yesterday:     ",
        longint(tx) + " B",
        "Data received yesterday: ",
        longint(rx) + " B",
    )


@dataclass
class DailyReport:
    subject: str
    body: str


@dataclass
class HostState:
    """Injected host facts (tests fake these; production fills them
    from /proc, shutil.disk_usage, vnstat — dailyreport.py:29-107)."""

    loadavg: tuple[float, float, float] = (0.0, 0.0, 0.0)
    disk_size: int = 1
    disk_used: int = 0
    errlog_names: list[str] = field(default_factory=list)
    logs_dir: str = "/var/log/errors"
    reboot_required: bool = False
    reboot_pkgs: list[str] = field(default_factory=list)
    vnstat_tx: int = 0
    vnstat_rx: int = 0
    mailbox_nonempty: bool = False
    hostname: str | None = None


def get_daily_report(
    now: datetime,
    host: HostState,
    mail_section: Callable[[], str] | None = None,
    authfail_section: Callable[[], str] | None = None,
    apache_section: Callable[[], str] | None = None,
) -> DailyReport:
    """Assembly in the reference's exact order (dailyreport.py:116-142):
    mailbox tag → errlogs → reboot → load → disk → vnstat → maillog →
    authfail → apache; empty sections dropped; 'Nothing to report\\n'
    fallback; subject = priority tags + sorted rest + hostname + UTC
    time."""
    tags: set[str] = set()
    if host.mailbox_nonempty:
        tags.add("MAIL")
    reports = [
        check_errlogs(host.errlog_names, host.logs_dir, tags),
        check_reboot(host.reboot_required, host.reboot_pkgs, tags),
        check_load(host.loadavg),
        check_disk(host.disk_size, host.disk_used, tags),
        check_vnstat(host.vnstat_tx, host.vnstat_rx),
    ]
    for section in (mail_section, authfail_section, apache_section):
        reports.append(section() if section is not None else None)
    body = "\n".join(r for r in reports if r is not None and r != "")
    if not body:
        body = "Nothing to report\n"
    subject = ""
    remaining = set(tags)
    for t in TAGSEQ:
        if t in remaining:
            subject += f"[{t}] "
            remaining.remove(t)
    for t in sorted(remaining):
        subject += f"[{t}] "
    hostname = host.hostname or socket.gethostname()
    stamp = time.strftime("%Y-%m-%dT%H:%M:%SZ", now.utctimetuple())
    subject += f"Status Report: {hostname}, {stamp}"
    return DailyReport(subject, body)


def run_daily_report(spark, cfg, host: HostState, now: datetime,
                     local_domains: set[str] | None = None) -> DailyReport:
    """Config-driven orchestration (reference dailyreport.py:116-142 +
    __main__.py:57-61): load the ingested tables from
    ``cfg.storage.tables_dir`` and assemble the report, with each DB
    section gated on its feature flag (config.py:19-22 →
    dailyreport.py:125-130). Missing tables with the flag ON raise —
    same as the reference querying a table it never created.

    Sections are passed as thunks so a disabled flag means the query is
    never built, let alone run (the reference skips the SELECT
    entirely)."""
    import os

    from ..operators.upsert import inbox_with_contacts

    def _load(name: str) -> DataFrame:
        return spark.read.parquet(os.path.join(cfg.storage.tables_dir, name))

    mail_section = None
    if cfg.features.maillog:
        resolved = inbox_with_contacts(
            _load("inbox"), _load("inbox_contacts"), _load("inbox_tocc")
        )
        mail_section = lambda: maillog_daily_report(  # noqa: E731
            resolved, now, local_domains or set()
        )

    authfail_section = None
    if cfg.features.authfail:
        authfail_section = lambda: authfail_daily_report(  # noqa: E731
            _load("authfail"), now
        )

    apache_section = None
    if cfg.features.apache_access:
        apache_section = lambda: apache_daily_report(  # noqa: E731
            _load("apache_access"), now
        )

    return get_daily_report(
        now,
        host,
        mail_section=mail_section,
        authfail_section=authfail_section,
        apache_section=apache_section,
    )
