"""CLI smoke tests (reference parity: __main__.py:10-77 — the
reference's own tox gate is exactly ``logsdb --help``). Help output is
checked per subcommand via subprocess; one end-to-end run covers
ingest → dailyreport emission, and the host-probe collectors get a
live smoke on this container.
"""

from __future__ import annotations

import subprocess
import sys
from datetime import datetime, timezone

import pytest

APACHE_OK = (
    '2026-08-12 10:00:00 +0000|ex.com|443|203.0.113.7|10|20|30|200|'
    '["-", "GET / HTTP/1.1", "GET", "/", "HTTP/1.1", "-", "UA"]'
)


def _cli(*args, **kw):
    return subprocess.run(
        [sys.executable, "-m", "logsdb_spark", *args],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=300,
        **kw,
    )


def test_help_smoke():
    out = _cli("--help")
    assert out.returncode == 0
    for sub in ("apache-access", "authfail", "jsonl", "maillog", "dailyreport"):
        assert sub in out.stdout


@pytest.mark.parametrize(
    "sub", ["apache-access", "authfail", "jsonl", "maillog", "dailyreport"]
)
def test_subcommand_help(sub, tmp_path):
    cfg = tmp_path / "cfg.toml"
    cfg.write_text(
        "[storage]\ntables_dir='/tmp/x'\ncheckpoint_dir='/tmp/c'\n"
        "[dailyreport]\nrecipient='ops@example.com'\nmailbox='/var/mail/r'\n"
        "logs_dir='/var/log/errors'\n"
    )
    out = _cli("-c", str(cfg), sub, "--help")
    assert out.returncode == 0, out.stderr


def test_version():
    out = _cli("-V")
    assert out.returncode == 0
    assert out.stdout.strip()


def test_missing_config_fails():
    out = _cli("-c", "/nonexistent/cfg.toml", "dailyreport")
    assert out.returncode != 0


def test_end_to_end_ingest_then_report(tmp_path):
    """apache-access ingest from a file, then dailyreport to a pipe —
    the non-TTY branch must print a serialized EmailMessage with the
    apache section present."""
    src = tmp_path / "src"
    src.mkdir()
    (src / "a.log").write_text(APACHE_OK + "\n")
    tables = tmp_path / "tables"
    cfg = tmp_path / "cfg.toml"
    cfg.write_text(
        f"[storage]\ntables_dir='{tables}'\ncheckpoint_dir='{tmp_path}/ckpt'\n"
        "[features]\napache_access=true\n"
        "[dailyreport]\nrecipient='ops@example.com'\n"
        f"mailbox='{tmp_path}/mailbox'\nlogs_dir='{tmp_path}/errlogs'\n"
    )
    ing = _cli("-c", str(cfg), "apache-access", "-i", str(src))
    assert ing.returncode == 0, ing.stderr
    assert (tables / "apache_access").exists()

    rep = _cli("-c", str(cfg), "dailyreport")
    assert rep.returncode == 0, rep.stderr
    assert "Subject: " in rep.stdout
    assert "To: ops@example.com" in rep.stdout
    assert "Load: " in rep.stdout  # live /proc/loadavg probe
    assert "Space used on root partition" in rep.stdout


def test_strict_halt_emits_error_record(tmp_path):
    """An unparsable line under --strict (the default) must exit 1 with
    the reference's JSON error-record shape on stderr
    (apache_access.py:128-143)."""
    import json

    src = tmp_path / "src"
    src.mkdir()
    (src / "bad.log").write_text("this is not an access log line\n")
    cfg = tmp_path / "cfg.toml"
    cfg.write_text(
        f"[storage]\ntables_dir='{tmp_path}/t'\ncheckpoint_dir='{tmp_path}/c'\n"
        "[dailyreport]\nrecipient='r@e.com'\n"
        f"mailbox='{tmp_path}/mb'\nlogs_dir='{tmp_path}/el'\n"
    )
    out = _cli("-c", str(cfg), "apache-access", "-i", str(src))
    assert out.returncode == 1
    rec = json.loads(out.stderr.strip().splitlines()[-1])
    assert rec["error_type"] == "StrictIngestError"
    assert "time" in rec and "error" in rec


def test_collect_host_state_live():
    """Host probes on this container: loadavg/disk are real, vnstat and
    postconf are absent and must degrade to defaults, not raise."""
    from logsdb_spark.config import Config
    from logsdb_spark.report.hostprobe import (
        collect_host_state,
        local_mail_domains,
    )

    cfg = Config.from_dict(
        {
            "storage": {"tables_dir": "/tmp/t", "checkpoint_dir": "/tmp/c"},
            "dailyreport": {
                "recipient": "r@e.com",
                "mailbox": "/nonexistent/mailbox",
                "logs_dir": "/nonexistent/errlogs",
            },
        }
    )
    host = collect_host_state(cfg)
    assert host.disk_size > 1  # real disk_usage ran
    assert host.loadavg[0] >= 0.0
    assert host.errlog_names == []
    assert host.vnstat_tx == 0 and host.vnstat_rx == 0
    assert local_mail_domains() == set() or local_mail_domains()


def test_render_email_golden():
    """EmailMessage serialization of a small report (reference
    __main__.py:69-75): headers + blank line + body."""
    from logsdb_spark.__main__ import render_email
    from logsdb_spark.report.dailyreport import DailyReport

    msg = render_email(
        DailyReport(subject="[DISK] Status Report: h, 2026-08-12T00:00:00Z",
                    body="Load: 0.1, 0.2, 0.3\n"),
        "ops@example.com",
    )
    assert msg.startswith("Subject: [DISK] Status Report: h, 2026-08-12T00:00:00Z")
    assert "To: ops@example.com" in msg
    assert msg.rstrip().endswith("Load: 0.1, 0.2, 0.3")


def test_authfail_stdin_spool(tmp_path):
    """The reference reads log lines from stdin; our CLI spools stdin
    into the file stream — pipe two lines in, expect one event and one
    dead letter (lenient mode)."""
    cfg = tmp_path / "cfg.toml"
    tables = tmp_path / "tables"
    cfg.write_text(
        f"[storage]\ntables_dir='{tables}'\ncheckpoint_dir='{tmp_path}/c'\n"
        "[dailyreport]\nrecipient='r@e.com'\n"
        f"mailbox='{tmp_path}/mb'\nlogs_dir='{tmp_path}/el'\n"
    )
    auth_line = (
        "2026-08-12T14:03:11+00:00 h sshd[1]: Failed password for root "
        "from 198.51.100.23 port 1 ssh2"
    )
    out = _cli(
        "-c", str(cfg), "authfail", "--lenient",
        input=auth_line + "\nnot an authfail line\n",
    )
    assert out.returncode == 0, out.stderr
    import pyarrow.parquet as pq

    import glob

    events = sum(
        pq.read_table(f).num_rows
        for f in glob.glob(str(tables / "authfail" / "**" / "*.parquet"), recursive=True)
    )
    dead = sum(
        pq.read_table(f).num_rows
        for f in glob.glob(
            str(tables / "authfail_dead_letter" / "**" / "*.parquet"), recursive=True
        )
    )
    assert events == 1
    assert dead == 1
