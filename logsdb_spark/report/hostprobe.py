"""Host-state collectors — the thin impure shell around the pure,
injected checks in ``dailyreport`` (reference: dailyreport.py:29-48,
74-107 reads /proc/loadavg, shutil.disk_usage, the errlogs dir,
/var/run/reboot-required and vnstat inline; maillog.py:119-126 shells
out to postconf).

Every probe is gated: a missing file, absent binary, or failed
subprocess degrades to the HostState default instead of killing the
report — the report's job is to surface host state, not to depend on
it. The pure checks stay separately unit-tested with injected values;
these collectors get a smoke test on whatever the host provides.
"""

from __future__ import annotations

import json
import shutil
import subprocess
from pathlib import Path

from .dailyreport import HostState

NETDEVICE = "eth0"


def _loadavg() -> tuple[float, float, float]:
    try:
        with open("/proc/loadavg") as fp:
            a, b, c = fp.read().split()[:3]
        return (float(a), float(b), float(c))
    except (OSError, ValueError):
        return (0.0, 0.0, 0.0)


def _disk(root: str = "/") -> tuple[int, int]:
    try:
        usage = shutil.disk_usage(root)
        return usage.total, usage.used
    except OSError:
        return (1, 0)


def _errlog_names(logs_dir: str) -> list[str]:
    try:
        return sorted(
            p.name for p in Path(logs_dir).iterdir() if p.stat().st_size > 0
        )
    except OSError:
        return []


def _reboot() -> tuple[bool, list[str]]:
    if not Path("/var/run/reboot-required").exists():
        return False, []
    try:
        with open("/var/run/reboot-required.pkgs") as fp:
            return True, fp.read().splitlines()
    except OSError:
        return True, []


def _vnstat(iface: str = NETDEVICE) -> tuple[int, int]:
    """Yesterday's (tx, rx) bytes via ``vnstat --json``
    (reference dailyreport.py:92-107)."""
    try:
        out = subprocess.check_output(
            ["vnstat", "--json", "d", "2", "-i", iface],
            text=True,
            stderr=subprocess.DEVNULL,
        )
        yesterday = json.loads(out)["interfaces"][0]["traffic"]["day"][0]
        return int(yesterday["tx"]), int(yesterday["rx"])
    except (OSError, subprocess.CalledProcessError, ValueError, KeyError,
            IndexError):
        return (0, 0)


def _mailbox_nonempty(mailbox: str) -> bool:
    try:
        p = Path(mailbox)
        return p.exists() and p.stat().st_size > 0
    except OSError:
        return False


def collect_host_state(cfg) -> HostState:
    """Fill a HostState from the live host, per the reference's probe
    set. ``cfg`` is a logsdb_spark.config.Config (mailbox / logs_dir
    come from its [dailyreport] section)."""
    disk_size, disk_used = _disk()
    reboot_required, reboot_pkgs = _reboot()
    vnstat_tx, vnstat_rx = _vnstat()
    return HostState(
        loadavg=_loadavg(),
        disk_size=disk_size,
        disk_used=disk_used,
        errlog_names=_errlog_names(cfg.dailyreport.logs_dir),
        logs_dir=cfg.dailyreport.logs_dir,
        reboot_required=reboot_required,
        reboot_pkgs=reboot_pkgs,
        vnstat_tx=vnstat_tx,
        vnstat_rx=vnstat_rx,
        mailbox_nonempty=_mailbox_nonempty(cfg.dailyreport.mailbox),
    )


def local_mail_domains() -> set[str]:
    """Domains this host accepts mail for, via ``postconf -hx
    mydestination`` (reference maillog.py:119-126); empty when postfix
    is absent."""
    try:
        out = subprocess.check_output(
            ["postconf", "-hx", "mydestination"],
            text=True,
            stderr=subprocess.DEVNULL,
        )
        return set(out.strip().lower().split(", ")) - {""}
    except (OSError, subprocess.CalledProcessError):
        return set()
