"""Driver-side text rendering for the daily report.

The reference renders with PrettyTable (apache_access.py:54-56,74;
authfail.py:31-33,43) and %-width formatting (apache_access.py:75-83).
prettytable is not available in this container, so ``text_table`` is a
from-scratch renderer reproducing PrettyTable's DEFAULT style: '+'
junctions, '-' rules, '| ' padding, centered headers (extra space to
the right), per-column 'l'/'r' data alignment. Report text stays in
driver Python — rendering human-scale output is not a distributed
concern (SURVEY §7 "Exact text formatting").
"""

from __future__ import annotations

from collections.abc import Sequence


def longint(n: int) -> str:
    """F1 (core.py:51-57): group digits in threes with spaces."""
    ns = str(n)
    groups = []
    while len(ns) > 3:
        groups.append(ns[-3:])
        ns = ns[:-3]
    groups.append(ns)
    return " ".join(reversed(groups))


def _center(s: str, width: int) -> str:
    left = (width - len(s)) // 2
    return " " * left + s + " " * (width - len(s) - left)


def text_table(
    headers: Sequence[str],
    rows: Sequence[Sequence[object]],
    align: Sequence[str] | None = None,
) -> str:
    """PrettyTable-default-compatible ASCII table. ``align`` is one of
    'l'/'r' per column (PrettyTable's default is centered; the
    reference always sets l/r explicitly, so only those are needed —
    anything else falls back to centered)."""
    align = align or ["c"] * len(headers)
    cells = [[str(c) for c in row] for row in rows]
    widths = [
        max(len(headers[i]), *(len(r[i]) for r in cells)) if cells else len(headers[i])
        for i in range(len(headers))
    ]
    rule = "+" + "+".join("-" * (w + 2) for w in widths) + "+"
    out = [rule, "|" + "|".join(f" {_center(h, w)} " for h, w in zip(headers, widths)) + "|", rule]
    for row in cells:
        line = []
        for val, w, a in zip(row, widths, align):
            if a == "r":
                line.append(f" {val:>{w}} ")
            elif a == "l":
                line.append(f" {val:<{w}} ")
            else:
                line.append(f" {_center(val, w)} ")
        out.append("|" + "|".join(line) + "|")
    out.append(rule)
    return "\n".join(out)


def render_address(realname: str, email_address: str) -> str:
    """F9 (maillog.py:22-25): str(email.headerregistry.Address(...)) —
    display form without encoding non-ASCII."""
    from email.headerregistry import Address

    return str(Address(realname or "", addr_spec=email_address))


def width_aligned_pair(label_a: str, value_a: str, label_b: str, value_b: str) -> str:
    """The reference's '%*s' two-line totals pattern
    (apache_access.py:75-83, dailyreport.py:34-48,92-107)."""
    width = max(len(value_a), len(value_b))
    return f"{label_a}{value_a:>{width}}\n{label_b}{value_b:>{width}}\n"
