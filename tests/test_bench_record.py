"""The bench stdout line must stay under the capture window.

Round 9 lost its bench record: the driver keeps only the last ~2,000
chars of stdout and the JSON line had grown to 2,250 bytes, so
BENCH_r09.json recorded ``parsed: null``.  Round 14 additionally made
line MEMBERSHIP deterministic (name-keyed ELIDE_FIRST, not
fastest-first): the r13 PERF diff misread timing-dependent elision as
dropped/new queries.  These tests pin both properties against the FULL
headline registry with pessimistic timing widths.
"""

from __future__ import annotations

import json

import bench


def test_line_under_budget_with_pessimistic_timings():
    # 99.99 s per query is far beyond any observed sf0.1 timing
    # (worst headline entry ever recorded: 6.5 s) — if the line fits
    # with worst-case value widths for every registered headline
    # query, any real run fits too.
    timings = {name: 99.99 for name in bench.HEADLINE}
    line = bench.render_record(
        total=sum(timings.values()), timings=timings, sf=0.1, reps=2
    )
    assert len(line) < bench.LINE_BUDGET
    rec = json.loads(line)
    assert rec["metric"] == "headline_queries_total"
    assert rec["unit"] == "sec"
    shown = rec["queries"]
    assert set(shown) <= set(bench.HEADLINE)
    # everything not shown is in the deterministic elision queue's
    # prefix — nothing outside ELIDE_FIRST order silently vanishes
    hidden = {n for n in bench.HEADLINE if n not in shown}
    queue = [n for n in bench.ELIDE_FIRST if n in bench.HEADLINE] + [
        n for n in reversed(bench.HEADLINE) if n not in bench.ELIDE_FIRST]
    assert hidden == set(queue[: len(hidden)])


def test_line_membership_is_timing_independent():
    """The SAME query set must appear on the line no matter the
    timings — fast run, slow run, or wildly skewed — so PERF's
    round-over-round per-query diff never reports phantom
    drops/additions (the r13 failure this replaces)."""
    runs = [
        {n: 0.05 for n in bench.HEADLINE},
        {n: 9.99 for n in bench.HEADLINE},
        {n: (0.01 if i % 2 else 9.5)
         for i, n in enumerate(bench.HEADLINE)},
    ]
    memberships = []
    for timings in runs:
        rec = json.loads(bench.render_record(
            total=sum(timings.values()), timings=timings, sf=0.1, reps=2))
        memberships.append(sorted(rec["queries"]))
    assert memberships[0] == memberships[1] == memberships[2]


def test_r13_line_membership_preserved():
    """The deterministic shown set must contain EVERY query the r13
    driver line showed (BENCH_r13.json's parsed queries) — otherwise
    the next PERF diff reports a drop. ELIDE_FIRST is seeded with
    exactly r13's elided names; this pins that HEADLINE growth or
    format drift never displaces an established entry."""
    timings = {name: 9.99 for name in bench.HEADLINE}
    rec = json.loads(bench.render_record(
        total=999999.0, timings=timings, sf=0.001, reps=2))
    r13_shown = set(bench.HEADLINE) - set(bench.ELIDE_FIRST)
    assert r13_shown <= set(rec["queries"])


def test_degrade_ladder_is_deterministic_for_new_names():
    # Names beyond ELIDE_FIRST (e.g. a grown registry) elide newest
    # first, never displacing established entries; membership is a
    # function of names alone.
    timings = {f"synthetic_query_with_a_long_name_{i:03d}": float(i % 7)
               for i in range(120)}
    line = bench.render_record(
        total=sum(timings.values()), timings=timings, sf=0.1, reps=2
    )
    assert len(line) < bench.LINE_BUDGET
    rec = json.loads(line)
    shown = rec["queries"]
    hidden = {n for n in timings if n not in shown}
    # reverse registration order: the newest names are hidden first
    assert hidden == set(list(reversed(sorted(timings)))[: len(hidden)])


def test_value_format_bounded_at_four_chars():
    assert bench._fmt_val(0.414) == 0.41
    assert bench._fmt_val(9.999) == 10.0  # round, still 4 chars
    assert bench._fmt_val(63.63) == 63.6
    assert bench._fmt_val(123.4) == 123
