"""The bench stdout line must stay under the capture window.

Round 9 lost its bench record: the driver keeps only the last ~2,000
chars of stdout and the JSON line had grown to 2,250 bytes, so
BENCH_r09.json recorded ``parsed: null``.  These tests pin the
emitted line against the FULL headline registry with pessimistic
timing widths so the regression can never be silent again.
"""

from __future__ import annotations

import json

import bench


def test_line_under_budget_with_pessimistic_timings():
    # 99.99 s per query is far beyond any observed sf0.1 timing
    # (worst headline entry ever recorded: 6.5 s) — if the line fits
    # with 5-char values for every registered headline query, any
    # real run fits too.
    timings = {name: 99.99 for name in bench.HEADLINE}
    line = bench.render_record(
        total=sum(timings.values()), timings=timings, sf=0.1, reps=2
    )
    assert len(line) < bench.LINE_BUDGET
    rec = json.loads(line)
    assert rec["metric"] == "headline_queries_total"
    assert rec["unit"] == "sec"
    # pessimistic widths may shed the extras pointer (ladder rung 2);
    # when present it must point at the sidecar
    assert rec.get("extras", "scripts/bench_extras.json") == (
        "scripts/bench_extras.json")
    # Whatever was elided for space is accounted for: shown + omitted
    # covers the whole registry, and anything shown is a real entry.
    shown = rec["queries"]
    assert len(shown) + rec.get("omitted", 0) == len(bench.HEADLINE)
    assert set(shown) <= set(bench.HEADLINE)


def test_line_parses_with_typical_timings():
    timings = {name: 0.42 for name in bench.HEADLINE}
    line = bench.render_record(
        total=sum(timings.values()), timings=timings, sf=0.1, reps=2
    )
    assert len(line) < bench.LINE_BUDGET
    rec = json.loads(line)
    # The 69-entry registry saturates the window with NAMES alone:
    # after shedding the reps/extras metadata the ladder may still
    # have to elide a handful of entries even at typical widths. Pin
    # that the elision stays small and fully accounted for — the
    # sidecar always carries every query. (r11: ann_ivf_pq +
    # dedup_edge_maintenance_winnow joined HEADLINE, 8 -> 11 at the
    # 0.42 s typical width; r12: multimodal_avi_frames_stats +
    # dedup_video_frames_cross + tokenizer_bpe_merges +
    # dedup_edge_maintenance_minhash, 11 -> 15; r12 cont'd:
        # dedup_edge_maintenance_phash + ann_index_maintenance_ivf +
        # dsir_select_topk, 15 -> 18.)
    shown = rec["queries"]
    assert rec.get("omitted", 0) <= 20
    assert len(shown) + rec.get("omitted", 0) == len(bench.HEADLINE)
    assert set(shown) <= set(bench.HEADLINE)


def test_degrade_ladder_drops_fastest_first():
    # Force eliding by inflating the registry: the dropped entries
    # must be the fastest ones, keeping the slow (interesting)
    # queries visible in the compact line.
    timings = {f"synthetic_query_with_a_long_name_{i:03d}": float(i)
               for i in range(120)}
    line = bench.render_record(
        total=sum(timings.values()), timings=timings, sf=0.1, reps=2
    )
    assert len(line) < bench.LINE_BUDGET
    rec = json.loads(line)
    assert rec["omitted"] > 0
    shown_vals = sorted(rec["queries"].values())
    # every shown value >= every omitted value
    assert shown_vals[0] >= rec["omitted"] - 1
