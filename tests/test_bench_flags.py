"""bench.py regression-flag logic (pure; no Spark session needed)."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from bench import REGRESSION_FLAG, SPREAD_FLAG, flag_regressions


def test_hard_flag_trips_above_1_3x():
    regs, _ = flag_regressions({"q": 1.31}, {}, {}, [])
    assert regs == ["q"]


def test_seeded_slowdown_with_disjoint_spread_trips():
    """VERDICT r7 #4's exact scenario: a 1.30x mover (one tick under
    the hard flag) whose spreads do not overlap must flag."""
    deltas = {"dmr_regions": 1.299}
    cur = {"dmr_regions": [1.80, 1.95]}
    prev = {"dmr_regions": [1.38, 1.52]}
    regs, overlap = flag_regressions(deltas, cur, prev, [])
    assert regs == ["dmr_regions"]
    assert overlap["dmr_regions"]["disjoint"] is True


def test_overlapping_spread_does_not_flag():
    """Same delta, but the spreads overlap -> harness noise, no flag
    (the overlap test is still RECORDED for the details file)."""
    deltas = {"q": 1.29}
    cur = {"q": [1.40, 1.95]}
    prev = {"q": [1.38, 1.52]}
    regs, overlap = flag_regressions(deltas, cur, prev, [])
    assert regs == []
    assert overlap["q"]["disjoint"] is False


def test_small_moves_ignored_and_failures_always_flag():
    deltas = {"a": 1.24, "b": 0.8}
    regs, overlap = flag_regressions(deltas, {}, {}, ["crashed_q"])
    assert regs == ["crashed_q"]
    assert overlap == {}
    assert SPREAD_FLAG < REGRESSION_FLAG


def test_missing_prev_spread_stays_conservative():
    """No previous spread (first round after a record gap): only the
    hard flag applies — the soft flag needs both spreads."""
    regs, overlap = flag_regressions({"q": 1.29}, {"q": [2.0, 2.1]}, {}, [])
    assert regs == []
    assert overlap == {}


def test_unreadable_prev_details_is_visible_not_silent(tmp_path, capsys):
    """ADVICE r8: a corrupt previous details file must not silently
    disable the soft flag — _previous_spreads warns and returns the
    sentinel, and flag_regressions records degraded mode."""
    import os

    import bench
    from bench import _previous_spreads

    corrupt = tmp_path / "BENCH_DETAILS_r98.json"
    corrupt.write_text("{not json")
    orig = os.path.dirname(os.path.abspath(bench.__file__))
    try:
        bench.__file__ = str(tmp_path / "bench.py")
        spreads = _previous_spreads("BENCH_DETAILS_r98.json")
    finally:
        bench.__file__ = os.path.join(orig, "bench.py")
    assert "__prev_unreadable__" in spreads
    assert "spread-overlap test disabled" in capsys.readouterr().err
    regs, overlap = flag_regressions({"q": 1.29}, {"q": [2.0, 2.1]}, spreads, [])
    assert regs == []
    assert overlap["__status__"] == "prev_unreadable"
