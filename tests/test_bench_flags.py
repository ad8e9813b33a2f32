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
    """ADVICE r8/r9: a corrupt previous details file must not silently
    disable the soft flag — _previous_spreads warns on stderr and
    returns an explicit ok=False status (no in-band NaN sentinel)."""
    import os

    import bench
    from bench import _previous_spreads

    corrupt = tmp_path / "BENCH_DETAILS_r98.json"
    corrupt.write_text("{not json")
    orig = os.path.dirname(os.path.abspath(bench.__file__))
    try:
        bench.__file__ = str(tmp_path / "bench.py")
        spreads, ok = _previous_spreads("BENCH_DETAILS_r98.json")
    finally:
        bench.__file__ = os.path.join(orig, "bench.py")
    assert spreads == {} and ok is False
    assert "spread-overlap test disabled" in capsys.readouterr().err


def test_previous_spreads_absent_is_ok():
    """No details record at all (driver-record-only continuity) is the
    normal first-round state, not degraded mode."""
    from bench import _previous_spreads

    spreads, ok = _previous_spreads(None)
    assert spreads == {} and ok is True
    spreads, ok = _previous_spreads("BENCH_r07.json")
    assert spreads == {} and ok is True


# ---------------------------------------------------------------------------
# Self-adjudication (VERDICT r9 #1): the pure confirm/clear decision
# ---------------------------------------------------------------------------

from bench import adjudicate_flags


def test_adjudication_clears_session_noise():
    """The r9 scenario: in-session flag at 1.33x, fresh session back
    inside the previous envelope -> cleared, verdict recorded."""
    kept, rec = adjudicate_flags(
        ["methyl_pipeline_chain"],
        [],
        {"methyl_pipeline_chain": {"median": 3.35, "spread": [3.3, 3.5]}},
        {"methyl_pipeline_chain": 3.375},
        {"methyl_pipeline_chain": [3.3, 3.6]},
    )
    assert kept == []
    assert rec["methyl_pipeline_chain"]["verdict"] == "noise"
    assert rec["methyl_pipeline_chain"]["fresh_delta"] < 1.1


def test_adjudication_confirms_real_regression():
    """Fresh spread wholly above the previous round's AND above the
    soft threshold -> the flag stands, with both numbers recorded."""
    kept, rec = adjudicate_flags(
        ["q"],
        [],
        {"q": {"median": 2.0, "spread": [1.9, 2.1]}},
        {"q": 1.0},
        {"q": [0.95, 1.1]},
    )
    assert kept == ["q"]
    assert rec["q"]["verdict"] == "confirmed"
    assert rec["q"]["fresh_delta"] == 2.0


def test_adjudication_no_prev_spread_uses_hard_flag():
    kept, rec = adjudicate_flags(
        ["a", "b"],
        [],
        {"a": {"median": 1.4, "spread": [1.3, 1.5]},
         "b": {"median": 1.2, "spread": [1.1, 1.3]}},
        {"a": 1.0, "b": 1.0},
        {},
    )
    assert kept == ["a"]  # 1.4x > hard flag; 1.2x under it
    assert rec["a"]["verdict"] == "confirmed"
    assert rec["b"]["verdict"] == "noise"


def test_adjudication_degraded_evidence_never_clears():
    """A rerun that failed to launch, a query the rerun crashed on, and
    a query with no previous median all KEEP their flags."""
    kept, rec = adjudicate_flags(["q"], [], None, {"q": 1.0}, {})
    assert kept == ["q"] and rec["q"]["verdict"] == "rerun_unavailable"

    kept, rec = adjudicate_flags(
        ["q"], [], {"q": "FAILED: boom"}, {"q": 1.0}, {}
    )
    assert kept == ["q"] and rec["q"]["verdict"] == "rerun_failed"

    kept, rec = adjudicate_flags(
        ["q"], [], {"q": {"median": 1.0, "spread": [1.0, 1.0]}}, {}, {}
    )
    assert kept == ["q"] and rec["q"]["verdict"] == "no_prev_median"


def test_adjudication_failures_never_adjudicated():
    """A crashed query is not noise: it stays flagged and is not sent
    through the fresh-evidence test even if the rerun timed it."""
    kept, rec = adjudicate_flags(
        ["crashed_q", "slow_q"],
        ["crashed_q"],
        {"slow_q": {"median": 1.0, "spread": [1.0, 1.0]},
         "crashed_q": {"median": 1.0, "spread": [1.0, 1.0]}},
        {"slow_q": 1.0, "crashed_q": 1.0},
        {},
    )
    assert kept == ["crashed_q"]
    assert "crashed_q" not in rec
    assert rec["slow_q"]["verdict"] == "noise"


def test_adjudication_machine_noise_cleared_by_calibration():
    """The r10 scenario: every query uniformly ~1.35x over the record
    AND the fixed calibration job is 1.4x slower -> machine-day drift,
    cleared with verdict machine_noise."""
    kept, rec = adjudicate_flags(
        ["q"],
        [],
        {"q": {"median": 1.35, "spread": [1.3, 1.4]}},
        {"q": 1.0},
        {"q": [0.95, 1.05]},
        cal_ratio=1.4,
    )
    assert kept == []
    assert rec["q"]["verdict"] == "machine_noise"
    assert rec["q"]["cal_scale"] == 1.4


def test_adjudication_real_regression_rides_over_calibration():
    """A true regression on a slow machine day still flags: 2.5x fresh
    vs a 1.3x calibration ratio stays disjoint after scaling."""
    kept, rec = adjudicate_flags(
        ["q"],
        [],
        {"q": {"median": 2.5, "spread": [2.4, 2.6]}},
        {"q": 1.0},
        {"q": [0.95, 1.05]},
        cal_ratio=1.3,
    )
    assert kept == ["q"]
    assert rec["q"]["verdict"] == "confirmed"


def test_adjudication_faster_machine_never_excuses():
    """cal_ratio < 1 (machine FASTER than record day) must not relax
    the test — scale clamps to 1."""
    kept, rec = adjudicate_flags(
        ["q"],
        [],
        {"q": {"median": 1.4, "spread": [1.35, 1.45]}},
        {"q": 1.0},
        {"q": [0.95, 1.05]},
        cal_ratio=0.5,
    )
    assert kept == ["q"]
    assert rec["q"]["cal_scale"] == 1.0


def test_adjudication_cal_ratio_capped():
    """An implausible calibration ratio cannot whitewash a huge
    regression: scale caps at CAL_RATIO_CAP."""
    from bench import CAL_RATIO_CAP

    kept, rec = adjudicate_flags(
        ["q"],
        [],
        {"q": {"median": 10.0, "spread": [9.5, 10.5]}},
        {"q": 1.0},
        {"q": [0.95, 1.05]},
        cal_ratio=50.0,
    )
    assert kept == ["q"]
    assert rec["q"]["cal_scale"] == CAL_RATIO_CAP


def test_adjudication_hard_flag_survives_overlapping_spread():
    """ADVICE r10: a fresh median >1.3x the previous must confirm even
    when one fast fresh run dips the fresh spread into the previous
    spread (soft disjoint test alone would have cleared it)."""
    kept, rec = adjudicate_flags(
        ["q"],
        [],
        {"q": {"median": 1.4, "spread": [1.2, 1.6]}},
        {"q": 1.0},
        {"q": [0.95, 1.25]},  # fresh min 1.2 <= prev max 1.25: overlap
    )
    assert kept == ["q"]
    assert rec["q"]["verdict"] == "confirmed"


# ---- load guard (VERDICT r13 #6) -----------------------------------
from bench import wait_for_quiet


def test_load_guard_fires_under_synthetic_load():
    # box reads loaded for 3 polls, then quiet: the guard must wait
    # exactly through the loaded reads and report the quiet verdict
    readings = iter([12.0, 11.0, 9.5, 2.0])
    clock = {"t": 0.0}

    def fake_sleep(s):
        clock["t"] += s

    regs = wait_for_quiet(
        threshold=8.0,
        max_wait_s=600.0,
        poll_s=20.0,
        _read=lambda: next(readings),
        _sleep=fake_sleep,
        _now=lambda: clock["t"],
    )
    assert regs["verdict"] == "quiet"
    assert regs["initial_load"] == 12.0
    assert regs["final_load"] == 2.0
    assert regs["polls"] == 4
    assert regs["waited_s"] == 60.0


def test_load_guard_times_out_and_records_loaded_verdict():
    clock = {"t": 0.0}

    def fake_sleep(s):
        clock["t"] += s

    regs = wait_for_quiet(
        threshold=8.0,
        max_wait_s=100.0,
        poll_s=40.0,
        _read=lambda: 30.0,
        _sleep=fake_sleep,
        _now=lambda: clock["t"],
    )
    assert regs["verdict"] == "proceeded_loaded"
    assert regs["final_load"] == 30.0
    assert regs["waited_s"] >= 100.0


def test_load_guard_unreadable_proc_is_not_a_blocker():
    regs = wait_for_quiet(
        threshold=8.0, max_wait_s=600.0, _read=lambda: None, _sleep=None, _now=lambda: 0.0
    )
    assert regs["verdict"] == "unreadable"
    assert regs["polls"] == 1


def test_adjudication_degraded_rerun_box_cannot_confirm():
    """A rerun whose own calibration shows a >2.5x degraded box (the
    r14 interference window: cpu 3.2x, scan 42x) keeps the flag but
    labels it rerun_degraded, never confirmed — broken-box timings are
    not code-regression evidence. Clears stay clears."""
    from bench import adjudicate_flags

    fresh = {
        "slow_q": {"median": 79.4, "spread": [7.7, 154.2]},
        "fine_q": {"median": 1.1, "spread": [1.0, 1.2]},
    }
    prev = {"slow_q": 4.5, "fine_q": 1.0}
    kept, rec = adjudicate_flags(
        ["slow_q", "fine_q"], [], fresh, prev, {}, cal_ratio=41.6
    )
    assert kept == ["slow_q"]
    assert rec["slow_q"]["verdict"] == "rerun_degraded"
    assert rec["slow_q"]["rerun_cal_ratio"] == 41.6
    # scaled by the cap (2.0), 1.1/1.0 is inside the envelope -> clear
    assert rec["fine_q"]["verdict"] in ("noise", "machine_noise")

    # same fresh numbers on a HEALTHY box -> a real confirmation
    kept2, rec2 = adjudicate_flags(
        ["slow_q"], [], fresh, prev, {}, cal_ratio=1.1
    )
    assert rec2["slow_q"]["verdict"] == "confirmed"
