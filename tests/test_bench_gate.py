"""Unit tests for bench.py's cross-run perf-regression gate (VERDICT
r12 #6): a query reading ≥2× its blessed time on TWO consecutive
calib-stable runs is a regression; unstable runs and one-off stalls
never convict.  Pure-python — no Spark session."""

from __future__ import annotations

import json

import bench


def _write(p, payload):
    p.write_text(json.dumps(payload))


def test_prior_stable_run_prefers_newest_stable(tmp_path):
    # r11: unstable driver round (wrapped under `parsed`) — skipped
    _write(
        tmp_path / "BENCH_r11.json",
        {"parsed": {"calib_unstable": True, "queries": {"a": 9.0}}},
    )
    # r10: stable driver round — eligible
    _write(
        tmp_path / "BENCH_r10.json",
        {"parsed": {"calib_unstable": False, "queries": {"a": 1.0}}},
    )
    # quiet r12 copy: bare artifact, stable, newest — wins
    _write(
        tmp_path / "BENCH_quiet_r12.json",
        {"calib_unstable": False, "queries": {"a": 2.5}},
    )
    prior = bench._prior_stable_run(str(tmp_path))
    assert prior["_round"] == 12 and prior["queries"] == {"a": 2.5}


def test_prior_stable_run_none_when_all_unstable(tmp_path):
    _write(
        tmp_path / "BENCH_r12.json",
        {"parsed": {"calib_unstable": True, "queries": {"a": 9.0}}},
    )
    assert bench._prior_stable_run(str(tmp_path)) is None


def test_gate_trips_only_on_two_stable_convictions(tmp_path):
    blessed = {"a": 1.0, "b": 1.0, "c": 1.0}
    # prior stable round: a and b slow, c fine
    _write(
        tmp_path / "BENCH_r12.json",
        {
            "parsed": {
                "calib_unstable": False,
                "queries": {"a": 2.4, "b": 3.0, "c": 1.1},
                "stall_retries": {"b": 0.9},  # b's 3.0 was a stall
            }
        },
    )
    # this run (stable): a and c slow
    out = bench._regression_gate_2r(
        {"calib_unstable": False},
        {"a": 2.2, "b": 1.0, "c": 2.1},
        blessed,
        root=str(tmp_path),
    )
    # a: slow both rounds -> trips.  b: prior retry exonerates.  c:
    # slow now only -> recorded as slow, not a regression.
    assert out["perf_regressions_2r"] == ["a"]
    assert set(out["perf_slow_vs_blessed"]) == {"a", "c"}
    assert out["perf_gate_prior_round"] == 12


def test_gate_silent_on_unstable_run(tmp_path):
    out = bench._regression_gate_2r(
        {"calib_unstable": True}, {"a": 9.0}, {"a": 1.0}, root=str(tmp_path)
    )
    assert out == {}


def test_gate_no_trip_without_prior_stable(tmp_path):
    out = bench._regression_gate_2r(
        {"calib_unstable": False}, {"a": 9.0}, {"a": 1.0}, root=str(tmp_path)
    )
    assert out["perf_slow_vs_blessed"] == {"a": 9.0}
    assert "perf_regressions_2r" not in out
    assert "perf_gate_prior_round" not in out


def test_gate_survives_malformed_artifacts(tmp_path):
    """Committed artifacts can be malformed (BENCH_r03/r05 carry a
    non-dict parsed; a queries dict can map names to null/strings) —
    the gate must degrade to skipping the bad values, never crash
    after measurement and lose the round's bench recording."""
    _write(tmp_path / "BENCH_r05.json", {"parsed": "not a dict"})
    _write(
        tmp_path / "BENCH_r12.json",
        {
            "parsed": {
                "calib_unstable": False,
                "queries": {"a": None, "b": "fast", "c": 3.0},
                "stall_retries": {"c": None},
            }
        },
    )
    out = bench._regression_gate_2r(
        {"calib_unstable": False},
        {"a": 9.0, "b": None, "c": 2.5},
        {"a": 1.0, "b": "x", "c": 1.0},
        root=str(tmp_path),
    )
    # a: blessed ok, now 9x, prior value None (skipped) -> no trip.
    # b: blessed malformed -> ignored entirely.
    # c: 2.5x now AND 3x prior (retry None skipped) -> trips.
    assert out["perf_regressions_2r"] == ["c"]
    assert set(out["perf_slow_vs_blessed"]) == {"a", "c"}
    assert out["perf_gate_prior_artifact"] == "BENCH_r12.json"


def test_stall_retry_exonerates_current_side(tmp_path):
    """The current side uses best-of (cold/steady/retry) — the caller
    passes min() already; verify a sub-2x best never lands in
    perf_slow_vs_blessed even with a prior conviction on file."""
    _write(
        tmp_path / "BENCH_r12.json",
        {"parsed": {"calib_unstable": False, "queries": {"a": 5.0}}},
    )
    out = bench._regression_gate_2r(
        {"calib_unstable": False}, {"a": 1.4}, {"a": 1.0}, root=str(tmp_path)
    )
    assert out["perf_slow_vs_blessed"] == {}
    assert "perf_regressions_2r" not in out
