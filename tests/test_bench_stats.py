"""bench._end2end_stats: the adaptive-runs window must CONVERGE.

r5 review finding: the loop used to test the spread of ALL accumulated
runs — monotonically non-decreasing, so one early tunnel stall forced
max_runs and pinned wall_usable false even when every later run agreed
to 1%. The criterion is now the tightest `runs`-sized subset.
"""
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import bench  # noqa: E402

pytestmark = pytest.mark.quick  # <=2-min smoke tier (make check)


def _runner(rates):
    it = iter(rates)

    def fn():
        return {"end2end_sps": next(it), "device_trace_step_sps": 1000.0}

    return fn


def test_early_outlier_converges_once_clean_window_exists():
    # run 1 is a 2x stall; runs 2-4 agree within 1.4% — ONE extra run
    # past the initial 3 must satisfy the window criterion
    fn = _runner([100.0, 50.0, 50.5, 49.8, 50.2, 50.1, 49.9])
    out = bench._end2end_stats(fn, runs=3, max_runs=7, target_spread=1.3)
    assert len(out["end2end_runs"]) == 4  # not pinned to max_runs
    assert out["wall_usable"] is True
    assert out["noisy"] is False
    assert out["spread_ratio"] < 1.3
    # wall stats come from the converged window, not the outlier
    assert out["end2end_sps_median"] == pytest.approx(50.0, abs=0.5)
    assert out["end2end_sps_spread"][1] < 51.0
    # headline rides the device trace regardless
    assert out["headline_source"] == "device_trace"
    assert out["headline_sps"] == pytest.approx(1000.0)


def test_truly_noisy_walls_stay_flagged():
    # every run disagrees >1.3x with every other: no window converges
    fn = _runner([100.0, 150.0, 40.0, 220.0, 60.0, 300.0, 20.0])
    out = bench._end2end_stats(fn, runs=3, max_runs=7, target_spread=1.3)
    assert len(out["end2end_runs"]) == 7  # exhausted max_runs
    assert out["wall_usable"] is False
    assert out["noisy"] is True


def test_clean_from_the_start_takes_exactly_runs():
    fn = _runner([50.0, 50.1, 49.9])
    out = bench._end2end_stats(fn, runs=3, max_runs=7, target_spread=1.3)
    assert len(out["end2end_runs"]) == 3
    assert out["wall_usable"] is True
