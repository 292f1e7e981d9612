"""Temperature scaling + reliability diagrams (analysis/calibration.py)."""
import pytest
import numpy as np

from multimodal_uncertainty_tpu.analysis.calibration import (
    apply_temperature,
    calibration_report,
    fit_temperature,
    nll,
    reliability_curve,
)
from multimodal_uncertainty_tpu.ops.metrics import (
    expected_calibration_error,
    softmax_np,
)

pytestmark = pytest.mark.quick  # <=2-min smoke tier (make check)


def _miscalibrated(n=4000, c=5, t_true=3.0, seed=0):
    """Labels drawn FROM softmax(logits/t_true): logits are overconfident
    by exactly t_true, so the NLL-optimal temperature is t_true."""
    rng = np.random.default_rng(seed)
    base = rng.normal(size=(n, c)) * 2.0
    probs = softmax_np(base)
    labels = np.array([rng.choice(c, p=p) for p in probs])
    return base * t_true, labels


def test_fit_recovers_true_temperature():
    logits, labels = _miscalibrated(t_true=3.0)
    t = fit_temperature(logits, labels)
    assert 2.5 < t < 3.5, t
    # calibration improves on the metrics that matter
    before = softmax_np(logits)
    after = apply_temperature(logits, t)
    assert expected_calibration_error(after, labels) < (
        expected_calibration_error(before, labels)
    )
    assert nll(logits / t, labels) < nll(logits, labels)
    # argmax (accuracy) unchanged
    np.testing.assert_array_equal(before.argmax(-1), after.argmax(-1))


def test_already_calibrated_keeps_t_near_one():
    logits, labels = _miscalibrated(t_true=1.0, seed=1)
    t = fit_temperature(logits, labels)
    assert 0.8 < t < 1.25, t


def test_ensemble_logits_path():
    rng = np.random.default_rng(2)
    logits, labels = _miscalibrated(t_true=4.0, seed=2)
    heads = logits[:, None, :] + rng.normal(size=(logits.shape[0], 3, 1)) * 0.1
    t = fit_temperature(heads, labels)
    assert t > 2.0, t
    probs = apply_temperature(heads, t)
    assert probs.shape == (logits.shape[0], logits.shape[1])
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-9)
    before = softmax_np(heads / 1.0).mean(axis=1)
    assert expected_calibration_error(probs, labels) < (
        expected_calibration_error(before, labels)
    )


def test_reliability_curve_contract():
    logits, labels = _miscalibrated(seed=3)
    probs = softmax_np(logits)
    curve = reliability_curve(probs, labels, n_bins=10)
    assert curve["count"].sum() == labels.size
    assert curve["bin_edges"].shape == (11,)
    valid = curve["count"] > 0
    # confidences lie inside their bins
    lo = curve["bin_edges"][:-1][valid]
    hi = curve["bin_edges"][1:][valid]
    conf = curve["confidence"][valid]
    assert ((conf >= lo - 1e-12) & (conf <= hi + 1e-12)).all()
    # overconfident model: accuracy below confidence in the populated bins
    gap = conf - curve["accuracy"][valid]
    assert gap[curve["count"][valid] > 50].mean() > 0.05


@pytest.mark.slow  # excluded from the quick tier
def test_calibrate_cli_on_prediction_artifacts(tmp_path):
    """tools/calibrate.py consumes the eval_prediction_saving artifact
    contract ((S, E, C) logits + labels) and emits the report JSON."""
    import json
    import os
    import subprocess
    import sys

    rng = np.random.default_rng(6)
    val_logits, val_labels = _miscalibrated(t_true=3.0, seed=6)
    heads = val_logits[:, None, :] + rng.normal(
        size=(val_logits.shape[0], 2, 1)
    ) * 0.05
    vp = tmp_path / "model_best_val_predictions.npy"
    vl = tmp_path / "model_best_val_labels.npy"
    np.save(vp, heads)
    np.save(vl, val_labels)
    out_csv = tmp_path / "reliability.csv"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "calibrate.py"),
         "--val_predictions", str(vp), "--val_labels", str(vl),
         "--reliability_csv", str(out_csv)],
        capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr
    rep = json.loads(proc.stdout)
    assert rep["eval_split"] == "val"
    assert rep["ece_after"] < rep["ece_before"]
    assert "--temperature" in rep["serve_with"]
    rows = np.loadtxt(out_csv, delimiter=",", skiprows=1)
    assert rows.shape == (15, 5)
    assert rows[:, 4].sum() == val_labels.size


def test_calibration_report_protocol():
    val_logits, val_labels = _miscalibrated(t_true=3.0, seed=4)
    test_logits, test_labels = _miscalibrated(t_true=3.0, seed=5)
    rep = calibration_report(val_logits, val_labels, test_logits, test_labels)
    assert 2.4 < rep["temperature"] < 3.6
    # T fit on val transfers: test ECE and NLL both improve
    assert rep["ece_after"] < rep["ece_before"]
    assert rep["nll_after"] < rep["nll_before"]
    assert rep["reliability_after"]["count"].sum() == test_labels.size
    # scaling genuinely helps here: the guard stays quiet and the fitted T
    # is what gets recommended for serving
    assert rep["guard"] is None
    assert rep["recommended_temperature"] == rep["temperature"]


def test_guard_rejects_ece_degrading_temperature():
    """Regression for the fmnist smoke drive (unitest/out/calibrate_fmnist
    .txt, round 3): the NLL fit found T=0.196 on an already-calibrated
    model and pushed ECE 0.0074 -> 0.194 — 26x worse — yet the CLI still
    recommended serving with it. The decision layer must reject exactly
    those numbers."""
    from multimodal_uncertainty_tpu.analysis.calibration import (
        recommend_temperature,
    )

    rec_t, guard = recommend_temperature(
        0.1962, ece_before=0.0074, ece_after=0.1942,
        nll_before=2.2611, nll_after=2.1855,
    )
    assert rec_t == 1.0
    assert guard is not None and "ece_degraded" in guard

    # negligible-NLL-gain branch: a T that barely moves NLL is also not
    # worth deploying even if ECE doesn't technically degrade
    rec_t, guard = recommend_temperature(
        0.98, ece_before=0.0177, ece_after=0.0170,
        nll_before=1.8643, nll_after=1.8642,
    )
    assert rec_t == 1.0
    assert guard is not None and "nll_gain_negligible" in guard

    # a genuinely useful fit passes through untouched
    rec_t, guard = recommend_temperature(
        3.0, ece_before=0.20, ece_after=0.02,
        nll_before=2.0, nll_after=1.5,
    )
    assert rec_t == 3.0 and guard is None


def test_calibration_report_guard_end_to_end():
    """An already-calibrated ensemble whose heads share a consensus noise
    direction: the NLL fit lands near (but not at) T=1 and max-prob ECE
    gets WORSE — calibration_report must recommend T=1.0, and the
    reliability curve must describe the RECOMMENDED serving distribution."""
    from multimodal_uncertainty_tpu.analysis.calibration import (
        recommend_temperature,
    )

    rng = np.random.default_rng(0)
    n, c, e = 4000, 10, 3
    labels = rng.integers(0, c, n)
    consensus = rng.normal(0, 1.0, (n, 1, c))
    heads = consensus + rng.normal(0, 0.2, (n, e, c))
    heads[np.arange(n), :, labels] += 1.0
    rep = calibration_report(heads, labels)
    assert rep["guard"] is not None
    assert rep["recommended_temperature"] == 1.0
    # the decision reproduces from the reported numbers alone
    rec_t, _ = recommend_temperature(
        rep["temperature"], rep["ece_before"], rep["ece_after"],
        rep["nll_before"], rep["nll_after"],
    )
    assert rec_t == 1.0
    # reliability_after reflects T=1.0 serving, not the rejected fit
    before = softmax_np(heads).mean(axis=1)
    curve = reliability_curve(before, labels, n_bins=15)
    np.testing.assert_allclose(
        rep["reliability_after"]["confidence"], curve["confidence"]
    )
