"""Analysis-package tests: correlation, tables, diversity metrics."""
import numpy as np
import pytest

from multimodal_uncertainty_tpu.analysis import (
    acc_table,
    accuracy_breakdown,
    auc_table,
    ece_table,
    get_correlation,
    missing_view_accuracy,
    process_predictions_food101,
    process_predictions_hatefulmeme,
    subnetwork_kendalltau,
    trunk_pred_top,
)
from multimodal_uncertainty_tpu.analysis.round1 import head_diversity


def test_get_correlation_matches_scipy():
    from scipy.stats import pearsonr

    rng = np.random.default_rng(0)
    s, r = 50, 20
    labels = rng.integers(0, 2, size=s)
    ori = rng.random(s)
    image = ori + rng.normal(0, 0.1, s)
    text = ori + rng.normal(0, 0.2, s)
    image_corr = ori[:, None] + rng.normal(0, 0.1, (s, r))
    text_corr = ori[:, None] + rng.normal(0, 0.2, (s, r))
    out = get_correlation(labels, ori, image, text, image_corr, text_corr)
    ref_img = pearsonr(image - ori, (image_corr - ori[:, None]).mean(1))[0]
    ref_txt = pearsonr(text - ori, (text_corr - ori[:, None]).mean(1))[0]
    assert abs(out["image"] - ref_img) < 1e-12
    assert abs(out["text"] - ref_txt) < 1e-12


def _fake_sweep(s=40, v=43, e=2, c=4, seed=1):
    rng = np.random.default_rng(seed)
    preds = rng.normal(size=(s, v, e, c))
    labels = rng.integers(0, c, size=s)
    # make 'full' informative so acc(full) > chance
    preds[np.arange(s), 0, :, labels] += 3.0
    return preds, labels


def test_acc_table_layout_and_values():
    preds, labels = _fake_sweep()
    df = acc_table(preds, labels)
    assert set(df["variants"]) == {"full", "image", "text", "image_control", "text_control"}
    assert len(df) == 3 + 40
    full_acc = df[df.variants == "full"].ACC.iloc[0]
    assert full_acc > 90  # boosted full logits
    # mmbt layout (no head axis)
    preds2 = preds[:, :, 0, :]
    df2 = acc_table(preds2, labels, mmbt=True)
    assert df2[df2.variants == "full"].ACC.iloc[0] > 90


def test_auc_and_ece_tables():
    s = 60
    rng = np.random.default_rng(2)
    preds = rng.normal(size=(s, 43, 2, 2))
    labels = rng.integers(0, 2, size=s)
    preds[np.arange(s), 0, :, labels] += 4.0
    out = process_predictions_hatefulmeme(preds, labels)
    df = auc_table(*out)
    assert df[df.variants == "full"].AUC.iloc[0] > 0.9
    assert len(df) == 43
    edf = ece_table(preds, labels)
    assert (edf.ECE >= 0).all() and (edf.ECE <= 1).all()
    # confident+correct 'full' should be better calibrated than random cols
    assert edf[edf.variants == "full"].ECE.iloc[0] < 0.5


def test_process_predictions_food101_true_class_probs():
    preds, labels = _fake_sweep(c=4)
    out = process_predictions_food101(preds, labels)
    _, ori, image, text, icorr, tcorr = out
    assert ori.shape == (40,) and icorr.shape == (40, 20) and tcorr.shape == (40, 20)
    assert (ori > 0.5).mean() > 0.9  # true-class prob of boosted full variant


def test_head_diversity_and_breakdown():
    rng = np.random.default_rng(3)
    s, m, c = 30, 4, 10
    labels = rng.integers(0, c, size=s)
    preds = rng.normal(size=(s, m, c))
    preds[np.arange(s), :, labels] += 5.0
    bd = accuracy_breakdown(preds, labels)
    assert bd["accuracy_overall"] > 0.9
    assert len(bd["accuracy_viewwise"]) == m
    tau_mean, taus = head_diversity(preds, labels, top=5)
    assert len(taus) == 6  # C(4,2)
    assert -1.0 <= tau_mean <= 1.0
    # identical heads -> tau == 1
    same = np.repeat(preds[:, :1, :], m, axis=1)
    tau_same, _ = head_diversity(same, labels, top=5)
    assert tau_same > 0.99


def test_missing_view_accuracy():
    rng = np.random.default_rng(4)
    m_, s, m, c = 4, 20, 4, 10
    labels = rng.integers(0, c, size=s)
    rp = rng.normal(size=(m_, s, m, c))
    rp[0, np.arange(s), :, labels] += 5.0  # only variant 0 is good
    accs = missing_view_accuracy(rp, labels)
    assert accs[0] > 0.9 and all(a < 0.6 for a in accs[1:])


def test_epoch_wise_analysis_roundtrip(tmp_path):
    """End-to-end: sweep artifacts on disk -> per-epoch tables + correlations."""
    import os

    from multimodal_uncertainty_tpu.analysis.robustness_tables import (
        epoch_wise_analysis,
    )

    rng = np.random.default_rng(0)
    exp = "expA"
    dataset = "hateful-meme"
    d = tmp_path / dataset / exp
    os.makedirs(d)
    s, r = 30, 4
    for epoch in (1, 2):
        preds = rng.normal(size=(s, 3 + 2 * r, 2, 2))
        labels = rng.integers(0, 2, size=s)
        preds[np.arange(s), 0, :, labels] += 3.0 * epoch
        np.save(d / f"robustness_model_epoch_{epoch}_predictions_val.npy", preds)
        np.save(d / f"robustness_model_epoch_{epoch}_labels_val.npy", labels)

    results, corr = epoch_wise_analysis(
        "val", exp, range(1, 4), dataset, results_dir=str(tmp_path), n_repeats=r
    )
    assert set(results["epoch"]) == {1, 2}  # epoch 3 missing -> skipped
    full = results[results.variants == "full"].set_index("epoch").AUC
    assert full[2] >= full[1] > 0.8  # stronger boost -> higher AUC
    assert set(corr.columns) == {"image", "text"}
