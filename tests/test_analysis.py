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

pytestmark = pytest.mark.quick  # <=2-min smoke tier (make check)


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


# ---------------------------------------------------------------------------
# Figure parity tail (reference notebooks/utils.py:37-144,170-281 +
# hateful_meme_learning_curve.py:32-77): every figure renders headless (Agg)
# from synthetic artifacts.
# ---------------------------------------------------------------------------


@pytest.fixture()
def dp_outcomes():
    rng = np.random.default_rng(3)
    s, r = 30, 5
    labels = rng.integers(0, 2, size=s)
    ori = rng.random(s)
    image = ori + rng.normal(0, 0.1, s)
    text = ori + rng.normal(0, 0.2, s)
    image_corr = ori[:, None] + rng.normal(0, 0.1, (s, r))
    text_corr = ori[:, None] + rng.normal(0, 0.2, (s, r))
    return labels, ori, image, text, image_corr, text_corr


def test_histogram_by_group_renders(tmp_path, dp_outcomes):
    import matplotlib

    matplotlib.use("Agg")
    from multimodal_uncertainty_tpu.analysis.utils import histogram_by_group

    out = tmp_path / "hist.png"
    histogram_by_group(*dp_outcomes, save_path=str(out))
    assert out.exists() and out.stat().st_size > 0


def test_violin_and_scatter_axes_render(tmp_path, dp_outcomes):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from multimodal_uncertainty_tpu.analysis.utils import (
        scatter_plot_instance_level,
        violin_plot_by_group,
    )

    fig, axs = plt.subplots(1, 2)
    violin_plot_by_group(axs[0], *dp_outcomes)
    scatter_plot_instance_level(axs[1], *dp_outcomes)
    fig.savefig(tmp_path / "pair.png")
    plt.close(fig)
    assert (tmp_path / "pair.png").stat().st_size > 0


def test_plot_correlation_and_performance_renders(tmp_path):
    import matplotlib

    matplotlib.use("Agg")
    import pandas as pd

    from multimodal_uncertainty_tpu.analysis.utils import (
        plot_correlation_and_performance,
    )

    epochs = np.arange(1, 6)
    corr = pd.DataFrame(
        {"image": np.linspace(0.2, 0.8, 5), "text": np.linspace(-0.1, -0.6, 5)},
        index=epochs,
    )
    out = tmp_path / "corr.png"
    plot_correlation_and_performance(
        corr, np.linspace(60, 80, 5), np.linspace(50, 70, 5),
        np.linspace(40, 60, 5), "ACC", save_path=str(out),
    )
    assert out.exists() and out.stat().st_size > 0


def _fake_histories(root, dataset, experiments, epochs=4, auc=True):
    import pandas as pd

    rng = np.random.default_rng(0)
    for exp in experiments:
        d = root / dataset / exp
        d.mkdir(parents=True)
        cols = {
            "epoch": np.arange(1, epochs + 1),
            "loss": rng.random(epochs) + 1,
            "val_loss": rng.random(epochs) + 1,
            "test_loss": rng.random(epochs) + 1,
            "acc": rng.random(epochs) * 100,
            "val_acc": rng.random(epochs) * 100,
            "test_acc": rng.random(epochs) * 100,
        }
        if auc:
            cols["val_auc"] = rng.random(epochs)
            cols["test_auc"] = rng.random(epochs)
        pd.DataFrame(cols).to_csv(d / "history.csv", index=False)


def test_draw_learning_curves_grid_and_max_csv(tmp_path):
    import matplotlib

    matplotlib.use("Agg")
    from multimodal_uncertainty_tpu.analysis.utils import (
        draw_learning_curves,
        max_metric_csv,
    )

    exps = ["Vanilla", "MultiHead"]
    _fake_histories(tmp_path, "hatefulmeme", exps)
    frame = draw_learning_curves(
        exps, dataset="hatefulmeme", results_dir=str(tmp_path),
        save_dir=str(tmp_path / "figs"),
    )
    assert frame is not None and set(frame["model_type"]) == set(exps)
    pngs = list((tmp_path / "figs").glob("*.png"))
    assert pngs and pngs[0].stat().st_size > 0

    table = max_metric_csv(frame, str(tmp_path / "perf.csv"))
    assert (tmp_path / "perf.csv").exists()
    # max is per model_type over epochs
    v = frame[frame.model_type == "Vanilla"]["val_acc"].max()
    assert abs(table.loc["Vanilla", "val_acc"] - v) < 1e-9
