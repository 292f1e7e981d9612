"""Analysis utilities (reference ``notebooks/utils.py``)."""
from __future__ import annotations

import os
from typing import Tuple

import numpy as np

from multimodal_uncertainty_tpu.ops.metrics import softmax_np as softmax  # noqa: F401


def _pearsonr(x: np.ndarray, y: np.ndarray) -> float:
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    xc = x - x.mean()
    yc = y - y.mean()
    denom = np.sqrt((xc * xc).sum() * (yc * yc).sum())
    return float((xc * yc).sum() / denom) if denom else float("nan")


def get_correlation(labels, ori, image, text, image_correspondence,
                    text_correspondence) -> dict:
    """Pearson r between the experimental Δp (modality-ablated minus full)
    and the mean control Δp (reference ``notebooks/utils.py:26-34``)."""

    def correlation(exp, control):
        x = exp - ori
        y = (control - np.expand_dims(ori, 1)).mean(1)
        return _pearsonr(x, y)

    return {
        "image": correlation(image, image_correspondence),
        "text": correlation(text, text_correspondence),
    }


def load_robustness_experiment_results(
    checkpoint_name: str, phase: str, exp: str, dataset: str,
    results_dir: str = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Reference ``notebooks/utils.py:157-164``."""
    path = results_dir or os.environ["RESULTS_DIR"]
    predictions = np.load(
        os.path.join(
            path, dataset, exp,
            f"robustness_{checkpoint_name}_predictions_{phase}.npy",
        )
    )
    labels = np.load(
        os.path.join(
            path, dataset, exp, f"robustness_{checkpoint_name}_labels_{phase}.npy"
        )
    )
    return predictions, labels


def load_history_frames(experiments, results_dir=None, dataset="", prefix="",
                        suffix=""):
    """Collect history.csv files into one frame with a model_type column
    (reference ``notebooks/utils.py:215-228``)."""
    import pandas as pd

    path = results_dir or os.environ["RESULTS_DIR"]
    frames = []
    for exp in experiments:
        p = os.path.join(path, dataset, prefix, exp, suffix, "history.csv")
        p = os.path.normpath(p)
        try:
            df = pd.read_csv(p)
        except FileNotFoundError:
            print(f"File not found for {exp}")
            continue
        df["model_type"] = exp
        frames.append(df)
    return pd.concat(frames) if frames else None


# ---------------------------------------------------------------------------
# Plotting (gated on matplotlib/seaborn availability)
# ---------------------------------------------------------------------------


def _plotting_available() -> bool:
    try:
        import matplotlib  # noqa: F401
        import seaborn  # noqa: F401

        return True
    except ImportError:
        return False


def scatter_plot_instance_level(ax, labels, ori, image, text,
                                image_correspondence, text_correspondence):
    """Std-sized Δp scatter (reference ``notebooks/utils.py:37-75``)."""
    import pandas as pd
    import seaborn as sns

    b = len(labels)
    x = image - ori
    y = (image_correspondence - np.expand_dims(ori, 1)).mean(1)
    std = (image_correspondence - np.expand_dims(ori, 1)).std(1)
    x_ = text - ori
    y_ = (text_correspondence - np.expand_dims(ori, 1)).mean(1)
    std_ = (text_correspondence - np.expand_dims(ori, 1)).std(1)

    data = pd.DataFrame({
        "experimental": np.concatenate((x, x_)),
        "control": np.concatenate((y, y_)),
        "std": np.concatenate((std, std_)),
        "modal": np.concatenate((np.repeat("image", b), np.repeat("text", b))),
    })
    sns.scatterplot(data=data, x="experimental", y="control", hue="modal",
                    size="std", sizes=(10, 200), alpha=0.5, palette="muted",
                    ax=ax)
    h, l = ax.get_legend_handles_labels()
    if len(h) > 2:
        ax.legend(h[1:3], l[1:3], loc="upper left", frameon=False)
    ax.set_ylim([-1, 1])
    ax.set_xlim([-1, 1])
    ax.plot([-1, 1], [-1, 1], "k--", alpha=0.5)
    ax.set_xlabel(r"experimental: $\Delta p$")
    ax.set_ylabel(r"control: $\Delta p$")


def histogram_by_group(labels, ori, image, text, image_correspondence,
                       text_correspondence, save_path=None):
    """Δp density histograms: ablated vs control per modality
    (reference ``notebooks/utils.py:77-103``). Saves to ``save_path`` when
    given (headless parity) instead of plt.show()."""
    if not _plotting_available():
        print("matplotlib/seaborn unavailable; skipping plots")
        return None
    import matplotlib.pyplot as plt
    import seaborn as sns

    sns.set_theme(style="whitegrid")
    fig, axs = plt.subplots(1, 2, figsize=(12, 5))
    for ax, exp, ctrl, name in (
        (axs[0], image, image_correspondence, "image only"),
        (axs[1], text, text_correspondence, "text only"),
    ):
        ax.hist(exp - ori, color="blue", alpha=0.5, label=name,
                density=True, bins=20)
        ax.hist((ctrl - np.expand_dims(ori, 1)).mean(1), color="green",
                alpha=0.5, label="control group", density=True, bins=20)
        ax.set_xlabel("Change in prediction against model with full inputs")
        ax.set_ylabel("Probability density")
        ax.legend()
    fig.tight_layout()
    if save_path:
        os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
        fig.savefig(save_path)
        plt.close(fig)
    return fig


def violin_plot_by_group(ax, labels, ori, image, text, image_correspondence,
                         text_correspondence):
    """Split violin of Δp by modality/group
    (reference ``notebooks/utils.py:105-144``)."""
    import pandas as pd
    import seaborn as sns

    b = len(labels)
    data = pd.DataFrame({
        "diff_p": np.concatenate((
            image - ori,
            (image_correspondence - np.expand_dims(ori, 1)).mean(1),
            text - ori,
            (text_correspondence - np.expand_dims(ori, 1)).mean(1),
        )),
        "modal": np.concatenate(
            (np.repeat("image", b * 2), np.repeat("text", b * 2))
        ),
        "group": np.concatenate((
            np.repeat("experimental", b), np.repeat("control", b),
            np.repeat("experimental", b), np.repeat("control", b),
        )),
    })
    sns.violinplot(data=data, y="modal", x="diff_p", hue="group",
                   palette=[".3", ".9"], split=True, inner="quart", ax=ax,
                   linewidth=1)
    ax.set_xlabel(r"$\Delta p$")
    ax.set_ylabel("")


def plot_correlation_and_performance(results_corr, full, image, text, y_label,
                                     save_path=None):
    """Epoch-wise |Pearson r| trajectories stacked over the performance
    curves (reference ``notebooks/utils.py:170-213``)."""
    if not _plotting_available():
        print("matplotlib/seaborn unavailable; skipping plots")
        return None
    import matplotlib.gridspec as gridspec
    import matplotlib.pyplot as plt
    import seaborn as sns
    from matplotlib.ticker import LinearLocator

    fig = plt.figure(figsize=(10, 6))
    plt.subplots_adjust(hspace=0.15)
    outer = gridspec.GridSpec(2, 1, height_ratios=[4, 3])
    gs1 = gridspec.GridSpecFromSubplotSpec(2, 1, subplot_spec=outer[0], hspace=0.0)
    gs2 = gridspec.GridSpecFromSubplotSpec(1, 1, subplot_spec=outer[1])
    axes = [plt.subplot(c) for c in gs1] + [plt.subplot(c) for c in gs2]

    idx = results_corr.index
    axes[0].plot(idx, abs(results_corr.image), "o--", label="image")
    axes[0].fill_between(idx, 0, abs(results_corr.image), alpha=0.5)
    axes[0].set_ylim(0, 1)
    axes[0].legend()
    axes[1].plot(idx, abs(results_corr.text), "o--", color="orange", label="text")
    axes[1].fill_between(idx, 0, abs(results_corr.text), color="orange", alpha=0.5)
    axes[1].set_ylim(0, 1)
    axes[1].invert_yaxis()
    axes[1].legend()
    for ax in axes[:2]:
        ax.yaxis.set_major_locator(LinearLocator(3))
        ax.set_ylabel("|Pearson's R|")

    axes[2].plot(idx, full, "*--", color="gray", label="image+text", alpha=0.8)
    axes[2].plot(idx, image, "*--", color=sns.color_palette()[0],
                 label="image", alpha=0.8)
    axes[2].plot(idx, text, "*--", color="orange", label="text", alpha=0.8)
    axes[2].set_xlabel("Epochs")
    axes[2].set_ylabel(y_label)
    axes[2].yaxis.set_major_locator(LinearLocator(4))
    plt.legend(ncol=3, loc="lower center")
    if save_path:
        os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
        fig.savefig(save_path)
        plt.close(fig)
    return fig


_CURVE_GRID = [  # (row, col, column-name) of the 3x3 learning-curve grid
    (0, 0, "loss"), (0, 1, "val_loss"), (0, 2, "test_loss"),
    (1, 0, "acc"), (1, 1, "val_acc"), (1, 2, "test_acc"),
    (2, 1, "val_auc"), (2, 2, "test_auc"),
]


def draw_learning_curves(experiments, prefix="", suffix="", dataset="",
                         auc=True, results_dir=None, save_dir=None):
    """3x3 (2x3 without AUC) learning-curve grid over model_types
    (reference ``notebooks/utils.py:215-281``,
    ``hateful_meme_learning_curve.py:32-75``). Returns the concatenated
    history frame; saves ``learning_curves_{prefix}_{suffix}.png`` when a
    save_dir is given."""
    all_dfs = load_history_frames(experiments, results_dir=results_dir,
                                  dataset=dataset, prefix=prefix, suffix=suffix)
    if all_dfs is None:
        return None
    if not _plotting_available():
        print("matplotlib/seaborn unavailable; returning frame only")
        return all_dfs
    import matplotlib.pyplot as plt
    import seaborn as sns

    sns.set_theme(style="whitegrid")
    sns.set_context("paper", font_scale=1.5, rc={"lines.linewidth": 2.5})
    fig, axs = plt.subplots(3 if auc else 2, 3, figsize=(15, 8))
    for r, c, col in _CURVE_GRID:
        if (not auc and r == 2) or col not in all_dfs.columns:
            continue
        sns.lineplot(x="epoch", y=col, hue="model_type", ax=axs[r, c],
                     data=all_dfs)
    plt.tight_layout()
    fig.suptitle(f"{dataset} {prefix} {suffix}")
    if save_dir:
        os.makedirs(save_dir, exist_ok=True)
        fig.savefig(os.path.join(
            save_dir,
            f"learning_curves_{prefix.replace('/', '_')}_{suffix}.png",
        ))
        plt.close(fig)
    return all_dfs


def max_metric_csv(all_dfs, out_path,
                   cols=("val_acc", "val_auc", "test_acc", "test_auc")):
    """Best-epoch metric table per model_type -> csv
    (reference ``hateful_meme_learning_curve.py:77``)."""
    cols = [c for c in cols if c in all_dfs.columns]
    table = all_dfs.groupby(["model_type"])[cols].max()
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    table.to_csv(out_path)
    return table


def visuals_per_model(outcomes, save_folder, checkpoint_name):
    """Violin + scatter Δp figures (reference ``notebooks/utils.py:146-155``)."""
    if not _plotting_available():
        print("matplotlib/seaborn unavailable; skipping plots")
        return
    import matplotlib.pyplot as plt
    import pandas as pd
    import seaborn as sns

    labels, ori, image, text, image_corr, text_corr = outcomes
    b = len(labels)
    fig, axs = plt.subplots(1, 2, figsize=(12, 6))

    data = pd.DataFrame(
        {
            "diff_p": np.concatenate(
                (
                    image - ori,
                    (image_corr - np.expand_dims(ori, 1)).mean(1),
                    text - ori,
                    (text_corr - np.expand_dims(ori, 1)).mean(1),
                )
            ),
            "modal": np.concatenate(
                (np.repeat("image", b * 2), np.repeat("text", b * 2))
            ),
            "group": np.concatenate(
                (
                    np.repeat("experimental", b),
                    np.repeat("control", b),
                    np.repeat("experimental", b),
                    np.repeat("control", b),
                )
            ),
        }
    )
    sns.violinplot(
        data=data, y="modal", x="diff_p", hue="group", split=True,
        inner="quart", ax=axs[0], linewidth=1,
    )

    scat = pd.DataFrame(
        {
            "experimental": np.concatenate((image - ori, text - ori)),
            "control": np.concatenate(
                (
                    (image_corr - np.expand_dims(ori, 1)).mean(1),
                    (text_corr - np.expand_dims(ori, 1)).mean(1),
                )
            ),
            "modal": np.concatenate((np.repeat("image", b), np.repeat("text", b))),
        }
    )
    sns.scatterplot(data=scat, x="experimental", y="control", hue="modal",
                    alpha=0.5, ax=axs[1])
    axs[1].plot([-1, 1], [-1, 1], "k--", alpha=0.5)
    fig.tight_layout()
    os.makedirs(save_folder, exist_ok=True)
    fig.savefig(os.path.join(save_folder, f"{checkpoint_name}.png"))
    plt.close(fig)
