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
