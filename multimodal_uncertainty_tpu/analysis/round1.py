"""FashionMNIST-round analysis (reference ``notebooks/analysis_round_1.py``):
head-diversity Kendall-tau, per-view/overall accuracy, missing-view breakdown.
"""
from __future__ import annotations

import itertools
from typing import List, Sequence

import numpy as np


def trunk_pred_top(pred: np.ndarray, test_cls, top: int, mute_true: bool = False):
    """Keep only each row's top-k logits (zero the rest); optionally zero the
    true-class logit first (reference ``:74-84``)."""
    pred_ = []
    for i in range(len(pred)):
        p = pred[i].copy()
        if mute_true:
            p[test_cls[i]] = 0
        value = np.partition(pred[i].flatten(), -top)[-top]
        p = [j if j >= value else 0 for j in p]
        pred_.append(p)
    return np.array(pred_)


def subnetwork_kendalltau(preds_muted: Sequence[np.ndarray]) -> np.ndarray:
    """Pairwise Kendall-tau between heads' muted top-k predictions
    (reference ``:86-89``)."""
    from scipy import stats

    outputs = np.array(
        [stats.kendalltau(x, y) for x, y in itertools.combinations(preds_muted, 2)]
    )
    return outputs[:, 0]


def accuracy_breakdown(predictions: np.ndarray, labels: np.ndarray) -> dict:
    """Overall (head-mean) and per-head accuracy from a (S, M, C) dump
    (reference ``:99-105``)."""
    acc_overall = float(
        np.equal(np.argmax(predictions.mean(1), 1), labels).mean()
    )
    acc_heads = [
        float((np.argmax(predictions[:, i, :], 1) == labels).mean())
        for i in range(predictions.shape[1])
    ]
    return {"accuracy_overall": acc_overall, "accuracy_viewwise": acc_heads}


def head_diversity(predictions: np.ndarray, labels: np.ndarray, top: int = 5):
    """Mean pairwise Kendall-tau of top-k muted head predictions
    (reference ``:107-113``)."""
    num_views = predictions.shape[1]
    preds_muted = [
        trunk_pred_top(predictions[:, i, :], labels, top, mute_true=True)
        for i in range(num_views)
    ]
    taus = subnetwork_kendalltau(preds_muted)
    return float(taus.mean()), taus


def missing_view_accuracy(robustness_preds: np.ndarray, labels: np.ndarray) -> List[float]:
    """Head-mean accuracy per ablated view from the (M_, S, M, C) sweep
    (reference ``:152-159``)."""
    num_views = robustness_preds.shape[0]
    return [
        float((np.argmax(robustness_preds[i].mean(1), 1) == labels).mean())
        for i in range(num_views)
    ]
