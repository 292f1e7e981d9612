"""Metrics: accuracy (on-device), AUROC and ECE (host-side numpy).

``accuracy`` mirrors the reference ``acc`` metric exactly
(``train.py:119-130`` / ``train_fashionmnist.py:44-55``): during training the
(B, E, C) logits are flattened to (B*E, C) rows; at eval logits are
head-averaged first. Returned in percent.

``binary_auroc`` replaces ``sklearn.roc_auc_score`` (used at
``src/framework.py:197-198``) with a rank-statistic implementation so the
framework has no sklearn dependency; it matches sklearn to float64 precision
including tie handling.

``expected_calibration_error`` is the north-star calibration metric added on
top of reference parity (equal-width binning, |conf - acc| weighted by bin
mass).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def accuracy(
    y_pred: jax.Array, y_true: jax.Array, *, eval: bool, dummy_dim: bool = True
) -> jax.Array:
    """Percent accuracy with the reference's train/eval head layout."""
    if dummy_dim:
        if not eval:
            y_pred = y_pred.reshape(-1, y_pred.shape[-1])
            y_true = y_true.reshape(-1)
        else:
            y_pred = y_pred.mean(axis=1)
    pred = jnp.argmax(y_pred, axis=-1)
    return jnp.mean((pred == y_true.reshape(-1)).astype(jnp.float32)) * 100.0


def binary_auroc(labels: np.ndarray, scores: np.ndarray) -> float:
    """AUROC for binary labels via the Mann-Whitney U rank statistic."""
    labels = np.asarray(labels).reshape(-1).astype(np.int64)
    scores = np.asarray(scores).reshape(-1).astype(np.float64)
    n_pos = int(labels.sum())
    n_neg = labels.size - n_pos
    if n_pos == 0 or n_neg == 0:
        raise ValueError("binary_auroc needs both classes present")
    order = np.argsort(scores, kind="mergesort")
    ranks = np.empty_like(scores)
    sorted_scores = scores[order]
    # average ranks for ties (1-indexed)
    i = 0
    base = np.arange(1, scores.size + 1, dtype=np.float64)
    while i < scores.size:
        j = i
        while j + 1 < scores.size and sorted_scores[j + 1] == sorted_scores[i]:
            j += 1
        ranks[order[i : j + 1]] = base[i : j + 1].mean()
        i = j + 1
    rank_sum_pos = ranks[labels == 1].sum()
    u = rank_sum_pos - n_pos * (n_pos + 1) / 2.0
    return float(u / (n_pos * n_neg))


def expected_calibration_error(
    probs: np.ndarray, labels: np.ndarray, n_bins: int = 15
) -> float:
    """ECE with equal-width confidence bins over max-prob predictions."""
    probs = np.asarray(probs, dtype=np.float64)
    labels = np.asarray(labels).reshape(-1)
    conf = probs.max(axis=-1)
    pred = probs.argmax(axis=-1)
    correct = (pred == labels).astype(np.float64)
    edges = np.linspace(0.0, 1.0, n_bins + 1)
    ece = 0.0
    n = labels.size
    for lo, hi in zip(edges[:-1], edges[1:]):
        in_bin = (conf > lo) & (conf <= hi) if lo > 0 else (conf >= lo) & (conf <= hi)
        if in_bin.any():
            ece += in_bin.mean() * abs(correct[in_bin].mean() - conf[in_bin].mean())
    del n
    return float(ece)


def softmax_np(x: np.ndarray) -> np.ndarray:
    """Numerically-stable numpy softmax (analysis helper, reference
    ``notebooks/utils.py:22-23``)."""
    x = np.asarray(x, dtype=np.float64)
    x = x - x.max(axis=-1, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=-1, keepdims=True)
