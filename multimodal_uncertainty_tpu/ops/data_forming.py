"""MIMO / multi-head batch-forming strategies as pure JAX functions.

The reference implements six ensemble-diversity strategies as CPU-side batch
transforms applied before each forward pass (reference ``src/dataset.py:30-101``,
chosen per run in ``train.py:212-214`` / ``train_fashionmnist.py:164-165``).
Here they are pure functions of a PRNG key so they compile into the jitted
train step and the shuffles execute on-device.

Semantics (verified against the reference, distributional parity for the
random permutations — exact torch.randperm streams cannot be reproduced):

5-D image path ``data_forming_func`` (x: (B, M, C, H, W), y: (B,)):
  - ``Vanilla`` (train):              y -> (B, 1)
  - ``single-model-weight-sharing``:  x -> (B*M, C, H, W), y -> (B*M,)
    (applied in *every* phase, matching the reference's missing phase guard)
  - ``MultiHead`` (train):            y -> (B, M)
  - ``MIMO-shuffle-instance`` (train): per-view independent batch permutation
  - ``MIMO-shuffle-view`` (train):    permute the view axis, y -> (B, M)
  - ``MIMO-shuffle-all`` (train):     instance-shuffle then view-shuffle
  - all strategies are identity at eval (y stays (B,)), except weight-sharing.

2-modality path ``data_forming_func_transformer`` (x = (img, txt)):
  - ``Vanilla`` (train):               y -> (B, 1)
  - ``MultiHead`` (train):             y -> (B, 2)
  - ``MIMO-shuffle-instance`` (train): independent batch permutations of the
    image and text streams, labels following each stream; y -> (B, 2)
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

MODEL_TYPES = (
    "Vanilla",
    "MIMO-shuffle-instance",
    "MIMO-shuffle-view",
    "MultiHead",
    "MIMO-shuffle-all",
    "single-model-weight-sharing",
)


def data_forming_func(
    key: jax.Array,
    x: jax.Array,
    y: jax.Array,
    *,
    phase: str,
    model_type: str,
) -> Tuple[jax.Array, jax.Array]:
    """Multi-view (5-D) batch forming. Reference: ``src/dataset.py:56-101``."""
    if model_type not in MODEL_TYPES:
        raise ValueError(f"unknown model_type {model_type!r}")
    b, m = x.shape[0], x.shape[1]

    if model_type == "single-model-weight-sharing":
        # Reference applies this in every phase (src/dataset.py:62-65).
        y = jnp.repeat(y[:, None], m, axis=1).reshape(-1)
        x = x.reshape((b * m,) + x.shape[2:])
        return x, y

    if phase != "train":
        return x, y

    if model_type == "Vanilla":
        return x, y[:, None]

    if model_type == "MultiHead":
        return x, jnp.repeat(y[:, None], m, axis=1)

    if model_type == "MIMO-shuffle-instance":
        x, y = _shuffle_instance(key, x, y, m)
        return x, y

    if model_type == "MIMO-shuffle-view":
        perm = jax.random.permutation(key, m)
        return x[:, perm], jnp.repeat(y[:, None], m, axis=1)

    if model_type == "MIMO-shuffle-all":
        k1, k2 = jax.random.split(key)
        x, y = _shuffle_instance(k1, x, y, m)
        perm = jax.random.permutation(k2, m)
        return x[:, perm], y[:, perm]

    raise AssertionError  # unreachable


def _shuffle_instance(key, x, y, m):
    """Independent batch permutation per view; labels follow their view."""
    b = x.shape[0]
    keys = jax.random.split(key, m)
    # (M, B) permutation matrix of indices; one independent permutation per view.
    idx = jnp.stack([jax.random.permutation(k, b) for k in keys], axis=0)
    # x[:, i] <- x[idx[i], i]; build with advanced indexing over the view axis.
    view_ids = jnp.arange(m)[None, :]  # (1, M)
    x = x[idx.T, view_ids]  # (B, M, ...) gathered per view
    y = y[idx.T]  # (B, M)
    return x, y


def data_forming_func_transformer(
    key: jax.Array,
    x: Tuple[jax.Array, jax.Array],
    y: jax.Array,
    *,
    phase: str,
    model_type: str,
) -> Tuple[Tuple[jax.Array, jax.Array], jax.Array]:
    """Two-modality batch forming. Reference: ``src/dataset.py:30-54``."""
    img, txt = x
    if phase != "train":
        return (img, txt), y

    if model_type == "Vanilla":
        return (img, txt), y[:, None]

    if model_type == "MultiHead":
        return (img, txt), jnp.repeat(y[:, None], 2, axis=1)

    if model_type == "MIMO-shuffle-instance":
        k1, k2 = jax.random.split(key)
        idx_img = jax.random.permutation(k1, img.shape[0])
        idx_txt = jax.random.permutation(k2, txt.shape[0])
        img = img[idx_img]
        txt = txt[idx_txt]
        y = jnp.stack([y[idx_img], y[idx_txt]], axis=1)
        return (img, txt), y

    raise ValueError(
        f"model_type {model_type!r} not supported on the two-modality path"
    )
