"""Per-head prediction dumps (reference ``eval_prediction_saving.py``).

Forward the eval split once, save per-head logits (S, M, C) + labels (S,)
as ``{ckpt}_predictions.npy`` / ``{ckpt}_labels.npy`` — the artifacts the
analysis notebooks consume (Kendall-tau diversity, ensemble accuracy).
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def save_predictions(
    apply_fn,
    variables,
    loader,
    *,
    model_type: str,
    data_forming,
    save_path: Optional[str] = None,
    checkpoint_name: str = "model",
    mesh=None,
):
    """Returns (outputs (S, M, C), labels (S,)); writes .npy if save_path.
    ``mesh`` shards each batch over 'data' (weights replicated)."""
    put_batch = None
    if mesh is not None:
        from multimodal_uncertainty_tpu.parallel.sharding import (
            put_batch_fn,
            replicated,
        )

        put_batch = put_batch_fn(mesh)
        variables = jax.device_put(
            variables,
            jax.tree_util.tree_map(lambda _: replicated(mesh), variables),
        )

    @jax.jit
    def fwd(variables, x):
        return apply_fn(variables, x, train=False, rngs=None)[0]

    outputs, labels = [], []
    for x, y in loader:
        b = x.shape[0]
        m = x.shape[1]
        x_j, y_j = jnp.asarray(x), jnp.asarray(y)
        x_j, y_j = data_forming(jax.random.key(0), x_j, y_j, "eval")
        if put_batch is not None:
            x_j = put_batch(x_j)
        y_hat = fwd(variables, x_j)
        if model_type == "single-model-weight-sharing":
            y_hat = y_hat.reshape(b, m, y_hat.shape[-1])
            y_j = y_j.reshape(b, m)[:, 0]
        outputs.append(np.asarray(y_hat))
        labels.append(np.asarray(y_j))

    from multimodal_uncertainty_tpu.evals.artifacts import concat_maybe_memmap

    pred_path = (
        os.path.join(save_path, f"{checkpoint_name}_predictions.npy")
        if save_path is not None
        else None
    )
    outputs = concat_maybe_memmap(outputs, axis=0, path=pred_path)
    labels = np.concatenate(labels, axis=0)
    if save_path is not None:
        os.makedirs(save_path, exist_ok=True)
        np.save(os.path.join(save_path, f"{checkpoint_name}_labels.npy"), labels)
    return outputs, labels
