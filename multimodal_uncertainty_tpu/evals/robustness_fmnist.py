"""FashionMNIST missing-view robustness sweep (reference ``eval_robustness.py``).

For each view i, ablate it (zero it out; the weight-sharing variant drops
the view instead, reference ``:100-115``) and re-predict. The reference runs
M sequential passes over the loader; here all M leave-one-out variants are
one vmapped forward per batch. Output layout parity: (M_, S, M, C) —
variant-major, matching ``{ckpt}_predictions_robustness.npy``.
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def missing_view_sweep(
    apply_fn,
    variables,
    loader,
    *,
    model_type: str,
    data_forming=None,  # unused: eval-phase forming is inlined per variant
    save_path: Optional[str] = None,
    checkpoint_name: str = "model",
    mesh=None,
):
    """``mesh`` shards each batch over 'data' (weights replicated) — same
    placement rules as robustness_transformer.py."""
    del data_forming
    m = 4
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

    if model_type != "single-model-weight-sharing":

        @jax.jit
        def fwd_variants(variables, x):
            # x: (B, M, C, H, W) -> variants (M, B, M, C, H, W), view i zeroed
            def one(i):
                mask = (jnp.arange(m) != i).astype(x.dtype)[None, :, None, None, None]
                return apply_fn(variables, x * mask, train=False, rngs=None)[0]

            return jax.vmap(one)(jnp.arange(m))  # (M_, B, E, C)

    else:

        @jax.jit
        def fwd_variants(variables, x):
            # drop view i: gather the other m-1 views, fold into batch
            def one(i):
                keep = jnp.argsort(jnp.where(jnp.arange(m) == i, m + 1, jnp.arange(m)))[
                    : m - 1
                ]
                x_ = x[:, keep]  # (B, m-1, C, H, W)
                b = x_.shape[0]
                flat = x_.reshape((b * (m - 1),) + x_.shape[2:])
                out = apply_fn(variables, flat, train=False, rngs=None)[0]
                return out.reshape(b, m - 1, out.shape[-1])

            return jax.vmap(one)(jnp.arange(m))  # (M_, B, m-1, C)

    outputs, labels = [], []
    for x, y in loader:
        x_j = jnp.asarray(x)
        if put_batch is not None:
            x_j = put_batch(x_j)
        outputs.append(np.asarray(fwd_variants(variables, x_j)))
        if model_type == "single-model-weight-sharing":
            # reference saves the *formed* labels, i.e. repeated per kept view
            # (eval_robustness.py:110-119)
            labels.append(np.repeat(np.asarray(y), m - 1))
        else:
            labels.append(np.asarray(y))

    from multimodal_uncertainty_tpu.evals.artifacts import concat_maybe_memmap

    pred_path = (
        os.path.join(save_path, f"{checkpoint_name}_predictions_robustness.npy")
        if save_path is not None
        else None
    )
    outputs = concat_maybe_memmap(outputs, axis=1, path=pred_path)
    labels = np.concatenate(labels, axis=0)
    if save_path is not None:
        os.makedirs(save_path, exist_ok=True)
        np.save(os.path.join(save_path, f"{checkpoint_name}_labels.npy"), labels)
    return outputs, labels
