"""MMBT modality-ablation robustness sweep.

Reference ``eval_mmbt_robustness.py`` + the variant forwards in
``src/mmbt.py:130-234``: per batch, full / image-only / text-only, plus
``n_repeats`` random token-subset controls per modality
(``forward_control``: keep CLS + n random positions of the concatenated
sequence, where n = num_image_embeds+1 for image controls and txt_len for
text controls). Output (S, 3 + 2*n_repeats, C), column order as in the
notebooks' contract.

TPU re-design: every variant is a keep-mask over the concatenated sequence;
variants are evaluated by ONE jitted program — a lax.map over chunk-vmapped
variant groups (chunking bounds live activation memory; see
robustness_transformer.py).
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def build_mmbt_variant_masks(
    rng: np.random.Generator,
    txt_len: int,
    num_image_embeds: int,
    n_repeats: int,
) -> np.ndarray:
    """(V, n_img_tok + txt_len) keep masks; V = 3 + 2*n_repeats."""
    n_img_tok = num_image_embeds + 2
    total = n_img_tok + txt_len
    masks = [
        np.ones(total, bool),  # full
        np.concatenate([np.ones(n_img_tok, bool), np.zeros(txt_len, bool)]),
        np.concatenate(
            [np.ones(1, bool), np.zeros(n_img_tok - 1, bool), np.ones(txt_len, bool)]
        ),
    ]
    for kind in ("image", "text"):
        n_keep = num_image_embeds + 1 if kind == "image" else txt_len
        for _ in range(n_repeats):
            m = np.zeros(total, bool)
            m[0] = True  # CLS always kept (reference :198)
            sel = rng.permutation(total - 1)[:n_keep] + 1
            m[sel] = True
            masks.append(m)
    return np.stack(masks)


def mmbt_robustness_sweep(
    apply_fn,
    variables,
    loader,
    *,
    num_image_embeds: int = 3,
    n_repeats: int = 20,
    seed: int = 42,
    save_path: Optional[str] = None,
    checkpoint_name: str = "model",
    phase: str = "val",
    variant_chunk: int = 8,
    mesh=None,
):
    """``mesh`` runs the sweep data-parallel across chips (see
    robustness_transformer.py — same placement rules)."""
    rng = np.random.default_rng(seed)
    put_batch = None
    if mesh is not None:
        from multimodal_uncertainty_tpu.parallel.sharding import (
            put_batch_fn,
            replicated,
        )

        put_batch = put_batch_fn(mesh)
        repl = replicated(mesh)
        variables = jax.device_put(
            variables, jax.tree_util.tree_map(lambda _: repl, variables)
        )

    # variables as a jit argument: one compile across checkpoints, no
    # weights-as-constants in the executable (see robustness_transformer.py)
    @jax.jit
    def fwd_variants(variables, x, keep_masks):
        b = x[0].shape[0]
        v = keep_masks.shape[0]
        chunk = min(variant_chunk, v)
        pad = (-v) % chunk
        keep_masks = jnp.concatenate(
            [keep_masks, jnp.ones((pad, keep_masks.shape[1]), bool)]
        )

        def one(keeps):
            keep_b = jnp.broadcast_to(
                keeps[:, None, :], (chunk, b, keeps.shape[1])
            )
            return jax.vmap(
                lambda k: apply_fn(
                    variables, x, train=False, rngs=None, seq_keep_mask=k
                )[0]
            )(keep_b)

        out = jax.lax.map(
            one, keep_masks.reshape(-1, chunk, keep_masks.shape[1])
        )  # (groups, chunk, B, C)
        out = out.reshape(-1, *out.shape[2:])[:v]
        return jnp.transpose(out, (1, 0, 2))

    preds, labels = [], []
    for x, y in loader:
        txt_len = x[0].shape[1]
        masks = build_mmbt_variant_masks(rng, txt_len, num_image_embeds, n_repeats)
        jx = jax.tree_util.tree_map(jnp.asarray, tuple(x))
        jm = jnp.asarray(masks)
        if put_batch is not None:
            jx = put_batch(jx)
            jm = jax.device_put(jm, repl)
        out = fwd_variants(variables, jx, jm)
        preds.append(np.asarray(out))
        labels.append(np.asarray(y).reshape(-1))

    from multimodal_uncertainty_tpu.evals.artifacts import concat_maybe_memmap

    pred_path = (
        os.path.join(
            save_path, f"robustness_{checkpoint_name}_predictions_{phase}.npy"
        )
        if save_path is not None
        else None
    )
    preds = concat_maybe_memmap(preds, axis=0, path=pred_path)
    labels = np.concatenate(labels, axis=0)
    if save_path is not None:
        os.makedirs(save_path, exist_ok=True)
        np.save(
            os.path.join(save_path, f"robustness_{checkpoint_name}_labels_{phase}.npy"),
            labels,
        )
    return preds, labels
