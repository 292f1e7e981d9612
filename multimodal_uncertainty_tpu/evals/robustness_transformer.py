"""FLAVA-fusion modality-ablation robustness sweep.

Reference ``eval_transformer_robustness.py``: per batch, 3 + 2*n_repeats
sequential forwards — full input, image-only, text-only, then ``n_repeats``
random token-subset controls per modality (``input_sampling``, ``:37-52``:
the control keeps as many tokens as the ablated-modality forward would,
drawn at random across BOTH modalities). Output layout contract (consumed by
the notebooks): column 0 = full, 1 = image-only, 2 = text-only,
3..3+R = image-controls, 3+R..3+2R = text-controls; tensor (S, V, E, C).

TPU re-design: every variant is a fixed-shape boolean keep-mask pair; ONE
jitted program evaluates all V variants of a batch — a lax.map over
chunk-vmapped variant groups (chunking bounds live activation memory; a full
V-wide vmap spills to HBM and measures slower, see BASELINE.md). The masked
forward is numerically identical to physically dropping tokens — see
models/fusion.py. Crucially the fixed shape means ONE compilation, where the
reference's physical slicing yields a different shape (and recompile) per
variant.

Documented reference-bug fix: ``:119`` builds the text control slice from
``img``; here text controls correctly mask the text stream.
"""
from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def input_sampling_masks(
    rng: np.random.Generator, l_img: int, l_txt: int, kind: str
) -> Tuple[np.ndarray, np.ndarray]:
    """One control variant: keep-mask pair with the reference's sampling law
    (n ~ U(0, l) inclusive; kept indices sorted-random without replacement).
    """
    assert kind in ("image", "text")
    l = l_img if kind == "image" else l_txt
    n = int(rng.integers(0, l + 1))
    n_img = n if kind == "image" else l - n
    n_txt = n if kind == "text" else l - n
    img_mask = np.zeros(l_img, bool)
    txt_mask = np.zeros(l_txt, bool)
    img_mask[rng.permutation(l_img)[:n_img]] = True
    txt_mask[rng.permutation(l_txt)[:n_txt]] = True
    return img_mask, txt_mask


def build_variant_masks(
    rng: np.random.Generator, l_img: int, l_txt: int, n_repeats: int
) -> Tuple[np.ndarray, np.ndarray]:
    """(V, l_img), (V, l_txt) keep masks, V = 3 + 2*n_repeats, column
    contract as documented above."""
    img_masks = [np.ones(l_img, bool), np.ones(l_img, bool), np.zeros(l_img, bool)]
    txt_masks = [np.ones(l_txt, bool), np.zeros(l_txt, bool), np.ones(l_txt, bool)]
    for kind in ("image", "text"):
        for _ in range(n_repeats):
            im, tm = input_sampling_masks(rng, l_img, l_txt, kind)
            img_masks.append(im)
            txt_masks.append(tm)
    return np.stack(img_masks), np.stack(txt_masks)


def transformer_robustness_sweep(
    apply_fn,
    variables,
    loader,
    *,
    n_repeats: int = 20,
    seed: int = 42,
    save_path: Optional[str] = None,
    checkpoint_name: str = "model",
    phase: str = "val",
    variant_chunk: int = 16,
    mesh=None,
):
    """Returns (preds (S, V, E, C), labels (S,)); optionally saves
    ``robustness_{ckpt}_predictions_{phase}.npy`` (+labels).

    ``mesh`` runs the sweep data-parallel across chips: each batch shards
    over the mesh's 'data' axis (weights/masks replicated), so a v5e-8
    sweeps ~8x the variant-samples/sec. Batches that don't divide the
    data axis (the loader's final remainder) place replicated — exact,
    just un-sped for that batch."""
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

    # variables is a jit ARGUMENT (not a closure constant): one compilation
    # serves every checkpoint (tools/epochwise_robustness.py sweeps many),
    # and weights aren't baked into the executable.
    @jax.jit
    def fwd_variants(variables, img, txt, img_masks, txt_masks):
        b = img.shape[0]
        v = img_masks.shape[0]
        chunk = min(variant_chunk, v)
        pad = (-v) % chunk
        img_masks = jnp.concatenate(
            [img_masks, jnp.ones((pad, img_masks.shape[1]), bool)]
        )
        txt_masks = jnp.concatenate(
            [txt_masks, jnp.ones((pad, txt_masks.shape[1]), bool)]
        )

        def one(masks):
            im, tm = masks  # (chunk, L)
            im_b = jnp.broadcast_to(im[:, None, :], (chunk, b, im.shape[1]))
            tm_b = jnp.broadcast_to(tm[:, None, :], (chunk, b, tm.shape[1]))
            return jax.vmap(
                lambda a, t: apply_fn(
                    variables, (img, txt), train=False, rngs=None,
                    img_mask=a, txt_mask=t,
                )[0]
            )(im_b, tm_b)

        out = jax.lax.map(
            one,
            (
                img_masks.reshape(-1, chunk, img_masks.shape[1]),
                txt_masks.reshape(-1, chunk, txt_masks.shape[1]),
            ),
        )  # (groups, chunk, B, E, C)
        out = out.reshape(-1, *out.shape[2:])[:v]  # (V, B, E, C)
        return jnp.transpose(out, (1, 0, 2, 3))  # (B, V, E, C)

    preds, labels = [], []
    for (img, txt), y in loader:
        l_img, l_txt = img.shape[1], txt.shape[1]
        # fresh random controls per batch, like the reference's in-loop sampling
        img_masks, txt_masks = build_variant_masks(rng, l_img, l_txt, n_repeats)
        jimg, jtxt = jnp.asarray(img), jnp.asarray(txt)
        jim, jtm = jnp.asarray(img_masks), jnp.asarray(txt_masks)
        if put_batch is not None:
            jimg, jtxt = put_batch((jimg, jtxt))
            jim, jtm = jax.device_put((jim, jtm), repl)
        out = fwd_variants(variables, jimg, jtxt, jim, jtm)
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
