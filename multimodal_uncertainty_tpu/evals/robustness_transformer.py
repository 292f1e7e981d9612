"""FLAVA-fusion modality-ablation robustness sweep.

Reference ``eval_transformer_robustness.py``: per batch, 3 + 2*n_repeats
sequential forwards — full input, image-only, text-only, then ``n_repeats``
random token-subset controls per modality (``input_sampling``, ``:37-52``:
the control keeps as many tokens as the ablated-modality forward would,
drawn at random across BOTH modalities). Output layout contract (consumed by
the notebooks): column 0 = full, 1 = image-only, 2 = text-only,
3..3+R = image-controls, 3+R..3+2R = text-controls; tensor (S, V, E, C).

TPU re-design: every variant is a fixed-shape boolean keep-mask pair; ONE
vmapped forward over the variant axis evaluates all V variants of a batch in
a single XLA program (the masked forward is numerically identical to
physically dropping tokens — see models/fusion.py docstring).

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
):
    """Returns (preds (S, V, E, C), labels (S,)); optionally saves
    ``robustness_{ckpt}_predictions_{phase}.npy`` (+labels)."""
    rng = np.random.default_rng(seed)

    @jax.jit
    def fwd_variants(img, txt, img_masks, txt_masks):
        b = img.shape[0]

        def one(im, tm):
            im_b = jnp.broadcast_to(im[None], (b, im.shape[0]))
            tm_b = jnp.broadcast_to(tm[None], (b, tm.shape[0]))
            return apply_fn(
                variables,
                (img, txt),
                train=False,
                rngs=None,
                img_mask=im_b,
                txt_mask=tm_b,
            )[0]

        out = jax.vmap(one)(img_masks, txt_masks)  # (V, B, E, C)
        return jnp.transpose(out, (1, 0, 2, 3))  # (B, V, E, C)

    preds, labels = [], []
    for (img, txt), y in loader:
        l_img, l_txt = img.shape[1], txt.shape[1]
        # fresh random controls per batch, like the reference's in-loop sampling
        img_masks, txt_masks = build_variant_masks(rng, l_img, l_txt, n_repeats)
        out = fwd_variants(
            jnp.asarray(img),
            jnp.asarray(txt),
            jnp.asarray(img_masks),
            jnp.asarray(txt_masks),
        )
        preds.append(np.asarray(out))
        labels.append(np.asarray(y).reshape(-1))

    preds = np.concatenate(preds, axis=0)
    labels = np.concatenate(labels, axis=0)
    if save_path is not None:
        os.makedirs(save_path, exist_ok=True)
        np.save(
            os.path.join(
                save_path, f"robustness_{checkpoint_name}_predictions_{phase}.npy"
            ),
            preds,
        )
        np.save(
            os.path.join(save_path, f"robustness_{checkpoint_name}_labels_{phase}.npy"),
            labels,
        )
    return preds, labels
