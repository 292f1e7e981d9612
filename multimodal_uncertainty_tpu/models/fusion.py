"""FLAVA-embedding fusion transformers (the flagship model family).

Re-design of ``src/model.py:225-374`` (FlavaFusionTransfomer and the
learned-CLS-token variant). Consumes precomputed FLAVA image/text embedding
sequences, projects each modality into a shared width, concatenates, runs a
small CLIP-style encoder, and reads E ensemble heads off designated tokens.

TPU-first differences from the reference:

* **Masked fixed-shape variants.** The reference implements modality ablation
  and random token-subset controls by physically slicing tokens (dynamic
  shapes, 43 sequential forwards per batch in
  ``eval_transformer_robustness.py``). Here every forward takes optional
  boolean keep-masks; masked keys get exactly 0 softmax weight, which is
  numerically identical to removing the tokens (per-token LN/MLP cannot mix
  positions). Head *i* reads the i-th **kept** token (stable argsort of the
  mask), matching the reference where head *i* reads position *i* of the
  sliced sequence. One jitted forward therefore serves training, eval, and
  the entire vmapped robustness sweep.

* Ensemble heads are a single batched einsum (all members in one MXU call).
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from multimodal_uncertainty_tpu.models.layers import (
    EnsembleHeads,
    LayerNormFP32,
    Linear,
)
from multimodal_uncertainty_tpu.models.transformer import Transformer
from multimodal_uncertainty_tpu.ops.losses import mimo_cross_entropy


def _kept_token_gather(out: jax.Array, mask: Optional[jax.Array], e: int) -> jax.Array:
    """Return (B, E, D): the first `e` *kept* tokens of each sequence."""
    if mask is None:
        return out[:, :e, :]
    # Stable argsort moves kept indices (mask=True) to the front in order.
    order = jnp.argsort(~mask, axis=-1, stable=True)  # (B, L)
    idx = order[:, :e]  # (B, E)
    return jnp.take_along_axis(out, idx[..., None], axis=1)


def _masked_mean(x: jax.Array, mask: Optional[jax.Array]) -> jax.Array:
    """(B, L, D) -> (B, D) mean over kept tokens (all tokens if mask None)."""
    if mask is None:
        return x.mean(axis=1)
    m = mask.astype(x.dtype)[..., None]
    cnt = jnp.maximum(m.sum(axis=1), 1.0)
    return (x * m).sum(axis=1) / cnt


class FlavaFusionTransformer(nn.Module):
    """Fusion transformer over precomputed FLAVA embeddings.

    Reference: ``src/model.py:225-304``.
    """

    out_dim: int = 1
    num_classes: int = 2
    image_hidden_size: int = 768
    text_hidden_size: int = 768
    multimodal_hidden_size: int = 768
    multimodal_num_attention_heads: int = 3
    multimodal_num_hidden_layers: int = 3
    drop: float = 0.0
    avg_pool: bool = False
    cls_token: bool = False
    attn_impl: str = "auto"
    remat: bool = False
    dtype: Any = jnp.float32
    # --pipeline_parallel hook: a callable (mm_x, key_mask) -> encoded that
    # replaces the in-module mm_encoder execution (parameters are still
    # created by init — the override reads the SAME resblocks_i leaves, see
    # parallel/pipeline.py::fusion_pipeline_encoder). None = run inline.
    encoder_override: Any = None

    @nn.compact
    def __call__(
        self,
        x: Tuple[Optional[jax.Array], Optional[jax.Array]],
        *,
        train: bool = False,
        img_mask: Optional[jax.Array] = None,
        txt_mask: Optional[jax.Array] = None,
    ) -> jax.Array:
        image_features, text_features = x
        parts, masks = [], []
        any_mask = img_mask is not None or txt_mask is not None
        b = (image_features if image_features is not None else text_features).shape[0]

        if image_features is not None:
            image_features = Linear(
                self.multimodal_hidden_size, name="image_to_mm_projection"
            )(image_features.astype(self.dtype))
            parts.append(image_features)
            l_img = image_features.shape[1]
            masks.append(
                img_mask
                if img_mask is not None
                else jnp.ones((b, l_img), bool)
            )
        else:
            l_img = 0
        if text_features is not None:
            text_features = Linear(
                self.multimodal_hidden_size, name="text_to_mm_projection"
            )(text_features.astype(self.dtype))
            parts.append(text_features)
            l_txt = text_features.shape[1]
            masks.append(
                txt_mask if txt_mask is not None else jnp.ones((b, l_txt), bool)
            )
        else:
            l_txt = 0

        mm_x = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)
        mask = jnp.concatenate(masks, axis=1) if any_mask else None

        n_cls = 0
        if self.cls_token:
            # (D, E) scaled randn, matching src/model.py:327-328.
            scale = self.multimodal_hidden_size**-0.5
            cls = self.param(
                "class_embeddings",
                lambda k, s: scale * jax.random.normal(k, s, jnp.float32),
                (self.multimodal_hidden_size, self.out_dim),
            )
            cls_tokens = jnp.broadcast_to(
                cls.T.astype(mm_x.dtype)[None],
                (b, self.out_dim, self.multimodal_hidden_size),
            )
            mm_x = jnp.concatenate([cls_tokens, mm_x], axis=1)
            if mask is not None:
                mask = jnp.concatenate(
                    [jnp.ones((b, self.out_dim), bool), mask], axis=1
                )
            n_cls = self.out_dim

        mm_x = LayerNormFP32(name="ln_pre")(mm_x)
        if self.encoder_override is not None:
            out = self.encoder_override(mm_x, mask)
        else:
            out = Transformer(
                layers=self.multimodal_num_hidden_layers,
                heads=self.multimodal_num_attention_heads,
                drop=self.drop,
                attn_impl=self.attn_impl,
                remat=self.remat,
                name="mm_encoder",
            )(mm_x, train=train, key_mask=mask)
        out = LayerNormFP32(name="ln_post")(out)

        if self.avg_pool and not self.cls_token:
            # Head 0 pools the image segment, head 1 the text segment
            # (src/model.py:282-287). Masked means handle ablated tokens.
            img_seg = out[:, :l_img, :]
            txt_seg = out[:, l_img : l_img + l_txt, :]
            img_m = mask[:, :l_img] if mask is not None else None
            txt_m = mask[:, l_img : l_img + l_txt] if mask is not None else None
            pooled = []
            if l_img:
                pooled.append(_masked_mean(img_seg, img_m))
            if l_txt:
                pooled.append(_masked_mean(txt_seg, txt_m))
            while len(pooled) < self.out_dim:  # missing modality at eval
                pooled.append(pooled[-1])
            tokens = jnp.stack(pooled[: self.out_dim], axis=1)
        else:
            if n_cls:
                tokens = out[:, : self.out_dim, :]  # CLS positions, always kept
            else:
                tokens = _kept_token_gather(out, mask, self.out_dim)

        return EnsembleHeads(
            self.num_classes, self.out_dim, name="output_layers"
        )(tokens)

    @staticmethod
    def compute_loss(y_hat, y, *, eval: bool = False):
        return mimo_cross_entropy(y_hat, y, eval=eval)


# Alias preserving the reference's class name (and its spelling).
FlavaFusionTransfomer = FlavaFusionTransformer


def flava_fusion_with_cls_token(**kwargs) -> FlavaFusionTransformer:
    """Constructor mirroring ``FlavaFusionTransfomerwithCLSToken``
    (``src/model.py:306-374``): learned per-head class-embedding tokens are
    prepended and the heads read the E CLS positions. Default drop=0.1."""
    kwargs.setdefault("drop", 0.1)
    return FlavaFusionTransformer(cls_token=True, **kwargs)
