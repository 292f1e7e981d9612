"""MIMO transformer for the FashionMNIST 4-view toy setup.

Re-design of ``src/model.py:114-171``: each 14x14 quarter becomes one token
(flattened 196 -> hidden projection), the E*C tokens run through the
CLIP-style encoder, token features are averaged over the channel axis, and
head *i* reads the features of view *i*. Heads run as one batched einsum.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from multimodal_uncertainty_tpu.models.layers import EnsembleHeads, LayerNormFP32, Linear
from multimodal_uncertainty_tpu.models.transformer import Transformer
from multimodal_uncertainty_tpu.ops.losses import mimo_cross_entropy


class MIMOTransformer(nn.Module):
    out_dim: int = 4
    num_classes: int = 10
    hidden_size: int = 768
    image_dim: int = 14 * 14
    multimodal_num_hidden_layers: int = 3
    multimodal_num_attention_heads: int = 3
    drop: float = 0.0
    attn_impl: str = "auto"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        b, e, c, h, w = x.shape
        x = x.reshape(b, e * c, h * w).astype(self.dtype)  # tokens of dim H*W
        x = Linear(self.hidden_size, name="image_to_mm_projection")(x)
        x = LayerNormFP32(name="ln_pre")(x)
        x = Transformer(
            layers=self.multimodal_num_hidden_layers,
            heads=self.multimodal_num_attention_heads,
            drop=self.drop,
            attn_impl=self.attn_impl,
            name="mm_encoder",
        )(x, train=train)
        x = LayerNormFP32(name="ln_post")(x)
        x = x.reshape(b, e, c, self.hidden_size).mean(axis=2)  # (B, E, D)
        return EnsembleHeads(self.num_classes, self.out_dim, name="output_layers")(
            x[:, : self.out_dim, :]
        )

    @staticmethod
    def compute_loss(y_hat, y, *, eval: bool = False):
        return mimo_cross_entropy(y_hat, y, eval=eval)


# Reference-spelled alias (``MIMOTransfomer`` in src/model.py:114).
MIMOTransfomer = MIMOTransformer
