"""CLIP-style pre-LN transformer encoder (flax.linen).

Re-design of the reference stack at ``src/model.py:174-223``
(fp16-safe LayerNorm, QuickGELU, pre-LN residual attention blocks). The
attention core dispatches to the Pallas fused kernel on TPU
(:mod:`multimodal_uncertainty_tpu.ops.attention`).

Quirk preserved: the reference builds the MLP as an OrderedDict with a
duplicate "dropout" key (``src/model.py:195-201``), so only ONE dropout
survives, positioned between c_fc and the activation. We replicate
c_fc -> dropout -> QuickGELU -> c_proj.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from multimodal_uncertainty_tpu.models.layers import LayerNormFP32, Linear, quick_gelu
from multimodal_uncertainty_tpu.ops.attention import attention_qkv_packed


class MultiHeadAttention(nn.Module):
    """Self-attention with packed QKV projection (torch MultiheadAttention
    layout: in_proj 3D x D, out_proj D x D).

    Q/K/V stay heads-packed (B, S, D) end to end; the head split happens
    inside the fused kernel (attention_heads_last), avoiding the HBM
    relayouts a (B, H, S, Dh) interface costs (~15% of the flagship train
    step, round-2 hardware profile)."""

    n_head: int
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, x, key_mask: Optional[jax.Array] = None):
        b, s, d = x.shape
        assert d % self.n_head == 0, (d, self.n_head)
        qkv = Linear(3 * d, name="in_proj")(x)  # (B, S, 3D)
        out = attention_qkv_packed(
            qkv, key_mask, n_head=self.n_head, impl=self.attn_impl
        )
        return Linear(d, name="out_proj")(out)


class ResidualAttentionBlock(nn.Module):
    """Pre-LN residual block (reference ``src/model.py:188-212``)."""

    n_head: int
    drop: float = 0.0
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, x, train: bool = False, key_mask: Optional[jax.Array] = None):
        d = x.shape[-1]
        h = LayerNormFP32(name="ln_1")(x)
        x = x + MultiHeadAttention(self.n_head, self.attn_impl, name="attn")(
            h, key_mask
        )
        h = LayerNormFP32(name="ln_2")(x)
        h = Linear(d * 4, name="c_fc")(h)
        h = nn.Dropout(self.drop, deterministic=not train)(h)
        h = quick_gelu(h)
        h = Linear(d, name="c_proj")(h)
        return x + h


class Transformer(nn.Module):
    """N-layer stack (reference ``src/model.py:215-223``).

    ``remat=True`` rematerializes each block's activations in the backward
    pass (jax.checkpoint) — trades ~30% more FLOPs for O(layers) less
    activation memory, the standard lever for bigger batches/longer
    sequences on HBM-limited chips."""

    layers: int
    heads: int
    drop: float = 0.0
    attn_impl: str = "auto"
    remat: bool = False

    @nn.compact
    def __call__(self, x, *, train: bool, key_mask: Optional[jax.Array] = None):
        block_cls = ResidualAttentionBlock
        if self.remat:
            block_cls = nn.remat(
                ResidualAttentionBlock, static_argnums=(2,), prevent_cse=False
            )
        for i in range(self.layers):
            x = block_cls(
                self.heads, self.drop, self.attn_impl, name=f"resblocks_{i}"
            )(x, train, key_mask)
        return x
