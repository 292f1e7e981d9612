"""BERT encoder (flax.linen) for the MMBT path.

Architecture matches ``pytorch_pretrained_bert.modeling.BertModel``
(bert-base/large): post-LN self-attention blocks, erf-GELU intermediate,
LayerNorm eps 1e-12, first-token tanh pooler. Attention dispatches to the
shared SDPA op (Pallas fused kernel on TPU); the reference's additive
``(1-m)*-10000`` mask (``src/mmbt.py:108-112``) is numerically identical to
our boolean key-mask (masked keys get exactly 0 softmax weight in fp32).

Pretrained weights import from a local torch state dict via
:mod:`models.torch_import` (no network in this environment).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from multimodal_uncertainty_tpu.models.layers import Linear
from multimodal_uncertainty_tpu.ops.attention import (
    attention_heads_last,
    attention_probs_dropout,
)
from multimodal_uncertainty_tpu.ops.norms import layer_norm


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    hidden_dropout_prob: float = 0.1
    # 0 keeps attention a single fused kernel (documented deviation from
    # torch BERT's 0.1); >0 = opt-in reference-exact parity training
    attention_probs_dropout_prob: float = 0.0
    layer_norm_eps: float = 1e-12

    @staticmethod
    def base() -> "BertConfig":
        return BertConfig()

    @staticmethod
    def large() -> "BertConfig":
        return BertConfig(
            hidden_size=1024,
            num_hidden_layers=24,
            num_attention_heads=16,
            intermediate_size=4096,
        )


class BertLayerNorm(nn.Module):
    eps: float = 1e-12

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        weight = self.param("weight", nn.initializers.ones, (d,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (d,), jnp.float32)
        return layer_norm(x, weight, bias, self.eps)


class BertEmbeddings(nn.Module):
    """word + position + token_type embeddings -> LN -> dropout."""

    config: BertConfig

    @nn.compact
    def __call__(self, input_ids, token_type_ids, *, train: bool,
                 position_ids: Optional[jax.Array] = None):
        c = self.config
        init = nn.initializers.normal(stddev=0.02)
        word = self.param("word_embeddings", init, (c.vocab_size, c.hidden_size))
        pos = self.param(
            "position_embeddings", init, (c.max_position_embeddings, c.hidden_size)
        )
        tok = self.param(
            "token_type_embeddings", init, (c.type_vocab_size, c.hidden_size)
        )
        if position_ids is None:
            position_ids = jnp.arange(input_ids.shape[1])[None, :]
        x = word[input_ids] + pos[position_ids] + tok[token_type_ids]
        x = BertLayerNorm(c.layer_norm_eps, name="LayerNorm")(x)
        return nn.Dropout(c.hidden_dropout_prob, deterministic=not train)(x)


class BertSelfAttention(nn.Module):
    config: BertConfig
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, x, key_mask, *, train: bool):
        c = self.config
        d = x.shape[-1]
        h = c.num_attention_heads
        q = Linear(d, name="query")(x)
        k = Linear(d, name="key")(x)
        v = Linear(d, name="value")(x)
        # attention-PROB dropout (0.1 in torch BERT) defaults OFF;
        # config.attention_probs_dropout_prob > 0 (train.py
        # --attention_probs_dropout) opts into the reference-exact TRAINING
        # regularizer. Since round 5 the dropout stays ON the kernel path
        # (fused keep-mask pass, ops/attention.py
        # attention_heads_last_dropout), falling back to the XLA route
        # only where the kernel family can't serve the shape/impl. Eval is
        # identical either way (dropout is train-only).
        p = c.attention_probs_dropout_prob
        if train and p > 0.0:
            from multimodal_uncertainty_tpu.ops.attention import (
                attention_heads_last_dropout,
            )

            return attention_heads_last_dropout(
                q, k, v, key_mask, n_head=h, rate=p,
                rng=self.make_rng("dropout"), impl=self.attn_impl,
            )
        # Heads stay packed in the last dim; split happens inside the kernel.
        return attention_heads_last(q, k, v, key_mask, n_head=h, impl=self.attn_impl)


class BertLayer(nn.Module):
    config: BertConfig
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, x, key_mask, train: bool = False):
        c = self.config
        attn_out = BertSelfAttention(c, self.attn_impl, name="self")(
            x, key_mask, train=train
        )
        attn_out = Linear(c.hidden_size, name="attn_output_dense")(attn_out)
        attn_out = nn.Dropout(c.hidden_dropout_prob, deterministic=not train)(attn_out)
        x = BertLayerNorm(c.layer_norm_eps, name="attn_output_LayerNorm")(x + attn_out)

        inter = Linear(c.intermediate_size, name="intermediate_dense")(x)
        inter = jax.nn.gelu(inter, approximate=False)  # erf GELU (BERT exact)
        out = Linear(c.hidden_size, name="output_dense")(inter)
        out = nn.Dropout(c.hidden_dropout_prob, deterministic=not train)(out)
        return BertLayerNorm(c.layer_norm_eps, name="output_LayerNorm")(x + out)


class BertEncoder(nn.Module):
    config: BertConfig
    attn_impl: str = "auto"
    remat: bool = False  # rematerialize each layer in the backward pass

    @nn.compact
    def __call__(self, x, key_mask, *, train: bool):
        layer_cls = BertLayer
        if self.remat:
            # argnums count the module as arg 0 -> 3 is the train flag
            layer_cls = nn.remat(BertLayer, static_argnums=(3,),
                                 prevent_cse=False)
        for i in range(self.config.num_hidden_layers):
            x = layer_cls(self.config, self.attn_impl, name=f"layer_{i}")(
                x, key_mask, train
            )
        return x


class BertPooler(nn.Module):
    config: BertConfig

    @nn.compact
    def __call__(self, x):
        return jnp.tanh(Linear(self.config.hidden_size, name="dense")(x[:, 0]))
