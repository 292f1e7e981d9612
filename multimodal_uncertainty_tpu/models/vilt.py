"""ViLT-family model: single-stream patch-embedding fusion classifier.

The reference uses HF torch ``ViltForImagesAndTextClassification``
(``train.py:166-169``; trained/evaled via special cases at
``src/framework.py:163-168,263-272``). HF ships no flax ViLT, so —
per the documented plan (SURVEY.md §7) — this is a native TPU
implementation of the same *family*: text tokens (BERT-style embeddings) and
32x32 image patches (conv stride 32) share one pre-LN ViT encoder with
modality-type embeddings; a first-token tanh pooler feeds the HF-style
2-layer classification head. Like HF's model it computes loss+logits
internally from ``labels``.

The compute graph matches HF exactly for the full-pixel-mask single-image
case (the reference's configuration): BERT-style text embeddings with their
LayerNorm, a separate modality-type table (text=0, image=1), ViT pre-LN
blocks with eps 1e-12, final LayerNorm, first-token tanh pooler, and the
Linear->LayerNorm->GELU->Linear classifier head sized hidden*num_images.
Pretrained ``dandelin/vilt-b32-*`` weights import via
:func:`models.torch_import.import_vilt_pretrained`.

Documented deviation from HF ViLT: fixed patch grid (no pixel_mask-driven
token resampling / bilinear position interpolation — pixel_mask instead
becomes a boolean patch keep-mask). With a full pixel_mask (all real
pixels, the single-image reference path) HF's resampling is the identity
and the two models agree numerically.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from multimodal_uncertainty_tpu.models.layers import LayerNormFP32, Linear
from multimodal_uncertainty_tpu.ops.attention import (
    attention_probs_dropout,
    attention_qkv_packed,
)
from multimodal_uncertainty_tpu.ops.losses import softmax_cross_entropy


@dataclasses.dataclass(frozen=True)
class ViltConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 40
    type_vocab_size: int = 2
    image_size: int = 384
    patch_size: int = 32
    num_labels: int = 2
    num_images: int = 1
    dropout: float = 0.0
    # >0 = opt-in reference-exact parity training (HF ViLT trains with
    # attention-prob dropout); 0 keeps attention one fused kernel
    attention_probs_dropout_prob: float = 0.0
    layer_norm_eps: float = 1e-12
    dtype: str = "float32"  # "bfloat16" for speed (params stay fp32)

    @staticmethod
    def b32() -> "ViltConfig":
        return ViltConfig()


@dataclasses.dataclass
class ViltOutput:
    loss: Optional[jax.Array]
    logits: jax.Array


class ViTBlock(nn.Module):
    config: ViltConfig
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, x, key_mask, *, train: bool):
        c = self.config
        b, s, d = x.shape
        h = c.num_attention_heads
        y = LayerNormFP32(eps=c.layer_norm_eps, name="ln_1")(x)
        qkv = Linear(3 * d, name="qkv")(y)
        p = c.attention_probs_dropout_prob
        if train and p > 0.0:
            # opt-in parity training mode (see models/bert.py): dropout on
            # the attention probabilities, fused into the heads-last
            # kernel since round 5 (XLA fallback inside)
            from multimodal_uncertainty_tpu.ops.attention import (
                attention_heads_last_dropout,
            )

            q_, k_, v_ = jnp.split(qkv, 3, axis=-1)
            attn = attention_heads_last_dropout(
                q_, k_, v_, key_mask, n_head=h, rate=p,
                rng=self.make_rng("dropout"), impl=self.attn_impl,
            )
        else:
            # heads stay packed; q/k/v split + head split inside the kernel
            attn = attention_qkv_packed(
                qkv, key_mask, n_head=h, impl=self.attn_impl
            )
        x = x + Linear(d, name="proj")(attn)
        y = LayerNormFP32(eps=c.layer_norm_eps, name="ln_2")(x)
        y = Linear(c.intermediate_size, name="fc1")(y)
        y = jax.nn.gelu(y, approximate=False)
        y = nn.Dropout(c.dropout, deterministic=not train)(y)
        y = Linear(d, name="fc2")(y)
        return x + y


class ViltModel(nn.Module):
    config: ViltConfig
    attn_impl: str = "auto"

    @nn.compact
    def __call__(
        self,
        input_ids,
        attention_mask,
        token_type_ids,
        pixel_values,
        pixel_mask=None,
        *,
        train: bool = False,
    ):
        c = self.config
        b, lt = input_ids.shape
        init = nn.initializers.normal(stddev=0.02)

        # ---- text embeddings (BERT-style, incl. their LayerNorm: HF
        # TextEmbeddings = word+pos+type -> LN -> dropout) -------------------
        word = self.param("word_embeddings", init, (c.vocab_size, c.hidden_size))
        pos = self.param(
            "position_embeddings", init, (c.max_position_embeddings, c.hidden_size)
        )
        tok = self.param(
            "token_type_embeddings", init, (c.type_vocab_size, c.hidden_size)
        )
        txt = word[input_ids] + pos[jnp.arange(lt)[None]] + tok[token_type_ids]
        txt = LayerNormFP32(eps=c.layer_norm_eps, name="emb_LayerNorm")(txt)
        txt = nn.Dropout(c.dropout, deterministic=not train)(txt)

        # ---- image patch embeddings ---------------------------------------
        # pixel_values arrives NCHW (HF convention) or NHWC; normalize to NHWC
        if pixel_values.ndim == 5:  # (B, num_images=1, C, H, W)
            pixel_values = pixel_values[:, 0]
        if pixel_values.shape[1] == 3:
            pixel_values = jnp.transpose(pixel_values, (0, 2, 3, 1))
        patches = nn.Conv(
            c.hidden_size,
            (c.patch_size, c.patch_size),
            strides=(c.patch_size, c.patch_size),
            padding="VALID",
            name="patch_embed",
        )(pixel_values)
        gh, gw = patches.shape[1], patches.shape[2]
        # position table sized by the PRETRAINING grid (config image_size),
        # exactly like HF — other input sizes interpolate below, so one
        # imported checkpoint serves any resolution
        g0 = c.image_size // c.patch_size
        img = patches.reshape(b, gh * gw, c.hidden_size)
        img_pos = self.param(
            "image_position_embeddings",
            init,
            (g0 * g0 + 1, c.hidden_size),
        )
        img_cls = self.param("image_cls", init, (1, 1, c.hidden_size))

        # patch keep-mask + per-sample effective grid from pixel_mask.
        # HF assumes a top-left-anchored rectangular valid region (its
        # x_h/x_w are the mask's first column/row sums); same here. Patch
        # granularity: any live pixel keeps the patch (HF nearest-resamples
        # the mask — identical for patch-aligned rectangles).
        if pixel_mask is not None:
            if pixel_mask.ndim == 4:  # (B, 1, H, W)
                pixel_mask = pixel_mask[:, 0]
            pm = pixel_mask.reshape(b, gh, c.patch_size, gw, c.patch_size)
            patch_keep = pm.max(axis=(2, 4)).reshape(b, gh, gw) > 0
        else:
            patch_keep = jnp.ones((b, gh, gw), bool)

        if pixel_mask is None and (gh, gw) == (g0, g0):
            pos = jnp.broadcast_to(
                img_pos[None, 1:], (b, gh * gw, c.hidden_size)
            )
        else:
            # HF ViltEmbeddings.visual_embed parity: bilinearly interpolate
            # the g0 x g0 spatial positions to each sample's effective
            # (h_i, w_i) patch grid, align_corners=True. TPU-native form:
            # fixed (gh, gw) output with traced per-sample sample coords —
            # no dynamic shapes; positions past (h_i, w_i) are clamped
            # garbage under an attention mask (HF zero-pads them; masked
            # either way). Where HF then randomly SUBSAMPLES valid patches
            # past max_image_length, we keep the full masked set — exact,
            # never information-lossy (DEVIATIONS.md).
            grid_pos = img_pos[1:].reshape(g0, g0, c.hidden_size)
            h_i = patch_keep[:, :, 0].sum(axis=1).astype(jnp.float32)
            w_i = patch_keep[:, 0, :].sum(axis=1).astype(jnp.float32)

            def coords(n_out, eff):
                s = (jnp.arange(n_out, dtype=jnp.float32)[None]
                     * (g0 - 1) / jnp.maximum(eff[:, None] - 1.0, 1.0))
                s = jnp.clip(s, 0.0, g0 - 1.0)
                lo = jnp.floor(s).astype(jnp.int32)
                hi = jnp.minimum(lo + 1, g0 - 1)
                return lo, hi, s - lo

            r0, r1, fr = coords(gh, h_i)  # (b, gh)
            c0, c1, fc = coords(gw, w_i)  # (b, gw)

            def gat(r, cc):  # -> (b, gh, gw, D)
                return grid_pos[r[:, :, None], cc[:, None, :]]

            wr0, wr1 = (1.0 - fr)[..., None, None], fr[..., None, None]
            wc0, wc1 = (1.0 - fc)[:, None, :, None], fc[:, None, :, None]
            pos = (gat(r0, c0) * wr0 * wc0 + gat(r0, c1) * wr0 * wc1
                   + gat(r1, c0) * wr1 * wc0 + gat(r1, c1) * wr1 * wc1)
            pos = pos.reshape(b, gh * gw, c.hidden_size)

        img = img + pos
        img = jnp.concatenate(
            [jnp.broadcast_to(img_cls + img_pos[0], (b, 1, c.hidden_size)),
             img],
            axis=1,
        )
        img = nn.Dropout(c.dropout, deterministic=not train)(img)
        patch_keep = patch_keep.reshape(b, gh * gw)

        # ---- modality-type embeddings (HF ViltEmbeddings PART 3: a table
        # SEPARATE from the text token-type table; text=0, image=1) ----------
        modality = self.param(
            "modality_type_embeddings", init, (2, c.hidden_size)
        )
        txt = txt + modality[0][None, None]
        img = img + modality[1][None, None]

        x = jnp.concatenate([txt, img], axis=1)
        if c.dtype == "bfloat16":
            x = x.astype(jnp.bfloat16)
        mask = jnp.concatenate(
            [
                attention_mask.astype(bool),
                jnp.ones((b, 1), bool),  # image CLS
                patch_keep,
            ],
            axis=1,
        )

        # HF ViLT has no pre-LN on the embeddings; blocks are pre-LN and the
        # encoder output gets one final LayerNorm before the pooler.
        for i in range(c.num_hidden_layers):
            x = ViTBlock(c, self.attn_impl, name=f"block_{i}")(x, mask, train=train)
        x = LayerNormFP32(eps=c.layer_norm_eps, name="ln_post")(x)
        pooled = jnp.tanh(Linear(c.hidden_size, name="pooler")(x[:, 0]))
        return x, pooled


class ViltForImagesAndTextClassification(nn.Module):
    """HF-shaped interface: call with the processor batch dict; returns
    ViltOutput(loss, logits)."""

    config: ViltConfig
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, batch: dict, *, train: bool = False):
        c = self.config
        _, pooled = ViltModel(c, self.attn_impl, name="vilt")(
            batch["input_ids"],
            batch["attention_mask"],
            batch.get("token_type_ids", batch["input_ids"] * 0),
            batch["pixel_values"],
            batch.get("pixel_mask"),
            train=train,
        )
        # HF head: Linear(H*num_images -> H*num_images) -> LN -> GELU ->
        # Linear(-> num_labels); reference runs num_images=1 (train.py:166-169)
        h = Linear(c.hidden_size * c.num_images, name="cls_fc")(pooled)
        h = LayerNormFP32(eps=1e-5, name="cls_ln")(h)  # torch nn.LayerNorm default
        h = jax.nn.gelu(h, approximate=False)
        logits = Linear(c.num_labels, name="cls_out")(h)
        loss = None
        if "labels" in batch and batch["labels"] is not None:
            loss = softmax_cross_entropy(logits, batch["labels"].reshape(-1))
        return ViltOutput(loss=loss, logits=logits)
