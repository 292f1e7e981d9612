"""MMBT: supervised multimodal bitransformer (BERT + ResNet-152).

Re-design of the reference ``src/mmbt.py`` (Facebook MMBT port): a ResNet-152
image encoder produces N image embeddings that are projected into BERT's
embedding space, wrapped with [CLS]/[SEP] word embeddings + position +
token-type embeddings (sharing BERT's tables), concatenated with the text
embeddings and run through the BERT encoder + tanh pooler + linear head.

The four reference forwards (full / ``forward_img_only`` /
``forward_txt_only`` / ``forward_control``) are all ONE masked forward here:
a boolean keep-mask over the concatenated sequence reproduces each variant
exactly (the reference's additive -10000 mask and physical index slicing are
both numerically identical to our boolean masking; the pooler reads the CLS
token which every variant keeps). The robustness sweep vmaps over variant
masks instead of looping 43 sequential forwards.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from multimodal_uncertainty_tpu.models.bert import (
    BertConfig,
    BertEncoder,
    BertPooler,
)
from multimodal_uncertainty_tpu.models.layers import Linear
from multimodal_uncertainty_tpu.models.resnet_tv import ImageEncoder
from multimodal_uncertainty_tpu.ops.losses import plain_cross_entropy
from multimodal_uncertainty_tpu.ops.norms import layer_norm


class ImageBertEmbeddings(nn.Module):
    """Project image features to hidden size, wrap with [CLS]/[SEP] word
    embeddings + position + token-type embeddings (reference
    ``src/mmbt.py:47-83``). Embedding tables are passed in from the shared
    BERT embedding params."""

    config: BertConfig
    img_hidden_sz: int = 2048
    dropout: float = 0.1

    @nn.compact
    def __call__(self, input_imgs, token_type_ids, word_emb, pos_emb, tok_emb,
                 ln_weight, ln_bias, *, cls_id: int, sep_id: int, train: bool):
        bsz, n, _ = input_imgs.shape
        seq_length = n + 2

        imgs_emb = Linear(self.config.hidden_size, name="img_embeddings")(input_imgs)
        cls_tok = jnp.broadcast_to(
            word_emb[cls_id][None, None, :], (bsz, 1, self.config.hidden_size)
        )
        sep_tok = jnp.broadcast_to(
            word_emb[sep_id][None, None, :], (bsz, 1, self.config.hidden_size)
        )
        token_embeddings = jnp.concatenate([cls_tok, imgs_emb, sep_tok], axis=1)
        position_ids = jnp.arange(seq_length)[None, :]
        x = token_embeddings + pos_emb[position_ids] + tok_emb[token_type_ids]
        # LayerNorm params are SHARED with the text embeddings (the reference
        # shares the module itself, src/mmbt.py:55).
        x = layer_norm(x, ln_weight, ln_bias, self.config.layer_norm_eps)
        return nn.Dropout(self.dropout, deterministic=not train)(x)


class _EmbedTables(nn.Module):
    """Holds the three shared BERT embedding tables."""

    config: BertConfig

    @nn.compact
    def __call__(self):
        c = self.config
        init = nn.initializers.normal(stddev=0.02)
        word = self.param("word_embeddings", init, (c.vocab_size, c.hidden_size))
        pos = self.param(
            "position_embeddings", init, (c.max_position_embeddings, c.hidden_size)
        )
        tok = self.param(
            "token_type_embeddings", init, (c.type_vocab_size, c.hidden_size)
        )
        ln_w = self.param("ln_weight", nn.initializers.ones, (c.hidden_size,))
        ln_b = self.param("ln_bias", nn.initializers.zeros, (c.hidden_size,))
        return word, pos, tok, ln_w, ln_b


class MultimodalBertEncoder(nn.Module):
    """Reference ``src/mmbt.py:86-234`` with mask-based variants."""

    config: BertConfig
    num_image_embeds: int = 3
    img_hidden_sz: int = 2048
    img_embed_pool_type: str = "avg"
    dropout: float = 0.1
    cls_token_id: int = 101  # bert-base-uncased [CLS]
    sep_token_id: int = 102  # bert-base-uncased [SEP]
    resnet_layers: tuple = (3, 8, 36, 3)
    attn_impl: str = "auto"
    dtype: any = None  # compute dtype (bf16 for speed; params stay fp32)
    remat: bool = False  # rematerialize ResNet blocks + BERT layers
    # --pipeline_parallel hook: a callable (encoder_input, full_mask) ->
    # encoded that replaces the in-module BertEncoder execution (the
    # override reads the SAME encoder/layer_i leaves from the live params,
    # see parallel/pipeline.py::masked_pipeline_encoder). None = inline.
    encoder_override: any = None

    @nn.compact
    def __call__(
        self,
        input_txt,
        attention_mask,
        segment,
        input_img,
        *,
        train: bool,
        seq_keep_mask: Optional[jax.Array] = None,
    ):
        c = self.config
        bsz = input_txt.shape[0]
        n_img_tok = self.num_image_embeds + 2

        # Shared BERT embedding tables + LayerNorm, declared under the
        # txt_embeddings scope (parity with the reference, where the image
        # wrapper borrows bert.embeddings tables AND its LN, src/mmbt.py:47-56).
        word_emb, pos_emb, tok_emb, ln_w, ln_b = _EmbedTables(
            c, name="txt_embeddings"
        )()

        img = ImageEncoder(
            self.num_image_embeds,
            self.img_embed_pool_type,
            self.resnet_layers,
            dtype=self.dtype,
            remat=self.remat,
            name="img_encoder",
        )(input_img, train=train)

        # text embeddings (reference txt_embeddings(input_txt, segment))
        position_ids = jnp.arange(input_txt.shape[1])[None, :]
        txt_x = word_emb[input_txt] + pos_emb[position_ids] + tok_emb[segment]
        txt_x = layer_norm(txt_x, ln_w, ln_b, c.layer_norm_eps)
        if self.dtype is not None:
            txt_x = txt_x.astype(self.dtype)
        txt_embed_out = nn.Dropout(
            c.hidden_dropout_prob, deterministic=not train
        )(txt_x)

        img_tok_type = jnp.zeros((bsz, n_img_tok), jnp.int32)
        img_embed_out = ImageBertEmbeddings(
            c, self.img_hidden_sz, self.dropout, name="img_embeddings"
        )(
            img,
            img_tok_type,
            word_emb,
            pos_emb,
            tok_emb,
            ln_w,
            ln_b,
            cls_id=self.cls_token_id,
            sep_id=self.sep_token_id,
            train=train,
        )

        if self.dtype is not None:
            img_embed_out = img_embed_out.astype(self.dtype)
        encoder_input = jnp.concatenate([img_embed_out, txt_embed_out], axis=1)
        full_mask = jnp.concatenate(
            [jnp.ones((bsz, n_img_tok), jnp.int32), attention_mask.astype(jnp.int32)],
            axis=1,
        ).astype(bool)
        if seq_keep_mask is not None:
            full_mask = full_mask & seq_keep_mask
        if self.encoder_override is not None:
            encoded = self.encoder_override(encoder_input, full_mask)
        else:
            encoded = BertEncoder(c, self.attn_impl, remat=self.remat,
                                  name="encoder")(
                encoder_input, full_mask, train=train
            )
        return BertPooler(c, name="pooler")(encoded)

    # ---- variant keep-masks (host-free, jit-compatible) ------------------

    def img_only_mask(self, bsz: int, txt_len: int) -> jax.Array:
        n = self.num_image_embeds + 2
        return jnp.concatenate(
            [jnp.ones((bsz, n), bool), jnp.zeros((bsz, txt_len), bool)], axis=1
        )

    def txt_only_mask(self, bsz: int, txt_len: int) -> jax.Array:
        n = self.num_image_embeds + 2
        img_part = jnp.concatenate(
            [jnp.ones((bsz, 1), bool), jnp.zeros((bsz, n - 1), bool)], axis=1
        )  # keep CLS only (reference :178 keeps img_embed_out[:, :1])
        return jnp.concatenate([img_part, jnp.ones((bsz, txt_len), bool)], axis=1)


class MultimodalBertClf(nn.Module):
    """Reference ``src/mmbt.py:237-262``: encoder -> Linear(hidden, C)."""

    config: BertConfig = BertConfig.base()
    n_classes: int = 101
    num_image_embeds: int = 3
    img_hidden_sz: int = 2048
    img_embed_pool_type: str = "avg"
    dropout: float = 0.1
    resnet_layers: tuple = (3, 8, 36, 3)
    attn_impl: str = "auto"
    dtype: any = None
    remat: bool = False
    encoder_override: any = None  # see MultimodalBertEncoder

    @nn.compact
    def __call__(self, x, *, train: bool = False, seq_keep_mask=None):
        txt, mask, segment, img = x
        pooled = MultimodalBertEncoder(
            self.config,
            self.num_image_embeds,
            self.img_hidden_sz,
            self.img_embed_pool_type,
            self.dropout,
            resnet_layers=self.resnet_layers,
            attn_impl=self.attn_impl,
            dtype=self.dtype,
            remat=self.remat,
            encoder_override=self.encoder_override,
            name="enc",
        )(txt, mask, segment, img, train=train, seq_keep_mask=seq_keep_mask)
        return Linear(self.n_classes, name="clf")(pooled)

    @staticmethod
    def compute_loss(y_hat, y, *, eval: bool = False):
        return plain_cross_entropy(y_hat, y, eval=eval)


def mmbt_grad_mask_fn(grads, flags):
    """Zero grads of the image encoder / BERT encoder while frozen
    (reference ``src/framework.py:280-285``: ``enc.img_encoder`` and
    ``enc.encoder``). flags: bool[2] = (freeze_img, freeze_txt), traced."""
    freeze_img, freeze_txt = flags[0], flags[1]

    def mask_subtree(tree, flag):
        return jax.tree_util.tree_map(
            lambda g: g * (1.0 - flag.astype(g.dtype)), tree
        )

    new_enc = dict(grads["enc"])
    new_enc["img_encoder"] = mask_subtree(grads["enc"]["img_encoder"], freeze_img)
    new_enc["encoder"] = mask_subtree(grads["enc"]["encoder"], freeze_txt)
    return {**grads, "enc": new_enc}
