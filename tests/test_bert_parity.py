"""Numerics parity: our flax BERT vs HuggingFace torch BertModel.

Instantiates a small random HF BertModel (no network), converts its state
dict with models/torch_import.py, and checks last_hidden_state + pooled
output match — validating both the encoder math (post-LN blocks, erf GELU,
masked attention) and the weight converter used for pretrained import.
"""
import jax
import jax.numpy as jnp
import numpy as np
import torch
from flax import linen as nn

from multimodal_uncertainty_tpu.models.bert import (
    BertConfig,
    BertEmbeddings,
    BertEncoder,
    BertPooler,
)
from multimodal_uncertainty_tpu.models.torch_import import (
    convert_bert_embeddings,
    convert_bert_encoder,
    convert_bert_pooler,
)


class FlaxBert(nn.Module):
    config: BertConfig

    @nn.compact
    def __call__(self, input_ids, attention_mask, token_type_ids, *, train=False):
        x = BertEmbeddings(self.config, name="embeddings")(
            input_ids, token_type_ids, train=train
        )
        x = BertEncoder(self.config, attn_impl="xla", name="encoder")(
            x, attention_mask.astype(bool), train=train
        )
        pooled = BertPooler(self.config, name="pooler")(x)
        return x, pooled


def test_bert_matches_huggingface():
    from transformers import BertConfig as HFConfig
    from transformers import BertModel

    hf_cfg = HFConfig(
        vocab_size=99,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=37,
        max_position_embeddings=64,
        type_vocab_size=2,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    hf = BertModel(hf_cfg)
    hf.eval()

    cfg = BertConfig(
        vocab_size=99,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=37,
        max_position_embeddings=64,
    )

    rng = np.random.default_rng(0)
    b, s = 3, 11
    ids = rng.integers(0, 99, size=(b, s))
    mask = np.ones((b, s), np.int64)
    mask[0, 7:] = 0
    mask[2, 4:] = 0
    toktype = rng.integers(0, 2, size=(b, s))

    with torch.no_grad():
        out = hf(
            input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(mask),
            token_type_ids=torch.tensor(toktype),
        )
    ref_hidden = out.last_hidden_state.numpy()
    ref_pooled = out.pooler_output.numpy()

    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    tables, ln = convert_bert_embeddings(sd)
    params = {
        "embeddings": {**tables, "LayerNorm": ln},
        "encoder": convert_bert_encoder(sd, 2),
        "pooler": convert_bert_pooler(sd),
    }

    model = FlaxBert(cfg)
    ours_hidden, ours_pooled = model.apply(
        {"params": params},
        jnp.asarray(ids),
        jnp.asarray(mask),
        jnp.asarray(toktype),
    )
    # padded positions diverge (HF computes them, they're meaningless) — only
    # compare valid positions
    valid = mask.astype(bool)
    np.testing.assert_allclose(
        np.asarray(ours_hidden)[valid], ref_hidden[valid], atol=2e-5
    )
    np.testing.assert_allclose(np.asarray(ours_pooled), ref_pooled, atol=2e-5)
