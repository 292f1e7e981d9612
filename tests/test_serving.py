"""Serving predictor tests."""
import os

import jax
import numpy as np

from multimodal_uncertainty_tpu.models import FlavaFusionTransformer
from multimodal_uncertainty_tpu.serving import FusionPredictor
from multimodal_uncertainty_tpu.training.checkpoint import save_weights

D = 32


def _make_ckpt(tmp_path):
    model = FlavaFusionTransformer(
        out_dim=2, num_classes=3, image_hidden_size=D, text_hidden_size=D,
        multimodal_hidden_size=D, multimodal_num_attention_heads=2,
        multimodal_num_hidden_layers=1, attn_impl="xla",
    )
    rng = np.random.default_rng(0)
    img = rng.normal(size=(2, 5, D)).astype(np.float32)
    txt = rng.normal(size=(2, 4, D)).astype(np.float32)
    variables = model.init({"params": jax.random.key(0)}, (img, txt), train=False)
    path = os.path.join(tmp_path, "model_best_val.pt")
    save_weights(variables, None, path)
    return model, variables, path


def test_predict_shapes_and_normalization(tmp_path):
    model, variables, ckpt = _make_ckpt(tmp_path)
    pred = FusionPredictor(
        model, ckpt, template_variables=variables, pad_multiple=8,
        batch_buckets=(4, 16),
    )
    rng = np.random.default_rng(1)
    img = rng.normal(size=(3, 5, D)).astype(np.float32)
    txt = rng.normal(size=(3, 4, D)).astype(np.float32)
    probs = pred.predict(img, txt)
    assert probs.shape == (3, 3)
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-5)


def test_padding_and_buckets_do_not_change_results(tmp_path):
    model, variables, ckpt = _make_ckpt(tmp_path)
    pred = FusionPredictor(
        model, ckpt, template_variables=variables, pad_multiple=8,
        batch_buckets=(4, 16),
    )
    rng = np.random.default_rng(2)
    img = rng.normal(size=(2, 5, D)).astype(np.float32)
    txt = rng.normal(size=(2, 4, D)).astype(np.float32)
    p_small = pred.predict(img, txt)
    # same rows inside a bigger (differently padded) batch
    img6 = np.concatenate([img, rng.normal(size=(4, 5, D)).astype(np.float32)])
    txt6 = np.concatenate([txt, rng.normal(size=(4, 4, D)).astype(np.float32)])
    p_big = pred.predict(img6, txt6)
    np.testing.assert_allclose(p_small, p_big[:2], atol=1e-4)


def test_uncertainty_diagnostics(tmp_path):
    model, variables, ckpt = _make_ckpt(tmp_path)
    pred = FusionPredictor(
        model, ckpt, template_variables=variables, pad_multiple=8,
        batch_buckets=(4,),
    )
    rng = np.random.default_rng(3)
    img = rng.normal(size=(2, 5, D)).astype(np.float32)
    txt = rng.normal(size=(2, 4, D)).astype(np.float32)
    probs, diag = pred.predict_with_uncertainty(img, txt)
    assert set(diag) == {"confidence", "image_sensitivity", "text_sensitivity"}
    assert (diag["confidence"] >= 1 / 3 - 1e-6).all()
    assert (diag["image_sensitivity"] >= 0).all()


def _make_mmbt_ckpt(tmp_path):
    import jax.numpy as jnp

    from multimodal_uncertainty_tpu.models.bert import BertConfig
    from multimodal_uncertainty_tpu.models.mmbt import MultimodalBertClf

    cfg = BertConfig(vocab_size=120, hidden_size=32, num_hidden_layers=1,
                     num_attention_heads=2, intermediate_size=64,
                     max_position_embeddings=64)
    model = MultimodalBertClf(config=cfg, n_classes=4, num_image_embeds=3,
                              resnet_layers=(1, 1, 1, 1), attn_impl="xla")
    rng = np.random.default_rng(0)
    b, lt = 2, 6
    x = (jnp.asarray(rng.integers(0, 120, size=(b, lt))),
         jnp.ones((b, lt), jnp.int32), jnp.ones((b, lt), jnp.int32),
         jnp.asarray(rng.normal(size=(b, 64, 64, 3)).astype(np.float32)))
    variables = model.init({"params": jax.random.key(0)}, x, train=False)
    path = os.path.join(tmp_path, "mmbt_best_val.pt")
    save_weights(variables, None, path)
    return model, variables, path


def test_mmbt_predictor_probs_and_ablations(tmp_path):
    from multimodal_uncertainty_tpu.serving import MMBTPredictor

    model, variables, ckpt = _make_mmbt_ckpt(tmp_path)
    pred = MMBTPredictor(model, ckpt, template_variables=variables,
                         batch_buckets=(4,))
    rng = np.random.default_rng(1)
    n, lt = 3, 6
    txt = rng.integers(0, 120, size=(n, lt)).astype(np.int32)
    mask = np.ones((n, lt), np.int32)
    seg = np.ones((n, lt), np.int32)
    img = rng.normal(size=(n, 64, 64, 3)).astype(np.float32)

    probs = pred.predict(txt, mask, seg, img)
    assert probs.shape == (n, 4)
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-5)

    # ablations must equal the model's masked forward directly
    import jax.numpy as jnp

    from multimodal_uncertainty_tpu.models.mmbt import MultimodalBertEncoder

    helper = MultimodalBertEncoder(model.config, 3)
    direct = model.apply(
        variables, tuple(map(jnp.asarray, (txt, mask, seg, img))),
        train=False, seq_keep_mask=helper.txt_only_mask(n, lt),
    )
    direct = np.asarray(jax.nn.softmax(direct, axis=-1))
    np.testing.assert_allclose(
        pred.predict(txt, mask, seg, img, ablate="image"), direct, atol=1e-5
    )

    full, diag = pred.predict_with_uncertainty(txt, mask, seg, img)
    assert set(diag) == {"confidence", "image_sensitivity", "text_sensitivity"}
    assert (diag["image_sensitivity"] >= 0).all()


def test_vilt_predictor_probs_and_ablations(tmp_path):
    import dataclasses

    import jax.numpy as jnp

    from multimodal_uncertainty_tpu.models.vilt import (
        ViltConfig,
        ViltForImagesAndTextClassification,
    )
    from multimodal_uncertainty_tpu.serving import ViltPredictor

    cfg = dataclasses.replace(
        ViltConfig.b32(), vocab_size=120, hidden_size=32, num_hidden_layers=1,
        num_attention_heads=2, intermediate_size=64, image_size=64,
        num_labels=3,
    )
    model = ViltForImagesAndTextClassification(config=cfg, attn_impl="xla")
    rng = np.random.default_rng(0)
    n, lt = 3, 7
    batch = {
        "input_ids": rng.integers(0, 120, size=(n, lt)).astype(np.int64),
        "attention_mask": np.ones((n, lt), np.int64),
        "token_type_ids": np.zeros((n, lt), np.int64),
        "pixel_values": rng.normal(size=(n, 64, 64, 3)).astype(np.float32),
    }
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    variables = model.init({"params": jax.random.key(0)}, jb, train=False)
    ckpt = os.path.join(tmp_path, "vilt_best.pt")
    save_weights(variables, None, ckpt)

    pred = ViltPredictor(model, ckpt, template_variables=variables,
                         batch_buckets=(4,))
    probs = pred.predict(batch)
    assert probs.shape == (n, 3)
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-5)

    full, diag = pred.predict_with_uncertainty(batch)
    assert (diag["confidence"] >= 1 / 3 - 1e-6).all()
    # ablations actually change predictions
    assert diag["image_sensitivity"].max() > 0
    assert diag["text_sensitivity"].max() > 0
