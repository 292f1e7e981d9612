"""ViLT model + zoo setup coverage (tiny configs, CPU)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_uncertainty_tpu.models.vilt import (
    ViltConfig,
    ViltForImagesAndTextClassification,
)
from multimodal_uncertainty_tpu.training.steps import build_eval_step, build_train_step
from multimodal_uncertainty_tpu.zoo import setup_mmbt, setup_vilt

TINY_VILT = dataclasses.replace(
    ViltConfig.b32(), vocab_size=120, hidden_size=32, num_hidden_layers=2,
    num_attention_heads=2, intermediate_size=64, image_size=64, num_labels=3,
)


def _vilt_batch(b=2, lt=10, size=64, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "input_ids": rng.integers(0, 120, size=(b, lt)),
        "attention_mask": np.ones((b, lt), np.int64),
        "token_type_ids": np.zeros((b, lt), np.int64),
        "pixel_values": rng.integers(0, 255, size=(b, size, size, 3)).astype(np.uint8),
        "pixel_mask": np.ones((b, size, size), np.int64),
    }


def test_vilt_forward_and_loss():
    model = ViltForImagesAndTextClassification(config=TINY_VILT, attn_impl="xla")
    batch = {k: jnp.asarray(v) for k, v in _vilt_batch().items()}
    batch["pixel_values"] = batch["pixel_values"].astype(jnp.float32) / 255.0
    batch["labels"] = jnp.asarray([0, 2])
    variables = model.init({"params": jax.random.key(0)}, batch, train=False)
    out = model.apply(variables, batch, train=False)
    assert out.logits.shape == (2, 3)
    assert np.isfinite(float(out.loss))


def test_vilt_pixel_mask_excludes_patches():
    model = ViltForImagesAndTextClassification(config=TINY_VILT, attn_impl="xla")
    batch = {k: jnp.asarray(v) for k, v in _vilt_batch().items()}
    batch["pixel_values"] = batch["pixel_values"].astype(jnp.float32) / 255.0
    variables = model.init({"params": jax.random.key(0)}, batch, train=False)
    # mask out the right half of the image; perturbing masked pixels must not
    # change the logits
    pm = np.ones((2, 64, 64), np.int64)
    pm[:, :, 32:] = 0
    batch["pixel_mask"] = jnp.asarray(pm)
    out1 = model.apply(variables, batch, train=False).logits
    pv = np.asarray(batch["pixel_values"]).copy()
    pv[:, :, 32:, :] = 9.0
    batch["pixel_values"] = jnp.asarray(pv)
    out2 = model.apply(variables, batch, train=False).logits
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-4)


def test_setup_vilt_train_eval_steps():
    setup = setup_vilt(
        n_classes=3, lr=1e-3, vilt_config=TINY_VILT,
        gradient_accumulation_steps=2, seed_key=jax.random.key(1),
        attn_impl="xla",
    )
    step = build_train_step(setup.bundle, setup.optimizer,
                            gradient_accumulation_steps=2, donate=False)
    x = _vilt_batch()
    y = np.asarray([1, 2])
    s1, logs1 = step(setup.state, {k: jnp.asarray(v) for k, v in x.items()},
                     jnp.asarray(y), jax.random.key(0), None)
    s2, logs2 = step(s1, {k: jnp.asarray(v) for k, v in x.items()},
                     jnp.asarray(y), jax.random.key(1), None)
    assert np.isfinite(float(logs2["loss"]))
    # grad accumulation: optimizer applied on step 2 only
    assert int(s1.opt_state["step"]) == 0 and int(s2.opt_state["step"]) == 1
    ev = build_eval_step(setup.bundle)
    logs, preds, labels = ev(s2, {k: jnp.asarray(v) for k, v in x.items()},
                             jnp.asarray(y))
    assert preds.shape == (2, 3)


def test_setup_mmbt_freeze_then_unfreeze_updates():
    from multimodal_uncertainty_tpu.models.bert import BertConfig

    cfg = BertConfig(vocab_size=150, hidden_size=32, num_hidden_layers=1,
                     num_attention_heads=2, intermediate_size=64,
                     max_position_embeddings=64)
    setup = setup_mmbt(
        n_classes=4, lr=1e-3, warmup=0.0, total_steps=100.0,
        bert_config=cfg, resnet_layers=(1, 1, 1, 1),
        gradient_accumulation_steps=1, image_size=64, sample_txt_len=8,
        seed_key=jax.random.key(2), attn_impl="xla",
    )
    step = build_train_step(setup.bundle, setup.optimizer, donate=False)
    rng = np.random.default_rng(0)
    x = (
        jnp.asarray(rng.integers(0, 150, size=(2, 8))),
        jnp.ones((2, 8), jnp.int32),
        jnp.ones((2, 8), jnp.int32),
        jnp.asarray(rng.integers(0, 255, size=(2, 64, 64, 3)).astype(np.uint8)),
    )
    y = jnp.asarray([0, 3])
    frozen = jnp.asarray([True, True])
    s1, _ = step(setup.state, x, y, jax.random.key(0), frozen)
    img0 = jax.tree_util.tree_leaves(setup.state.params["enc"]["img_encoder"])[0]
    img1 = jax.tree_util.tree_leaves(s1.params["enc"]["img_encoder"])[0]
    np.testing.assert_array_equal(np.asarray(img0), np.asarray(img1))
    clf0 = jax.tree_util.tree_leaves(setup.state.params["clf"])[0]
    clf1 = jax.tree_util.tree_leaves(s1.params["clf"])[0]
    assert float(jnp.abs(clf1 - clf0).max()) > 0

    unfrozen = jnp.asarray([False, False])
    s2, _ = step(s1, x, y, jax.random.key(1), unfrozen)
    img2 = jax.tree_util.tree_leaves(s2.params["enc"]["img_encoder"])[0]
    assert float(jnp.abs(img2 - img1).max()) > 0
