"""MMBT model tests: shapes, masked-variant semantics, freeze masks."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_uncertainty_tpu.models.bert import BertConfig
from multimodal_uncertainty_tpu.models.mmbt import (
    MultimodalBertClf,
    mmbt_grad_mask_fn,
)

TINY = BertConfig(
    vocab_size=200,
    hidden_size=32,
    num_hidden_layers=2,
    num_attention_heads=2,
    intermediate_size=64,
    max_position_embeddings=64,
)


@pytest.fixture(scope="module")
def mmbt():
    model = MultimodalBertClf(
        config=TINY,
        n_classes=5,
        num_image_embeds=3,
        resnet_layers=(1, 1, 1, 1),
        attn_impl="xla",
    )
    rng = np.random.default_rng(0)
    b, lt = 2, 6
    txt = jnp.asarray(rng.integers(0, 200, size=(b, lt)))
    mask = jnp.asarray([[1, 1, 1, 1, 0, 0], [1, 1, 1, 1, 1, 1]])
    segment = jnp.ones((b, lt), jnp.int32)
    img = jnp.asarray(rng.normal(size=(b, 64, 64, 3)).astype(np.float32))
    variables = model.init(
        {"params": jax.random.key(0)}, (txt, mask, segment, img), train=False
    )
    return model, variables, (txt, mask, segment, img)


def test_forward_shape(mmbt):
    model, variables, x = mmbt
    out = model.apply(variables, x, train=False)
    assert out.shape == (2, 5)
    assert np.isfinite(np.asarray(out)).all()


def test_full_keep_mask_is_identity(mmbt):
    model, variables, x = mmbt
    b, lt = x[0].shape
    n = 3 + 2
    full = jnp.ones((b, n + lt), bool)
    out_masked = model.apply(variables, x, train=False, seq_keep_mask=full)
    out_plain = model.apply(variables, x, train=False)
    np.testing.assert_allclose(
        np.asarray(out_masked), np.asarray(out_plain), atol=1e-5
    )


def test_img_only_ignores_text(mmbt):
    model, variables, x = mmbt
    txt, mask, segment, img = x
    b, lt = txt.shape
    n = 3 + 2
    img_only = jnp.concatenate(
        [jnp.ones((b, n), bool), jnp.zeros((b, lt), bool)], axis=1
    )
    out1 = model.apply(variables, x, train=False, seq_keep_mask=img_only)
    txt2 = (txt + 7) % 200  # completely different text
    out2 = model.apply(
        variables, (txt2, mask, segment, img), train=False, seq_keep_mask=img_only
    )
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)


def test_txt_only_ignores_image(mmbt):
    model, variables, x = mmbt
    txt, mask, segment, img = x
    b, lt = txt.shape
    n = 3 + 2
    txt_only = jnp.concatenate(
        [
            jnp.ones((b, 1), bool),           # CLS kept (reference :178)
            jnp.zeros((b, n - 1), bool),
            jnp.ones((b, lt), bool),
        ],
        axis=1,
    )
    out1 = model.apply(variables, x, train=False, seq_keep_mask=txt_only)
    img2 = img * 0.0 + 0.3
    out2 = model.apply(
        variables, (txt, mask, segment, img2), train=False, seq_keep_mask=txt_only
    )
    # CLS embedding itself is image-independent (word embedding), so masked
    # txt-only output must not depend on the image at all.
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)


def test_grad_mask_fn_freezes_subtrees(mmbt):
    model, variables, x = mmbt
    y = jnp.asarray([1, 3])

    def loss(params):
        out = model.apply({"params": params, "batch_stats": variables["batch_stats"]},
                          x, train=False)
        return model.compute_loss(out, y)

    grads = jax.grad(loss)(variables["params"])
    flags = jnp.asarray([True, False])  # freeze_img only
    masked = mmbt_grad_mask_fn(grads, flags)
    img_leaves = jax.tree_util.tree_leaves(masked["enc"]["img_encoder"])
    assert all(float(jnp.abs(l).max()) == 0.0 for l in img_leaves)
    enc_leaves = jax.tree_util.tree_leaves(masked["enc"]["encoder"])
    assert any(float(jnp.abs(l).max()) > 0.0 for l in enc_leaves)
    clf_leaves = jax.tree_util.tree_leaves(masked["clf"])
    assert any(float(jnp.abs(l).max()) > 0.0 for l in clf_leaves)


def test_remat_identical_forward_and_grads():
    """remat=True must be a pure memory/FLOPs trade: same outputs, same
    gradients as remat=False."""
    rng = np.random.default_rng(4)
    b, lt = 2, 6
    x = (
        jnp.asarray(rng.integers(0, 200, size=(b, lt))),
        jnp.ones((b, lt), jnp.int32),
        jnp.ones((b, lt), jnp.int32),
        jnp.asarray(rng.normal(size=(b, 64, 64, 3)).astype(np.float32)),
    )
    y = jnp.asarray([1, 3])
    models = {
        r: MultimodalBertClf(
            config=TINY, n_classes=5, num_image_embeds=3,
            resnet_layers=(1, 1, 1, 1), attn_impl="xla", remat=r,
        )
        for r in (False, True)
    }
    variables = models[False].init({"params": jax.random.key(0)}, x, train=False)

    outs, grads = {}, {}
    for r, m in models.items():
        def loss_fn(params):
            logits, _ = m.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                x, train=True, rngs={"dropout": jax.random.key(1)},
                mutable=["batch_stats"],
            )
            return m.compute_loss(logits, y)

        outs[r], grads[r] = jax.value_and_grad(loss_fn)(variables["params"])

    assert abs(float(outs[True]) - float(outs[False])) < 1e-6
    for ga, gb in zip(jax.tree_util.tree_leaves(grads[True]),
                      jax.tree_util.tree_leaves(grads[False])):
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), atol=1e-5)
