"""Opt-in attention-probability dropout (VERDICT r3 #8).

Attention-probs dropout is OFF by default (torch BERT defaults 0.1 —
reference ``src/mmbt.py:86-234``; documented deviation, DEVIATIONS.md).
``attention_probs_dropout_prob > 0`` (train.py --attention_probs_dropout)
is the exact-parity training mode; since round 5 it stays on the Pallas
kernel path with the keep-mask fused into the kernels (the kernel==XLA
parity under dropout is pinned below). These tests pin the mode's
contract: rate=0 is bit-identical to the kernel path,
rate>0 perturbs TRAIN mode only, and eval is identical regardless of the
setting.
"""
import jax
import jax.numpy as jnp
import numpy as np

from multimodal_uncertainty_tpu.ops.attention import (
    attention_heads_last,
    attention_probs_dropout,
)

B, S, D, H = 2, 12, 32, 2


def _qkv(seed=0):
    rng = np.random.default_rng(seed)
    return tuple(
        jnp.asarray(rng.normal(size=(B, S, D)).astype(np.float32))
        for _ in range(3)
    )


def test_rate_zero_matches_xla_attention_exactly():
    q, k, v = _qkv()
    mask = jnp.asarray(np.random.default_rng(1).random((B, S)) > 0.3)
    mask = mask.at[:, 0].set(True)
    ref = attention_heads_last(q, k, v, mask, n_head=H, impl="xla")
    got = attention_probs_dropout(q, k, v, mask, n_head=H, rate=0.0)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_rate_positive_perturbs_and_needs_rng():
    import pytest

    q, k, v = _qkv()
    ref = attention_heads_last(q, k, v, n_head=H, impl="xla")
    out1 = attention_probs_dropout(
        q, k, v, n_head=H, rate=0.3, rng=jax.random.key(0)
    )
    out2 = attention_probs_dropout(
        q, k, v, n_head=H, rate=0.3, rng=jax.random.key(1)
    )
    assert np.abs(np.asarray(out1) - np.asarray(ref)).max() > 1e-3
    assert np.abs(np.asarray(out1) - np.asarray(out2)).max() > 1e-3
    # unbiased in expectation: mean over many keys converges to the
    # undropped output (dropout scales kept probs by 1/(1-rate))
    outs = [
        np.asarray(attention_probs_dropout(
            q, k, v, n_head=H, rate=0.3, rng=jax.random.key(7 + i)
        ))
        for i in range(400)
    ]
    np.testing.assert_allclose(np.mean(outs, 0), np.asarray(ref), atol=0.1)
    with pytest.raises(ValueError, match="needs rng"):
        attention_probs_dropout(q, k, v, n_head=H, rate=0.3)


def _bert_encoder(p):
    import dataclasses

    from multimodal_uncertainty_tpu.models.bert import BertConfig, BertEncoder

    cfg = dataclasses.replace(
        BertConfig.base(), vocab_size=50, hidden_size=D,
        num_hidden_layers=2, num_attention_heads=H, intermediate_size=64,
        max_position_embeddings=S, attention_probs_dropout_prob=p,
        hidden_dropout_prob=0.0,  # isolate the attention-probs dropout
    )
    return BertEncoder(cfg, attn_impl="xla")


def test_bert_parity_mode_train_only():
    """p>0 changes TRAIN forwards only; eval is bit-identical to p=0 (the
    kernel path stays eval-eligible)."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(B, S, D)).astype(np.float32))
    mask = jnp.ones((B, S), bool)

    enc0, enc1 = _bert_encoder(0.0), _bert_encoder(0.1)
    variables = enc0.init(
        {"params": jax.random.key(0)}, x, mask, train=False
    )

    ev0 = enc0.apply(variables, x, mask, train=False)
    ev1 = enc1.apply(variables, x, mask, train=False)
    np.testing.assert_array_equal(np.asarray(ev0), np.asarray(ev1))

    tr0 = enc0.apply(
        variables, x, mask, train=True, rngs={"dropout": jax.random.key(3)}
    )
    # hidden dropout is 0 here, so the p=0 train forward == eval forward
    np.testing.assert_array_equal(np.asarray(tr0), np.asarray(ev0))
    tr1 = enc1.apply(
        variables, x, mask, train=True, rngs={"dropout": jax.random.key(3)}
    )
    assert np.abs(np.asarray(tr1) - np.asarray(tr0)).max() > 1e-4


def test_vilt_parity_mode_train_only():
    import dataclasses

    from multimodal_uncertainty_tpu.models.vilt import ViTBlock, ViltConfig

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(B, S, D)).astype(np.float32))
    mask = jnp.ones((B, S), bool)
    cfg0 = dataclasses.replace(
        ViltConfig.b32(), hidden_size=D, num_attention_heads=H,
        intermediate_size=64, dropout=0.0,
    )
    cfg1 = dataclasses.replace(cfg0, attention_probs_dropout_prob=0.1)
    blk0, blk1 = ViTBlock(cfg0, "xla"), ViTBlock(cfg1, "xla")
    variables = blk0.init({"params": jax.random.key(0)}, x, mask, train=False)

    np.testing.assert_array_equal(
        np.asarray(blk0.apply(variables, x, mask, train=False)),
        np.asarray(blk1.apply(variables, x, mask, train=False)),
    )
    tr0 = blk0.apply(variables, x, mask, train=True,
                     rngs={"dropout": jax.random.key(5)})
    tr1 = blk1.apply(variables, x, mask, train=True,
                     rngs={"dropout": jax.random.key(5)})
    assert np.abs(np.asarray(tr1) - np.asarray(tr0)).max() > 1e-4


def test_kernel_dropout_matches_xla_path_same_key():
    """attention_heads_last_dropout (fused keep-mask kernel, VERDICT r4 #9)
    draws the SAME bernoulli mask as attention_probs_dropout from the same
    key, so outputs and all three input grads match the XLA path to fp32
    accumulation order — for both kernel families (one-head-per-block and
    lane-masked sub-heads)."""
    from multimodal_uncertainty_tpu.ops.attention import (
        attention_heads_last_dropout,
    )

    rng = np.random.default_rng(0)
    for d, h in ((128, 2), (256, 2)):  # Dh=64 (sub-head), Dh=128 (full)
        q, k, v = (
            jnp.asarray(rng.normal(size=(B, 16, d)).astype(np.float32))
            for _ in range(3)
        )
        mask = jnp.asarray(rng.random((B, 16)) > 0.25).at[:, 0].set(True)
        key = jax.random.key(3)
        kw = dict(n_head=h, rate=0.1, rng=key)
        ref = attention_probs_dropout(q, k, v, mask, **kw)
        got = attention_heads_last_dropout(
            q, k, v, mask, impl="pallas_interpret", **kw
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=3e-6)
        for i, arg in enumerate((q, k, v)):
            def loss(a, fn, extra):
                args = [q, k, v]
                args[i] = a
                return jnp.sum(fn(*args, mask, **kw, **extra) ** 2)

            g_ref = jax.grad(lambda a: loss(
                a, attention_probs_dropout, {}))(arg)
            g_ker = jax.grad(lambda a: loss(
                a, attention_heads_last_dropout,
                {"impl": "pallas_interpret"}))(arg)
            np.testing.assert_allclose(
                np.asarray(g_ker), np.asarray(g_ref),
                atol=1e-5 * max(1.0, float(jnp.abs(g_ref).max())),
            )


def test_kernel_dropout_rate_zero_is_plain_kernel():
    from multimodal_uncertainty_tpu.ops.attention import (
        attention_heads_last_dropout,
    )

    q, k, v = _qkv()
    out = attention_heads_last_dropout(
        q, k, v, n_head=H, rate=0.0, rng=jax.random.key(0),
        impl="pallas_interpret",
    )
    ref = attention_heads_last(q, k, v, n_head=H, impl="pallas_interpret")
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_kernel_dropout_falls_back_for_unservable_shapes():
    """Head dims with no Mosaic-blockable layout (Dh=48) must silently take
    the XLA path and still equal it bit-for-bit (same key, same fn)."""
    from multimodal_uncertainty_tpu.ops.attention import (
        attention_heads_last_dropout,
    )

    rng = np.random.default_rng(2)
    q, k, v = (
        jnp.asarray(rng.normal(size=(B, 8, 96)).astype(np.float32))
        for _ in range(3)
    )
    key = jax.random.key(9)
    got = attention_heads_last_dropout(
        q, k, v, n_head=2, rate=0.2, rng=key, impl="pallas_interpret"
    )
    ref = attention_probs_dropout(q, k, v, n_head=2, rate=0.2, rng=key)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
