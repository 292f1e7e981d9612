"""Numerics tests: losses, metrics, attention (XLA vs Pallas-interpret), norms."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from multimodal_uncertainty_tpu.ops.attention import (
    scaled_dot_product_attention,
    sdpa_xla,
)
from multimodal_uncertainty_tpu.ops.losses import mimo_cross_entropy, softmax_cross_entropy
from multimodal_uncertainty_tpu.ops.metrics import (
    accuracy,
    binary_auroc,
    expected_calibration_error,
)
from multimodal_uncertainty_tpu.ops.norms import layer_norm_pallas, layer_norm_xla


def test_softmax_ce_matches_torch():
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(16, 10)).astype(np.float32)
    labels = rng.integers(0, 10, size=(16,))
    ours = float(softmax_cross_entropy(jnp.asarray(logits), jnp.asarray(labels)))
    theirs = float(F.cross_entropy(torch.tensor(logits), torch.tensor(labels)))
    assert abs(ours - theirs) < 5e-5


def test_mimo_ce_train_eval_layouts():
    rng = np.random.default_rng(1)
    logits = rng.normal(size=(8, 4, 10)).astype(np.float32)
    y_train = rng.integers(0, 10, size=(8, 4))
    y_eval = rng.integers(0, 10, size=(8,))

    ours_train = float(mimo_cross_entropy(jnp.asarray(logits), jnp.asarray(y_train)))
    ref_train = float(
        F.cross_entropy(torch.tensor(logits).view(-1, 10), torch.tensor(y_train).view(-1))
    )
    assert abs(ours_train - ref_train) < 1e-5

    ours_eval = float(
        mimo_cross_entropy(jnp.asarray(logits), jnp.asarray(y_eval), eval=True)
    )
    ref_eval = float(
        F.cross_entropy(torch.tensor(logits).mean(1), torch.tensor(y_eval))
    )
    assert abs(ours_eval - ref_eval) < 1e-5


def test_accuracy_layouts():
    logits = jnp.asarray(
        [[[10.0, 0.0], [0.0, 10.0]], [[10.0, 0.0], [10.0, 0.0]]]
    )  # (2, 2, 2)
    y_train = jnp.asarray([[0, 1], [0, 0]])
    assert float(accuracy(logits, y_train, eval=False)) == 100.0
    y_eval = jnp.asarray([0, 0])
    assert float(accuracy(logits, y_eval, eval=True)) == 100.0
    assert float(accuracy(logits, jnp.asarray([1, 1]), eval=True)) == 0.0


def test_auroc_matches_sklearn():
    from sklearn.metrics import roc_auc_score

    rng = np.random.default_rng(2)
    for _ in range(5):
        labels = rng.integers(0, 2, size=200)
        scores = rng.normal(size=200) + labels * rng.uniform(0, 2)
        scores[::7] = scores[3]  # inject ties
        assert abs(binary_auroc(labels, scores) - roc_auc_score(labels, scores)) < 1e-12


def test_ece_perfect_calibration_is_zero():
    probs = np.array([[1.0, 0.0]] * 50 + [[0.0, 1.0]] * 50)
    labels = np.array([0] * 50 + [1] * 50)
    assert expected_calibration_error(probs, labels) < 1e-12
    # fully confident & always wrong -> ECE 1
    assert abs(expected_calibration_error(probs, 1 - labels) - 1.0) < 1e-12


def _torch_mha_reference(q, k, v, key_mask=None):
    """torch SDPA as ground truth; q,k,v: (B,H,S,D)."""
    tq, tk, tv = (torch.tensor(np.asarray(t)) for t in (q, k, v))
    attn_mask = None
    if key_mask is not None:
        km = torch.tensor(np.asarray(key_mask))
        attn_mask = torch.zeros(km.shape[0], 1, 1, km.shape[1])
        attn_mask = attn_mask.masked_fill(~km[:, None, None, :], float("-inf"))
    return F.scaled_dot_product_attention(tq, tk, tv, attn_mask=attn_mask).numpy()


@pytest.mark.parametrize("masked", [False, True])
def test_sdpa_xla_matches_torch(masked):
    rng = np.random.default_rng(3)
    b, h, s, d = 2, 3, 17, 16
    q, k, v = (jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32)) for _ in range(3))
    mask = None
    if masked:
        mask = jnp.asarray(rng.random((b, s)) > 0.3)
        mask = mask.at[:, 0].set(True)  # keep at least one key
    ours = np.asarray(sdpa_xla(q, k, v, mask))
    ref = _torch_mha_reference(q, k, v, mask)
    np.testing.assert_allclose(ours, ref, atol=2e-5)


@pytest.mark.parametrize("masked", [False, True])
def test_sdpa_pallas_interpret_matches_xla(masked):
    rng = np.random.default_rng(4)
    b, h, s, d = 2, 2, 32, 16
    q, k, v = (jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32)) for _ in range(3))
    mask = None
    if masked:
        mask = jnp.asarray(rng.random((b, s)) > 0.4)
        mask = mask.at[:, 0].set(True)
    ref = sdpa_xla(q, k, v, mask)
    out = scaled_dot_product_attention(q, k, v, mask, impl="pallas_interpret")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_sdpa_pallas_gradients_match_xla():
    rng = np.random.default_rng(5)
    b, h, s, d = 1, 2, 16, 8
    q, k, v = (jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32)) for _ in range(3))
    mask = jnp.asarray(rng.random((b, s)) > 0.3).at[:, 0].set(True)

    def loss_fn(impl):
        def f(q, k, v):
            out = scaled_dot_product_attention(q, k, v, mask, impl=impl)
            return jnp.sum(out**2)

        return jax.grad(f, argnums=(0, 1, 2))(q, k, v)

    g_ref = loss_fn("xla")
    g_pal = loss_fn("pallas_interpret")
    for a, b_ in zip(g_ref, g_pal):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=3e-5)


def test_layernorm_matches_torch_and_pallas():
    rng = np.random.default_rng(6)
    x = rng.normal(size=(4, 7, 64)).astype(np.float32)
    w = rng.normal(size=(64,)).astype(np.float32)
    b = rng.normal(size=(64,)).astype(np.float32)
    ref = F.layer_norm(torch.tensor(x), (64,), torch.tensor(w), torch.tensor(b)).numpy()
    ours = np.asarray(layer_norm_xla(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b)))
    np.testing.assert_allclose(ours, ref, atol=1e-5)
    pal = np.asarray(
        layer_norm_pallas(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), interpret=True)
    )
    np.testing.assert_allclose(pal, ref, atol=1e-5)


def test_layernorm_bf16_runs_fp32_internally():
    # A bf16 input with large mean would lose precision if normalized in bf16.
    x = (jnp.ones((2, 128)) * 300.0 + jnp.linspace(0, 1, 128)[None]).astype(jnp.bfloat16)
    w = jnp.ones((128,), jnp.float32)
    b = jnp.zeros((128,), jnp.float32)
    out = layer_norm_xla(x, w, b)
    assert out.dtype == jnp.bfloat16
    f32 = layer_norm_xla(x.astype(jnp.float32), w, b)
    np.testing.assert_allclose(
        np.asarray(out, dtype=np.float32), np.asarray(f32), atol=0.05
    )


def test_sdpa_xla_grads_match_torch():
    rng = np.random.default_rng(7)
    b, h, s, d = 2, 2, 12, 8
    qn, kn, vn = (rng.normal(size=(b, h, s, d)).astype(np.float32) for _ in range(3))
    mask_np = (rng.random((b, s)) > 0.3)
    mask_np[:, 0] = True

    tq, tk, tv = (torch.tensor(t, requires_grad=True) for t in (qn, kn, vn))
    km = torch.tensor(mask_np)
    attn_mask = torch.zeros(b, 1, 1, s).masked_fill(~km[:, None, None, :], float("-inf"))
    out = F.scaled_dot_product_attention(tq, tk, tv, attn_mask=attn_mask)
    out.pow(2).sum().backward()

    def loss(q, k, v):
        o = sdpa_xla(q, k, v, jnp.asarray(mask_np))
        return jnp.sum(o**2)

    gq, gk, gv = jax.grad(loss, argnums=(0, 1, 2))(
        jnp.asarray(qn), jnp.asarray(kn), jnp.asarray(vn)
    )
    np.testing.assert_allclose(np.asarray(gq), tq.grad.numpy(), atol=3e-5)
    np.testing.assert_allclose(np.asarray(gk), tk.grad.numpy(), atol=3e-5)
    np.testing.assert_allclose(np.asarray(gv), tv.grad.numpy(), atol=3e-5)


def test_pallas_kernel_under_vmap():
    """The robustness sweeps vmap the kernel over a variant axis."""
    rng = np.random.default_rng(8)
    b, h, s, d = 2, 2, 16, 8
    q, k, v = (jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32)) for _ in range(3))
    masks = jnp.asarray(rng.random((5, b, s)) > 0.3).at[:, :, 0].set(True)

    def one(m, impl):
        return scaled_dot_product_attention(q, k, v, m, impl=impl)

    ref = jax.vmap(lambda m: one(m, "xla"))(masks)
    out = jax.vmap(lambda m: one(m, "pallas_interpret"))(masks)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


# ---------------------------------------------------------------------------
# Heads-last / packed-QKV attention (round-2 layout kernels)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("masked", [False, True])
def test_attention_heads_last_interpret_matches_xla(masked):
    from multimodal_uncertainty_tpu.ops.attention import attention_heads_last

    rng = np.random.default_rng(7)
    b, s, h, dh = 2, 24, 2, 128  # dh=128 exercises the heads-last kernel
    d = h * dh
    q, k, v = (jnp.asarray(rng.normal(size=(b, s, d)).astype(np.float32))
               for _ in range(3))
    mask = None
    if masked:
        mask = jnp.asarray(rng.random((b, s)) > 0.4).at[:, 0].set(True)
    ref = attention_heads_last(q, k, v, mask, n_head=h, impl="xla")
    out = attention_heads_last(q, k, v, mask, n_head=h, impl="pallas_interpret")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_attention_heads_last_gradients_match_xla():
    from multimodal_uncertainty_tpu.ops.attention import attention_heads_last

    rng = np.random.default_rng(8)
    b, s, h, dh = 1, 16, 2, 128
    d = h * dh
    q, k, v = (jnp.asarray(rng.normal(size=(b, s, d)).astype(np.float32))
               for _ in range(3))
    mask = jnp.asarray(rng.random((b, s)) > 0.3).at[:, 0].set(True)

    def grads(impl):
        def f(q, k, v):
            return jnp.sum(
                attention_heads_last(q, k, v, mask, n_head=h, impl=impl) ** 2
            )

        return jax.grad(f, argnums=(0, 1, 2))(q, k, v)

    for a, b_ in zip(grads("xla"), grads("pallas_interpret")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=3e-5)


def test_attention_qkv_packed_matches_xla_fwd_and_grad():
    from multimodal_uncertainty_tpu.ops.attention import attention_qkv_packed

    rng = np.random.default_rng(9)
    b, s, h, dh = 2, 24, 2, 128
    d = h * dh
    qkv = jnp.asarray(rng.normal(size=(b, s, 3 * d)).astype(np.float32))
    mask = jnp.asarray(rng.random((b, s)) > 0.4).at[:, 0].set(True)
    ref = attention_qkv_packed(qkv, mask, n_head=h, impl="xla")
    out = attention_qkv_packed(qkv, mask, n_head=h, impl="pallas_interpret")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    gx = jax.grad(lambda t: jnp.sum(
        attention_qkv_packed(t, mask, n_head=h, impl="xla") ** 2))(qkv)
    gp = jax.grad(lambda t: jnp.sum(
        attention_qkv_packed(t, mask, n_head=h, impl="pallas_interpret") ** 2))(qkv)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gp), atol=3e-5)


@pytest.mark.parametrize("h,dh", [(12, 64), (8, 16), (4, 32)])
def test_attention_heads_last_subhead_masking(h, dh):
    """Dh < 128 with D % 128 == 0 (BERT/MMBT/ViLT Dh=64): the heads-last
    kernel packs 128//Dh sub-heads per 128-lane block and isolates each with
    lane-masked matmuls — fwd and grads must match XLA, with no relayout."""
    from multimodal_uncertainty_tpu.ops import attention as A

    rng = np.random.default_rng(12)
    b, s = 2, 24
    d = h * dh
    assert d % 128 == 0
    q, k, v = (jnp.asarray(rng.normal(size=(b, s, d)).astype(np.float32))
               for _ in range(3))
    mask = jnp.asarray(rng.random((b, s)) > 0.4).at[:, 0].set(True)

    ref = A.attention_heads_last(q, k, v, mask, n_head=h, impl="xla")
    out = A.attention_heads_last(q, k, v, mask, n_head=h, impl="pallas_interpret")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    # grads vs the proven heads-first pallas kernel (bit-comparable: same
    # fused-backward algorithm; XLA's grad differs at ~3e-4 rel for both)
    def heads(t):
        return t.reshape(b, s, h, dh).transpose(0, 2, 1, 3)

    def loss_hf(q, k, v):
        return jnp.sum(A.scaled_dot_product_attention(
            heads(q), heads(k), heads(v), mask, impl="pallas_interpret") ** 2)

    def loss_hl(q, k, v):
        return jnp.sum(A.attention_heads_last(
            q, k, v, mask, n_head=h, impl="pallas_interpret") ** 2)

    g_hf = jax.grad(loss_hf, argnums=(0, 1, 2))(q, k, v)
    g_hl = jax.grad(loss_hl, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_hf, g_hl):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=2e-5)

    # packed entry point takes the same path
    qkv = jnp.concatenate([q, k, v], axis=-1)
    out_p = A.attention_qkv_packed(qkv, mask, n_head=h, impl="pallas_interpret")
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(ref), atol=2e-5)
    g_px = jax.grad(lambda t: jnp.sum(
        A.attention_qkv_packed(t, mask, n_head=h, impl="xla") ** 2))(qkv)
    g_pp = jax.grad(lambda t: jnp.sum(
        A.attention_qkv_packed(t, mask, n_head=h, impl="pallas_interpret") ** 2))(qkv)
    np.testing.assert_allclose(np.asarray(g_px), np.asarray(g_pp), atol=4e-3)


def test_attention_small_head_dim_falls_back(monkeypatch):
    """A model dim with no Mosaic-blockable layout (here D = 64 < 128
    lanes) must route through the heads-first kernel rather than crash."""
    from multimodal_uncertainty_tpu.ops import attention as A

    rng = np.random.default_rng(10)
    b, s, h, dh = 2, 16, 4, 16
    d = h * dh
    q, k, v = (jnp.asarray(rng.normal(size=(b, s, d)).astype(np.float32))
               for _ in range(3))
    mask = jnp.asarray(rng.random((b, s)) > 0.3).at[:, 0].set(True)

    called = {}
    orig = A.scaled_dot_product_attention

    def spy(*args, **kw):
        called["yes"] = True
        return orig(*args, **kw)

    monkeypatch.setattr(A, "scaled_dot_product_attention", spy)
    ref = A.attention_heads_last(q, k, v, mask, n_head=h, impl="xla")
    out = A.attention_heads_last(q, k, v, mask, n_head=h, impl="pallas_interpret")
    assert called.get("yes"), "small-Dh path must use the heads-first kernel"
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    qkv = jnp.concatenate([q, k, v], axis=-1)
    out_p = A.attention_qkv_packed(qkv, mask, n_head=h, impl="pallas_interpret")
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(ref), atol=2e-5)


def test_attention_heads_last_under_vmap():
    from multimodal_uncertainty_tpu.ops.attention import attention_qkv_packed

    rng = np.random.default_rng(11)
    b, s, h, dh = 2, 16, 1, 128
    d = h * dh
    qkv = jnp.asarray(rng.normal(size=(b, s, 3 * d)).astype(np.float32))
    masks = jnp.asarray(rng.random((3, b, s)) > 0.4).at[:, :, 0].set(True)
    fx = jax.vmap(lambda m: attention_qkv_packed(qkv, m, n_head=h, impl="xla"))
    fp = jax.vmap(lambda m: attention_qkv_packed(
        qkv, m, n_head=h, impl="pallas_interpret"))
    np.testing.assert_allclose(
        np.asarray(fp(masks)), np.asarray(fx(masks)), atol=2e-5
    )


def test_attention_kernels_bf16_match_xla_bf16():
    """On the bf16 training path the kernels feed the MXU bf16 operands with
    fp32 accumulation — must track the XLA einsum path (same dtype strategy)
    to bf16 resolution, in fwd and grads."""
    from multimodal_uncertainty_tpu.ops import attention as A

    rng = np.random.default_rng(13)
    for h, dh in [(2, 128), (12, 64)]:
        b, s = 2, 24
        d = h * dh
        q, k, v = (
            jnp.asarray(rng.normal(size=(b, s, d)).astype(np.float32)).astype(
                jnp.bfloat16
            )
            for _ in range(3)
        )
        mask = jnp.asarray(rng.random((b, s)) > 0.4).at[:, 0].set(True)
        ref = A.attention_heads_last(q, k, v, mask, n_head=h, impl="xla")
        out = A.attention_heads_last(
            q, k, v, mask, n_head=h, impl="pallas_interpret"
        )
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            atol=2e-2,
        )

        def loss(f):
            return lambda *xs: jnp.sum(
                A.attention_heads_last(*xs, mask, n_head=h, impl=f)
                .astype(jnp.float32) ** 2
            )

        gx = jax.grad(loss("xla"), argnums=(0, 1, 2))(q, k, v)
        gp = jax.grad(loss("pallas_interpret"), argnums=(0, 1, 2))(q, k, v)
        for a, b_ in zip(gx, gp):
            scale = max(1.0, float(jnp.max(jnp.abs(a.astype(jnp.float32)))))
            np.testing.assert_allclose(
                np.asarray(a, np.float32) / scale,
                np.asarray(b_, np.float32) / scale,
                atol=3e-2,
            )


# ---------------------------------------------------------------------------
# Pallas dW kernel (ops/dw.py — round-3 dW-wall fix)
# ---------------------------------------------------------------------------


def test_dot_general_dw_exact_vs_xla():
    """dot_general_dw: identical forward, identical dW/dx to the XLA dot —
    including the zero-row K padding path (K not a block multiple)."""
    from multimodal_uncertainty_tpu.ops.dw import dot_general_dw

    rng = np.random.default_rng(0)
    for k in (512, 300):  # 300 exercises the pad-to-bk path
        x = jnp.asarray(rng.normal(size=(k, 128)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(128, 256)).astype(np.float32))

        def loss(fn):
            return lambda x_, w_: (fn(x_, w_) ** 2).sum()

        ref, (gx_r, gw_r) = jax.value_and_grad(
            loss(jnp.dot), argnums=(0, 1))(x, w)
        got, (gx, gw) = jax.value_and_grad(
            loss(lambda a, b: dot_general_dw(a, b, True)), argnums=(0, 1)
        )(x, w)
        np.testing.assert_allclose(float(got), float(ref), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_r), atol=1e-3)
        np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_r), atol=1e-3)


def test_fast_dw_train_step_matches_default():
    """A full fusion train step with fast_dw='interpret' reproduces the
    default step's loss and parameter update."""
    from multimodal_uncertainty_tpu.training.steps import build_train_step
    from multimodal_uncertainty_tpu.zoo import setup_flava

    def make(fast_dw):
        return setup_flava(
            model_type="MultiHead", n_classes=3, lr=1e-3, n_epochs=1,
            steps_per_epoch=1, multimodal_num_hidden_layers=1,
            multimodal_num_attention_heads=2, sample_shapes=((4, 6), (4, 5)),
            seed_key=jax.random.key(0), attn_impl="xla", fast_dw=fast_dw,
        )

    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.normal(size=(4, 6, 768)).astype(np.float32))
    txt = jnp.asarray(rng.normal(size=(4, 5, 768)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 3, size=4).astype(np.int64))
    key = jax.random.key(2)

    s_ref = make(False)
    step_ref = build_train_step(s_ref.bundle, s_ref.optimizer, donate=False)
    new_ref, logs_ref = step_ref(s_ref.state, (img, txt), y, key, None)

    s_dw = make("interpret")
    step_dw = build_train_step(s_dw.bundle, s_dw.optimizer, donate=False)
    new_dw, logs_dw = step_dw(s_dw.state, (img, txt), y, key, None)

    np.testing.assert_allclose(float(logs_dw["loss"]), float(logs_ref["loss"]),
                               rtol=1e-6)
    a = jax.tree_util.tree_leaves(new_ref.params)
    b = jax.tree_util.tree_leaves(new_dw.params)
    for la, lb in zip(a, b):
        np.testing.assert_allclose(np.asarray(lb), np.asarray(la), atol=2e-6)


# --------------------------------------------------------------------------
# Flash (sequence-blocked) attention: long-context kernels
# --------------------------------------------------------------------------


@pytest.mark.parametrize("dh,h", [(64, 2), (128, 2), (256, 1)])
def test_attention_flash_matches_xla(dh, h):
    """Online-softmax streaming kernel == whole-sequence XLA attention for
    every Mosaic-blockable head-dim pattern (sub-head lane masking at
    Dh=64, one head per block at Dh=128/256), with padded key masks."""
    from multimodal_uncertainty_tpu.ops.attention import (
        attention_flash, attention_heads_last)

    rng = np.random.default_rng(10)
    b, s = 2, 256
    d = h * dh
    q, k, v = (jnp.asarray(rng.normal(size=(b, s, d)).astype(np.float32))
               for _ in range(3))
    mask = jnp.asarray(rng.random((b, s)) > 0.4).at[:, 0].set(True)
    ref = attention_heads_last(q, k, v, mask, n_head=h, impl="xla")
    out = attention_flash(q, k, v, mask, n_head=h, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_attention_flash_pads_odd_sequence_lengths():
    """S=200 is not a 128-multiple: the entry point pads with masked keys
    and slices the rows back — results identical to the unpadded math."""
    from multimodal_uncertainty_tpu.ops.attention import (
        attention_flash, attention_heads_last)

    rng = np.random.default_rng(11)
    b, s, h, dh = 2, 200, 2, 64
    d = h * dh
    q, k, v = (jnp.asarray(rng.normal(size=(b, s, d)).astype(np.float32))
               for _ in range(3))
    mask = jnp.asarray(rng.random((b, s)) > 0.3).at[:, 0].set(True)
    ref = attention_heads_last(q, k, v, mask, n_head=h, impl="xla")
    out = attention_flash(q, k, v, mask, n_head=h, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_attention_flash_gradients_match_xla():
    """custom-VJP two-pass backward (dQ on the q grid, dK/dV on the k grid,
    p recomputed from the saved log-sum-exp) == XLA autodiff, including
    zero gradients into masked keys and padded rows."""
    from multimodal_uncertainty_tpu.ops.attention import (
        attention_flash, attention_heads_last)

    rng = np.random.default_rng(12)
    for (h, dh, s) in [(2, 64, 256), (1, 256, 200)]:
        d = h * dh
        q, k, v = (jnp.asarray(rng.normal(size=(2, s, d)).astype(np.float32))
                   for _ in range(3))
        mask = jnp.asarray(rng.random((2, s)) > 0.3).at[:, 0].set(True)

        def grads(fn):
            def f(q, k, v):
                return jnp.sum(fn(q, k, v) ** 2)

            return jax.grad(f, argnums=(0, 1, 2))(q, k, v)

        ref = grads(lambda q, k, v: attention_heads_last(
            q, k, v, mask, n_head=h, impl="xla"))
        out = grads(lambda q, k, v: attention_flash(
            q, k, v, mask, n_head=h, interpret=True))
        for a, b_ in zip(out, ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=3e-5)


def test_attention_long_sequence_escalates_to_flash(monkeypatch):
    """When the whole-sequence kernels' VMEM budget fails (long S), every
    entry point must route to the flash kernels rather than emit a
    Mosaic-uncompilable whole-seq program — forced here by dropping the
    budget cap, verified by numerics staying XLA-exact."""
    from multimodal_uncertainty_tpu.ops import attention as A

    rng = np.random.default_rng(13)
    b, s, h, dh = 2, 256, 2, 64
    d = h * dh
    q, k, v = (jnp.asarray(rng.normal(size=(b, s, d)).astype(np.float32))
               for _ in range(3))
    mask = jnp.asarray(rng.random((b, s)) > 0.4).at[:, 0].set(True)
    ref = A.attention_heads_last(q, k, v, mask, n_head=h, impl="xla")
    monkeypatch.setattr(A, "_WHOLE_SEQ_VMEM_CAP", 1)
    for out in (
        A.attention_heads_last(q, k, v, mask, n_head=h, impl="pallas_interpret"),
        A.attention_qkv_packed(jnp.concatenate([q, k, v], -1), mask,
                               n_head=h, impl="pallas_interpret"),
    ):
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def heads(t):
        return t.reshape(b, s, h, dh).transpose(0, 2, 1, 3)

    out_hf = A.scaled_dot_product_attention(
        heads(q), heads(k), heads(v), mask, impl="pallas_interpret"
    ).transpose(0, 2, 1, 3).reshape(b, s, d)
    np.testing.assert_allclose(np.asarray(out_hf), np.asarray(ref), atol=2e-5)


def test_attention_flash_streaming_past_resident_envelope(monkeypatch):
    """Past the resident kernels' VMEM envelope (forced here by nulling the
    resident tile search) the flash impls must fall through to the STREAMING
    kernels — 4D grid, per-chunk blocks, scratch-carried online state — and
    stay XLA-exact through the custom-VJP backward, for both head-dim
    patterns (sub-head lane masking at Dh=64, one head per block at Dh=256)
    with multi-chunk grids in every dimension."""
    from multimodal_uncertainty_tpu.ops import attention as A

    monkeypatch.setattr(A, "_flash_tiles", lambda *a: None)
    # small forced tiles -> nq = nk = 4: the online recurrence, the scratch
    # init/flush @pl.when edges, and chunk revisiting all exercised
    monkeypatch.setattr(A, "_flash_stream_tiles", lambda *a: (128, 128))
    rng = np.random.default_rng(15)
    for (h, dh) in [(2, 64), (1, 256)]:
        b, s = 2, 512
        d = h * dh
        q, k, v = (jnp.asarray(rng.normal(size=(b, s, d)).astype(np.float32))
                   for _ in range(3))
        mask = jnp.asarray(rng.random((b, s)) > 0.3).at[:, 0].set(True)

        def grads(fn):
            def f(q, k, v):
                return jnp.sum(fn(q, k, v) ** 2)

            return jax.value_and_grad(f, argnums=(0, 1, 2))(q, k, v)

        ref, gref = grads(lambda q, k, v: A.attention_heads_last(
            q, k, v, mask, n_head=h, impl="xla"))
        out, gout = grads(lambda q, k, v: A.attention_flash(
            q, k, v, mask, n_head=h, interpret=True))
        np.testing.assert_allclose(float(out), float(ref), rtol=1e-5)
        for a, b_ in zip(gout, gref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       atol=3e-5)


def test_attention_flash_streaming_pads_odd_lengths(monkeypatch):
    """S=200 through the streaming path: the entry point's pad-and-slice
    (masked keys, zeroed padded-row grads) composes with the 4D-grid
    kernels exactly as with the resident ones."""
    from multimodal_uncertainty_tpu.ops import attention as A

    monkeypatch.setattr(A, "_flash_tiles", lambda *a: None)
    rng = np.random.default_rng(16)
    b, s, h, dh = 2, 200, 2, 64
    d = h * dh
    q, k, v = (jnp.asarray(rng.normal(size=(b, s, d)).astype(np.float32))
               for _ in range(3))
    mask = jnp.asarray(rng.random((b, s)) > 0.3).at[:, 0].set(True)
    ref = A.attention_heads_last(q, k, v, mask, n_head=h, impl="xla")
    out = A.attention_flash(q, k, v, mask, n_head=h, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_attention_qkv_packed_honors_flash_impls():
    """An explicit flash impl on the PACKED entry must route to the flash
    kernels with the interpret flag intact even when the whole-seq budget
    fits (regression: it used to fall through to the whole-seq packed
    kernel with interpret=False, a Mosaic crash on CPU)."""
    from multimodal_uncertainty_tpu.ops.attention import (
        attention_heads_last, attention_qkv_packed)

    rng = np.random.default_rng(17)
    b, s, h, dh = 2, 256, 2, 64
    d = h * dh
    q, k, v = (jnp.asarray(rng.normal(size=(b, s, d)).astype(np.float32))
               for _ in range(3))
    mask = jnp.asarray(rng.random((b, s)) > 0.4).at[:, 0].set(True)
    ref = attention_heads_last(q, k, v, mask, n_head=h, impl="xla")
    out = attention_qkv_packed(jnp.concatenate([q, k, v], -1), mask,
                               n_head=h, impl="flash_interpret")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_attention_flash_bf16_matches_xla_bf16():
    """Same dtype strategy as every kernel in this module: bf16 MXU
    operands, fp32 accumulation/softmax — within bf16 output rounding of
    the XLA einsum path on identical bf16 inputs."""
    from multimodal_uncertainty_tpu.ops.attention import (
        attention_flash, attention_heads_last)

    rng = np.random.default_rng(14)
    b, s, h, dh = 2, 256, 2, 64
    d = h * dh
    q, k, v = (jnp.asarray(rng.normal(size=(b, s, d)).astype(np.float32),
                           jnp.bfloat16) for _ in range(3))
    mask = jnp.asarray(rng.random((b, s)) > 0.4).at[:, 0].set(True)
    ref = np.asarray(attention_heads_last(q, k, v, mask, n_head=h,
                                          impl="xla")).astype(np.float32)
    out = np.asarray(attention_flash(q, k, v, mask, n_head=h,
                                     interpret=True)).astype(np.float32)
    np.testing.assert_allclose(out, ref, atol=1.6e-2)
