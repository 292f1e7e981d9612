"""Int8 quantized serving tests (ops/quant.py + serving predictor wiring)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_uncertainty_tpu.models import FlavaFusionTransformer
from multimodal_uncertainty_tpu.ops.quant import (
    current_mode,
    int8_dot,
    int8_weight_dot,
    quantized,
)
from multimodal_uncertainty_tpu.serving import FusionPredictor
from multimodal_uncertainty_tpu.training.checkpoint import save_weights

pytestmark = pytest.mark.quick  # <=2-min smoke tier (make check)

D = 32


def test_int8_dot_matches_manual_quantization_math():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(5, 16)).astype(np.float32)
    w = rng.normal(size=(16, 8)).astype(np.float32)

    xs = np.maximum(np.abs(x).max(-1, keepdims=True) / 127.0, 1e-12)
    ws = np.maximum(np.abs(w).max(0, keepdims=True) / 127.0, 1e-12)
    xq = np.round(x / xs).astype(np.int32)
    wq = np.round(w / ws).astype(np.int32)
    expected = (xq @ wq).astype(np.float32) * xs * ws

    got = np.asarray(int8_dot(jnp.asarray(x), jnp.asarray(w)))
    np.testing.assert_allclose(got, expected, rtol=1e-6, atol=1e-6)


def test_int8_dot_accuracy_vs_fp32():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(64, 128)).astype(np.float32)
    w = rng.normal(size=(128, 64)).astype(np.float32) / np.sqrt(128)
    exact = x @ w
    q = np.asarray(int8_dot(jnp.asarray(x), jnp.asarray(w)))
    wq = np.asarray(int8_weight_dot(jnp.asarray(x), jnp.asarray(w)))
    # int8 dynamic quantization: ~1% relative error at these shapes
    assert np.abs(q - exact).max() / np.abs(exact).max() < 0.02
    # weight-only is strictly gentler than W8A8
    assert np.abs(wq - exact).max() <= np.abs(q - exact).max() + 1e-6


def test_int8_dot_zero_rows_no_nan():
    x = jnp.zeros((3, 16), jnp.float32)
    w = jnp.ones((16, 4), jnp.float32)
    out = np.asarray(int8_dot(x, w))
    assert np.isfinite(out).all() and (out == 0).all()


def test_quantized_context_restores_and_validates():
    assert current_mode() is None
    with quantized("int8"):
        assert current_mode() == "int8"
        with quantized("int8_weight"):
            assert current_mode() == "int8_weight"
        assert current_mode() == "int8"
    assert current_mode() is None
    with pytest.raises(ValueError):
        with quantized("fp4"):
            pass
    assert current_mode() is None


def _fusion_ckpt(tmp_path):
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


@pytest.mark.slow  # excluded from the quick tier
@pytest.mark.parametrize("mode,tol", [("int8", 0.05), ("int8_weight", 0.02)])
def test_quantized_predictor_close_to_fp32(tmp_path, mode, tol):
    model, variables, ckpt = _fusion_ckpt(tmp_path)
    rng = np.random.default_rng(2)
    img = rng.normal(size=(3, 5, D)).astype(np.float32)
    txt = rng.normal(size=(3, 4, D)).astype(np.float32)

    full = FusionPredictor(model, ckpt, template_variables=variables,
                           pad_multiple=8, batch_buckets=(4,))
    quant = FusionPredictor(model, ckpt, template_variables=variables,
                            pad_multiple=8, batch_buckets=(4,), quantize=mode)
    p_full = full.predict(img, txt)
    p_q = quant.predict(img, txt)
    np.testing.assert_allclose(p_q.sum(-1), 1.0, atol=1e-5)
    assert np.abs(p_q - p_full).max() < tol
    # top-1 agreement on random init with 3 classes (weak but real signal)
    assert (p_q.argmax(-1) == p_full.argmax(-1)).mean() >= 2 / 3


@pytest.mark.slow  # excluded from the quick tier
def test_quantized_mode_does_not_leak_into_training_trace(tmp_path):
    """A jitted forward traced OUTSIDE the context must be full precision
    even if a quantized predictor exists in the process."""
    model, variables, ckpt = _fusion_ckpt(tmp_path)
    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.normal(size=(2, 5, D)).astype(np.float32))
    txt = jnp.asarray(rng.normal(size=(2, 4, D)).astype(np.float32))

    with quantized("int8"):
        q_logits = model.apply(variables, (img, txt), train=False)
    logits = model.apply(variables, (img, txt), train=False)
    exact_again = model.apply(variables, (img, txt), train=False)
    # quantization changed numerics; plain path is deterministic/exact
    assert np.abs(np.asarray(q_logits) - np.asarray(logits)).max() > 0
    np.testing.assert_array_equal(np.asarray(logits), np.asarray(exact_again))
