"""Int8 host->device transfer quantization (data/transfer_quant.py).

The wire format (int8 + per-token fp32 scales) must reconstruct the
original batch within the documented bound, keep collate zero-padding
bit-exact, leave non-embedding leaves untouched, stay idempotent under the
trainer's double put_batch application, compose with a 'data'-sharded mesh
put, and not disturb fusion training beyond int8 rounding noise.
"""
import jax
import jax.numpy as jnp
import ml_dtypes
import numpy as np
import pytest

from multimodal_uncertainty_tpu.data.transfer_quant import (
    Int8TransferPut,
    dequantize,
    quantize_rows,
)


@pytest.mark.parametrize("dtype", [np.float32, ml_dtypes.bfloat16])
def test_roundtrip_error_bound(dtype):
    rng = np.random.default_rng(0)
    x = (rng.normal(size=(5, 9, 128)) * rng.uniform(0.1, 30)).astype(dtype)
    q, s = quantize_rows(x)
    assert q.dtype == np.int8 and s.dtype == np.float32
    assert s.shape == (5, 9, 1)
    back = np.asarray(dequantize(jnp.asarray(q), jnp.asarray(s), x.dtype))
    assert back.dtype == x.dtype
    # max elementwise error = half a quantization step = max|row|/254,
    # plus the output dtype's own rounding
    bound = np.abs(np.asarray(x, np.float32)).max(axis=-1, keepdims=True) / 254
    err = np.abs(back.astype(np.float32) - np.asarray(x, np.float32))
    tol = bound + np.abs(np.asarray(x, np.float32)) * 0.01  # bf16 output ulp
    assert (err <= tol + 1e-7).all()


@pytest.mark.parametrize("dtype", [np.float32, ml_dtypes.bfloat16])
def test_native_quantizer_bit_matches_numpy(dtype):
    from multimodal_uncertainty_tpu.data.native import native_quantize_rows
    from multimodal_uncertainty_tpu.data.transfer_quant import (
        _numpy_quantize_rows,
    )

    rng = np.random.default_rng(7)
    x = (rng.normal(size=(9, 33, 192)) * rng.uniform(0.01, 50)).astype(dtype)
    x[2, 5] = 0  # an all-zero padding row in the middle
    out = native_quantize_rows(x)
    if out is None:
        pytest.skip("native library unavailable")
    qn, sn = out
    qp, sp = _numpy_quantize_rows(x)
    np.testing.assert_array_equal(qn, qp)
    np.testing.assert_array_equal(sn, sp)
    # row-threaded split must not change results
    qt, st = native_quantize_rows(x, n_threads=4)
    np.testing.assert_array_equal(qt, qn)
    np.testing.assert_array_equal(st, sn)


def test_nonfinite_rows_quantize_to_zero_native_and_numpy():
    """Rows containing any NaN/Inf quantize to zeros with scale 1.0 —
    defined behavior, identical across the native and numpy paths."""
    from multimodal_uncertainty_tpu.data.native import native_quantize_rows
    from multimodal_uncertainty_tpu.data.transfer_quant import (
        _numpy_quantize_rows,
    )

    rng = np.random.default_rng(3)
    x = rng.normal(size=(4, 5, 96)).astype(np.float32)
    x[0, 1, 7] = np.nan       # mixed NaN row
    x[1, 2, :] = np.nan       # all-NaN row
    x[2, 0, 50] = np.inf      # +Inf row
    x[3, 4, 0] = -np.inf      # -Inf row
    qp, sp = _numpy_quantize_rows(x)
    for (r, c) in [(0, 1), (1, 2), (2, 0), (3, 4)]:
        assert (qp[r, c] == 0).all()
        assert sp[r, c, 0] == 1.0
    # finite rows are untouched by the non-finite handling
    qf, sf = _numpy_quantize_rows(np.nan_to_num(x, nan=0.0, posinf=0.0,
                                                neginf=0.0))
    np.testing.assert_array_equal(qp[0, 0], qf[0, 0])
    out = native_quantize_rows(x)
    if out is not None:
        qn, sn = out
        np.testing.assert_array_equal(qn, qp)
        np.testing.assert_array_equal(sn, sp)


def test_y_side_float_leaves_never_quantized():
    """(x, y) trainer layout: a float leaf on the y side (e.g. soft labels
    with >=64 columns) must cross the wire verbatim, not int8-rounded."""
    rng = np.random.default_rng(5)
    img = rng.normal(size=(4, 8, 128)).astype(np.float32)
    soft_y = rng.normal(size=(4, 128)).astype(np.float32)  # would be
    # eligible by shape/dtype — position alone must protect it
    out_x, out_y = Int8TransferPut()((img, soft_y))
    np.testing.assert_array_equal(np.asarray(out_y), soft_y)
    # the x side is still quantized (int8-rounded, not bit-equal)
    assert not np.array_equal(np.asarray(out_x), img)
    np.testing.assert_allclose(np.asarray(out_x), img,
                               atol=np.abs(img).max() / 100)


def test_zero_padding_rows_exact():
    x = np.zeros((3, 4, 96), np.float32)
    x[0, 0] = np.linspace(-2, 2, 96)
    q, s = quantize_rows(x)
    assert (s[1:] == 1.0).all() and (q[1:] == 0).all()
    back = np.asarray(dequantize(jnp.asarray(q), jnp.asarray(s), x.dtype))
    assert (back[1:] == 0).all()
    assert (back[0, 1:] == 0).all()


def test_put_fn_structure_and_selectivity():
    rng = np.random.default_rng(1)
    img = rng.normal(size=(4, 8, 128)).astype(ml_dtypes.bfloat16)
    txt = rng.normal(size=(4, 6, 128)).astype(np.float32)
    y = rng.integers(0, 3, size=4).astype(np.int64)
    small = rng.normal(size=(4, 3)).astype(np.float32)  # last dim < 64
    batch = ((img, txt), y, small)

    out = Int8TransferPut()(batch)
    (oi, ot), oy, osmall = out
    assert oi.shape == img.shape and oi.dtype == jnp.bfloat16
    assert ot.shape == txt.shape and ot.dtype == jnp.float32
    # integer and small-feature leaves cross the wire verbatim
    np.testing.assert_array_equal(np.asarray(oy), y)
    np.testing.assert_array_equal(np.asarray(osmall), small)
    # embeddings are int8-rounded, not verbatim — but close
    f32 = np.asarray(txt, np.float32)
    np.testing.assert_allclose(np.asarray(ot), f32, atol=np.abs(f32).max() / 100)

    # idempotent: the trainer applies put_batch again post-prefetch
    out2 = Int8TransferPut()(out)
    assert np.asarray(out2[0][0] == oi).all()
    assert np.asarray(out2[0][1] == ot).all()


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_mesh_composition_matches_single_device():
    from multimodal_uncertainty_tpu.parallel.mesh import make_mesh
    from multimodal_uncertainty_tpu.parallel.sharding import put_batch_fn

    rng = np.random.default_rng(2)
    img = rng.normal(size=(8, 5, 128)).astype(np.float32)
    y = rng.integers(0, 2, size=8).astype(np.int64)
    batch = (img, y)

    single = Int8TransferPut()(batch)
    mesh = make_mesh(8)
    sharded = Int8TransferPut(base_put=put_batch_fn(mesh))(batch)
    # same quantization, placement-independent values; payload rides 'data'
    np.testing.assert_array_equal(np.asarray(sharded[0]), np.asarray(single[0]))
    np.testing.assert_array_equal(np.asarray(sharded[1]), y)
    assert len(sharded[0].sharding.device_set) == 8


def test_fusion_train_step_unchanged_within_rounding():
    from multimodal_uncertainty_tpu.training.steps import build_train_step
    from multimodal_uncertainty_tpu.zoo import setup_flava

    b, li, lt = 16, 12, 8
    setup = setup_flava(
        model_type="MIMO-shuffle-instance", n_classes=4, lr=1e-3, n_epochs=1,
        steps_per_epoch=1, multimodal_num_hidden_layers=2,
        multimodal_num_attention_heads=4, sample_shapes=((b, li), (b, lt)),
        seed_key=jax.random.key(0), attn_impl="xla",
    )
    step = build_train_step(setup.bundle, setup.optimizer, donate=False)
    rng = np.random.default_rng(3)
    img = rng.normal(size=(b, li, 768)).astype(np.float32)
    txt = rng.normal(size=(b, lt, 768)).astype(np.float32)
    y = rng.integers(0, 4, size=b).astype(np.int64)

    exact = jax.tree_util.tree_map(jnp.asarray, ((img, txt), y))
    quant = Int8TransferPut()(((img, txt), y))

    _, logs_e = step(setup.state, exact[0], exact[1], jax.random.key(7), None)
    _, logs_q = step(setup.state, quant[0], quant[1], jax.random.key(7), None)
    # int8 rounding perturbs inputs by <0.4% of row max — the loss moves by
    # the same order, nothing more
    np.testing.assert_allclose(
        float(logs_q["loss"]), float(logs_e["loss"]), rtol=0.02
    )

    # and training still trains: a few quantized steps reduce the loss
    state = setup.state
    first = last = None
    for i in range(30):
        state, logs = step(state, quant[0], quant[1], jax.random.key(i), None)
        if first is None:
            first = float(logs["loss"])
        last = float(logs["loss"])
    assert last < first
