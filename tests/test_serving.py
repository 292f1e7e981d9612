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


# ---------------------------------------------------------------------------
# MicroBatcher (dynamic request batching)
# ---------------------------------------------------------------------------


def test_micro_batcher_results_match_direct(tmp_path):
    """Coalesced predictions must equal per-sample direct predictions,
    including variable-length samples."""
    from multimodal_uncertainty_tpu.serving import fusion_micro_batcher

    model, variables, ckpt = _make_ckpt(tmp_path)
    pred = FusionPredictor(
        model, ckpt, template_variables=variables, pad_multiple=8,
        batch_buckets=(4, 16),
    )
    rng = np.random.default_rng(5)
    samples = [
        (
            rng.normal(size=(3 + i % 4, D)).astype(np.float32),
            rng.normal(size=(2 + i % 3, D)).astype(np.float32),
        )
        for i in range(7)
    ]
    mb = fusion_micro_batcher(pred, max_batch=4, max_wait_ms=20)
    futs = [mb.submit(s) for s in samples]
    got = [f.result(timeout=30) for f in futs]
    mb.close()
    for (im, tx), g in zip(samples, got):
        ref = pred.predict(
            im[None], tx[None],
            img_lengths=np.asarray([im.shape[0]]),
            txt_lengths=np.asarray([tx.shape[0]]),
        )[0]
        np.testing.assert_allclose(g, ref, atol=1e-4)


def test_micro_batcher_coalesces_requests():
    """Concurrent submissions must be served in fewer predict calls than
    requests (the whole point of the batcher)."""
    import time

    from multimodal_uncertainty_tpu.serving import MicroBatcher

    calls = []

    def predict_batch(samples):
        calls.append(len(samples))
        time.sleep(0.01)
        return [s * 2 for s in samples]

    mb = MicroBatcher(predict_batch, max_batch=16, max_wait_ms=50)
    futs = [mb.submit(i) for i in range(12)]
    assert [f.result(timeout=10) for f in futs] == [i * 2 for i in range(12)]
    mb.close()
    assert sum(calls) == 12
    assert len(calls) < 12, calls  # actually batched


def test_micro_batcher_error_propagation_and_close():
    from multimodal_uncertainty_tpu.serving import MicroBatcher

    def boom(samples):
        raise RuntimeError("backend down")

    mb = MicroBatcher(boom, max_batch=4, max_wait_ms=5)
    fut = mb.submit(1)
    try:
        fut.result(timeout=10)
        raised = False
    except RuntimeError as e:
        raised = "backend down" in str(e)
    assert raised
    mb.close()
    try:
        mb.submit(2)
        closed_rejects = False
    except RuntimeError:
        closed_rejects = True
    assert closed_rejects


def test_micro_batcher_respects_max_batch():
    from multimodal_uncertainty_tpu.serving import MicroBatcher

    calls = []

    def predict_batch(samples):
        calls.append(len(samples))
        return samples

    mb = MicroBatcher(predict_batch, max_batch=3, max_wait_ms=100)
    futs = [mb.submit(i) for i in range(9)]
    [f.result(timeout=10) for f in futs]
    mb.close()
    assert max(calls) <= 3


def test_mmbt_micro_batcher_matches_direct(tmp_path):
    from multimodal_uncertainty_tpu.serving import (
        MMBTPredictor,
        mmbt_micro_batcher,
    )

    model, variables, ckpt = _make_mmbt_ckpt(tmp_path)
    pred = MMBTPredictor(model, ckpt, template_variables=variables,
                         batch_buckets=(4,))
    rng = np.random.default_rng(7)
    lengths = [6, 4, 5]
    samples = []
    for L in lengths:
        samples.append((
            rng.integers(0, 120, size=L).astype(np.int64),
            np.ones(L, np.int64),
            rng.normal(size=(64, 64, 3)).astype(np.float32),
        ))
    mb = mmbt_micro_batcher(pred, max_batch=4, max_wait_ms=20, pad_multiple=8)
    futs = [mb.submit(s) for s in samples]
    got = [f.result(timeout=60) for f in futs]
    mb.close()

    # reference: the same samples padded to the adapter's length, directly
    lt = 8
    txt = np.zeros((3, lt), np.int64)
    seg = np.zeros((3, lt), np.int64)
    mask = np.zeros((3, lt), np.int64)
    img = np.stack([s[2] for s in samples])
    for i, (ids, segment, _) in enumerate(samples):
        txt[i, : len(ids)] = ids
        seg[i, : len(ids)] = segment
        mask[i, : len(ids)] = 1
    ref = pred.predict(txt, mask, seg, img)
    np.testing.assert_allclose(np.stack(got), ref, atol=1e-5)


def test_vilt_micro_batcher_matches_direct(tmp_path):
    import dataclasses

    import jax.numpy as jnp

    from multimodal_uncertainty_tpu.models.vilt import (
        ViltConfig,
        ViltForImagesAndTextClassification,
    )
    from multimodal_uncertainty_tpu.serving import (
        ViltPredictor,
        vilt_micro_batcher,
    )

    cfg = dataclasses.replace(
        ViltConfig.b32(), vocab_size=120, hidden_size=32, num_hidden_layers=1,
        num_attention_heads=2, intermediate_size=64, image_size=64,
        num_labels=3,
    )
    model = ViltForImagesAndTextClassification(config=cfg, attn_impl="xla")
    rng = np.random.default_rng(0)
    n, lt = 2, 8
    init_batch = {
        "input_ids": rng.integers(0, 120, size=(n, lt)).astype(np.int64),
        "attention_mask": np.ones((n, lt), np.int64),
        "token_type_ids": np.zeros((n, lt), np.int64),
        "pixel_values": rng.normal(size=(n, 64, 64, 3)).astype(np.float32),
    }
    jb = {k: jnp.asarray(v) for k, v in init_batch.items()}
    variables = model.init({"params": jax.random.key(0)}, jb, train=False)
    ckpt = os.path.join(tmp_path, "vilt_best.pt")
    save_weights(variables, None, ckpt)
    pred = ViltPredictor(model, ckpt, template_variables=variables,
                         batch_buckets=(4,))

    lengths = [7, 5, 8]
    samples = []
    for L in lengths:
        samples.append({
            "input_ids": rng.integers(0, 120, size=L).astype(np.int64),
            "attention_mask": np.ones(L, np.int64),
            "token_type_ids": np.zeros(L, np.int64),
            "pixel_values": rng.normal(size=(64, 64, 3)).astype(np.float32),
        })
    mb = vilt_micro_batcher(pred, max_batch=4, max_wait_ms=20, pad_multiple=8)
    futs = [mb.submit(s) for s in samples]
    got = [f.result(timeout=60) for f in futs]
    mb.close()

    padded = {
        k: np.zeros((3, 8), np.int64)
        for k in ("input_ids", "attention_mask", "token_type_ids")
    }
    for i, s in enumerate(samples):
        for k in padded:
            padded[k][i, : len(s[k])] = s[k]
    padded["pixel_values"] = np.stack([s["pixel_values"] for s in samples])
    ref = pred.predict(padded)
    np.testing.assert_allclose(np.stack(got), ref, atol=1e-5)


def test_micro_batcher_survives_cancelled_futures():
    """A caller cancelling its future (e.g. after a client-side timeout)
    must not kill the collector thread; later requests still get served."""
    import time

    from multimodal_uncertainty_tpu.serving import MicroBatcher

    gate = []

    def predict_batch(samples):
        time.sleep(0.05)
        gate.append(len(samples))
        return [s + 1 for s in samples]

    mb = MicroBatcher(predict_batch, max_batch=4, max_wait_ms=30)
    f1 = mb.submit(10)
    cancelled = f1.cancel()  # give up before the collector claims it
    f2 = mb.submit(20)
    assert f2.result(timeout=10) == 21  # collector alive and serving
    if cancelled:
        assert f1.cancelled()
    f3 = mb.submit(30)
    assert f3.result(timeout=10) == 31
    mb.close()


def test_micro_batcher_close_serves_accepted_requests():
    """Every request accepted by submit() before close() must resolve."""
    import threading

    from multimodal_uncertainty_tpu.serving import MicroBatcher

    def predict_batch(samples):
        return [s * 3 for s in samples]

    mb = MicroBatcher(predict_batch, max_batch=64, max_wait_ms=1)
    futs = []

    def submitter():
        for i in range(50):
            try:
                futs.append((i, mb.submit(i)))
            except RuntimeError:
                return  # closed: acceptable, just must not hang

    t = threading.Thread(target=submitter)
    t.start()
    mb.close()
    t.join()
    for i, f in futs:
        assert f.result(timeout=10) == i * 3  # accepted => served


def test_vilt_micro_batcher_mixed_pixel_mask(tmp_path):
    """A sample WITH a pixel_mask keeps it even when coalesced with
    maskless companions (results must not depend on batch composition)."""
    import dataclasses

    import jax.numpy as jnp

    from multimodal_uncertainty_tpu.models.vilt import (
        ViltConfig,
        ViltForImagesAndTextClassification,
    )
    from multimodal_uncertainty_tpu.serving import (
        ViltPredictor,
        vilt_micro_batcher,
    )

    cfg = dataclasses.replace(
        ViltConfig.b32(), vocab_size=120, hidden_size=32, num_hidden_layers=1,
        num_attention_heads=2, intermediate_size=64, image_size=64,
        num_labels=3,
    )
    model = ViltForImagesAndTextClassification(config=cfg, attn_impl="xla")
    rng = np.random.default_rng(2)
    lt = 8
    init_batch = {
        "input_ids": rng.integers(0, 120, size=(1, lt)).astype(np.int64),
        "attention_mask": np.ones((1, lt), np.int64),
        "token_type_ids": np.zeros((1, lt), np.int64),
        "pixel_values": rng.normal(size=(1, 64, 64, 3)).astype(np.float32),
    }
    jb = {k: jnp.asarray(v) for k, v in init_batch.items()}
    variables = model.init({"params": jax.random.key(0)}, jb, train=False)
    ckpt = os.path.join(tmp_path, "vilt_best.pt")
    save_weights(variables, None, ckpt)
    pred = ViltPredictor(model, ckpt, template_variables=variables,
                         batch_buckets=(4,))

    def sample(with_mask):
        s = {
            "input_ids": rng.integers(0, 120, size=lt).astype(np.int64),
            "attention_mask": np.ones(lt, np.int64),
            "token_type_ids": np.zeros(lt, np.int64),
            "pixel_values": rng.normal(size=(64, 64, 3)).astype(np.float32),
        }
        if with_mask:
            m = np.ones((64, 64), np.int64)
            m[32:] = 0  # mask out the bottom half
            s["pixel_mask"] = m
        return s

    masked = sample(True)
    plain = sample(False)

    # solo prediction of the masked sample = ground truth
    solo_mb = vilt_micro_batcher(pred, max_batch=1, max_wait_ms=1)
    solo = solo_mb(masked)
    solo_mb.close()

    mb = vilt_micro_batcher(pred, max_batch=4, max_wait_ms=50)
    futs = [mb.submit(masked), mb.submit(plain)]
    got = [f.result(timeout=60) for f in futs]
    mb.close()
    np.testing.assert_allclose(got[0], solo, atol=1e-5)


def test_mmbt_micro_batcher_uncertainty(tmp_path):
    """uncertainty=True serves (probs, diag) per sample, equal to the
    predictor's own ablation diagnostics on the same padded batch."""
    from multimodal_uncertainty_tpu.serving import (
        MMBTPredictor,
        mmbt_micro_batcher,
    )

    model, variables, ckpt = _make_mmbt_ckpt(tmp_path)
    pred = MMBTPredictor(model, ckpt, template_variables=variables,
                         batch_buckets=(4,))
    rng = np.random.default_rng(11)
    L = 6
    samples = [
        (rng.integers(0, 120, size=L).astype(np.int64),
         np.ones(L, np.int64),
         rng.normal(size=(64, 64, 3)).astype(np.float32))
        for _ in range(2)
    ]
    mb = mmbt_micro_batcher(pred, max_batch=4, max_wait_ms=20,
                            pad_multiple=8, uncertainty=True)
    futs = [mb.submit(s) for s in samples]
    got = [f.result(timeout=120) for f in futs]
    mb.close()

    lt = 8
    txt = np.zeros((2, lt), np.int64)
    seg = np.zeros((2, lt), np.int64)
    mask = np.zeros((2, lt), np.int64)
    img = np.stack([s[2] for s in samples])
    for i, (ids, segment, _) in enumerate(samples):
        txt[i, :L] = ids
        seg[i, :L] = segment
        mask[i, :L] = 1
    ref_probs, ref_diag = pred.predict_with_uncertainty(txt, mask, seg, img)
    for i, (probs, diag) in enumerate(got):
        np.testing.assert_allclose(probs, ref_probs[i], atol=1e-5)
        assert set(diag) == {
            "confidence", "image_sensitivity", "text_sensitivity"
        }
        for k in diag:
            np.testing.assert_allclose(diag[k], ref_diag[k][i], atol=1e-5)


def test_vilt_micro_batcher_uncertainty(tmp_path):
    import dataclasses

    import jax.numpy as jnp

    from multimodal_uncertainty_tpu.models.vilt import (
        ViltConfig,
        ViltForImagesAndTextClassification,
    )
    from multimodal_uncertainty_tpu.serving import (
        ViltPredictor,
        vilt_micro_batcher,
    )

    cfg = dataclasses.replace(
        ViltConfig.b32(), vocab_size=120, hidden_size=32, num_hidden_layers=1,
        num_attention_heads=2, intermediate_size=64, image_size=64,
        num_labels=3,
    )
    model = ViltForImagesAndTextClassification(config=cfg, attn_impl="xla")
    rng = np.random.default_rng(0)
    n, lt = 2, 7
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

    # pad_multiple=7 keeps the adapter's padded length == lt so the
    # reference call below sees the identical padded batch
    mb = vilt_micro_batcher(pred, max_batch=4, max_wait_ms=20,
                            pad_multiple=7, uncertainty=True)
    samples = [
        {k: np.asarray(v[i]) for k, v in batch.items()} for i in range(n)
    ]
    futs = [mb.submit(s) for s in samples]
    got = [f.result(timeout=120) for f in futs]
    mb.close()

    ref_probs, ref_diag = pred.predict_with_uncertainty(batch)
    for i, (probs, diag) in enumerate(got):
        np.testing.assert_allclose(probs, ref_probs[i], atol=1e-5)
        for k in diag:
            np.testing.assert_allclose(diag[k], ref_diag[k][i], atol=1e-5)


# ---------------------------------------------------------------------------
# Mesh-sharded serving (multi-chip DP / DPxTP on the virtual CPU mesh)
# ---------------------------------------------------------------------------


def test_fusion_predictor_on_dp_mesh_matches_single_device(tmp_path):
    """mesh=: batch shards over 'data'; probs == the single-device path,
    including an odd request size that pads up to a data-divisible bucket."""
    from multimodal_uncertainty_tpu.parallel.mesh import make_mesh

    model, variables, ckpt = _make_ckpt(tmp_path)
    single = FusionPredictor(
        model, ckpt, template_variables=variables, pad_multiple=8,
        batch_buckets=(4, 16),
    )
    mesh = make_mesh(8, model_parallel=1)
    sharded = FusionPredictor(
        model, ckpt, template_variables=variables, pad_multiple=8,
        batch_buckets=(4, 16), mesh=mesh,
    )
    assert sharded.batch_multiple == 8
    rng = np.random.default_rng(3)
    for n in (2, 5, 17):  # bucket 4 -> 8; 16; 17 -> lcm(16,8) rounding
        img = rng.normal(size=(n, 5, D)).astype(np.float32)
        txt = rng.normal(size=(n, 4, D)).astype(np.float32)
        np.testing.assert_allclose(
            sharded.predict(img, txt), single.predict(img, txt), atol=1e-5
        )
    # ablation path rides the same sharded forward
    img = rng.normal(size=(3, 5, D)).astype(np.float32)
    txt = rng.normal(size=(3, 4, D)).astype(np.float32)
    np.testing.assert_allclose(
        sharded.predict(img, txt, ablate="image"),
        single.predict(img, txt, ablate="image"), atol=1e-5,
    )


def test_fusion_predictor_dp_tp_mesh_shards_weights(tmp_path):
    """tp=True on a (4,2) mesh: megatron-sharded weights, same probs; at
    least one kernel must actually live sharded across 'model'."""
    from multimodal_uncertainty_tpu.parallel.mesh import make_mesh

    model, variables, ckpt = _make_ckpt(tmp_path)
    single = FusionPredictor(
        model, ckpt, template_variables=variables, pad_multiple=8,
        batch_buckets=(4,),
    )
    mesh = make_mesh(8, model_parallel=2)
    sharded = FusionPredictor(
        model, ckpt, template_variables=variables, pad_multiple=8,
        batch_buckets=(4,), mesh=mesh, tp=True,
    )
    sharded_leaves = [
        leaf for leaf in jax.tree_util.tree_leaves(sharded.variables)
        if hasattr(leaf, "sharding")
        and any(ax == "model" for spec in [leaf.sharding.spec]
                for ax in spec if ax is not None)
    ]
    assert sharded_leaves, "tp=True sharded no weight over 'model'"
    rng = np.random.default_rng(4)
    img = rng.normal(size=(3, 5, D)).astype(np.float32)
    txt = rng.normal(size=(3, 4, D)).astype(np.float32)
    np.testing.assert_allclose(
        sharded.predict(img, txt), single.predict(img, txt), atol=1e-5
    )


def test_mmbt_predictor_on_dp_mesh_matches_single_device(tmp_path):
    """MMBT (BatchNorm stats + keep-mask ablations) serves on a DP mesh."""
    from multimodal_uncertainty_tpu.parallel.mesh import make_mesh
    from multimodal_uncertainty_tpu.serving import MMBTPredictor

    model, variables, ckpt = _make_mmbt_ckpt(tmp_path)
    single = MMBTPredictor(model, ckpt, template_variables=variables,
                           batch_buckets=(4,))
    mesh = make_mesh(8, model_parallel=1)
    sharded = MMBTPredictor(model, ckpt, template_variables=variables,
                            batch_buckets=(4,), mesh=mesh)
    rng = np.random.default_rng(5)
    n, lt = 3, 6
    txt = rng.integers(0, 120, size=(n, lt)).astype(np.int32)
    mask = np.ones((n, lt), np.int32)
    seg = np.ones((n, lt), np.int32)
    img = rng.normal(size=(n, 64, 64, 3)).astype(np.float32)
    np.testing.assert_allclose(
        sharded.predict(txt, mask, seg, img),
        single.predict(txt, mask, seg, img), atol=1e-5,
    )
    np.testing.assert_allclose(
        sharded.predict(txt, mask, seg, img, ablate="text"),
        single.predict(txt, mask, seg, img, ablate="text"), atol=1e-5,
    )


def test_vilt_predictor_on_dp_mesh_matches_single_device(tmp_path):
    """ViLT's dict batch shards via the prefix sharding on a DP mesh."""
    import dataclasses

    import jax.numpy as jnp

    from multimodal_uncertainty_tpu.models.vilt import (
        ViltConfig,
        ViltForImagesAndTextClassification,
    )
    from multimodal_uncertainty_tpu.parallel.mesh import make_mesh
    from multimodal_uncertainty_tpu.serving import ViltPredictor

    cfg = dataclasses.replace(
        ViltConfig.b32(), vocab_size=120, hidden_size=32, num_hidden_layers=1,
        num_attention_heads=2, intermediate_size=64, image_size=64,
        num_labels=3,
    )
    model = ViltForImagesAndTextClassification(config=cfg, attn_impl="xla")
    rng = np.random.default_rng(6)
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

    single = ViltPredictor(model, ckpt, template_variables=variables,
                           batch_buckets=(4,))
    mesh = make_mesh(8, model_parallel=1)
    sharded = ViltPredictor(model, ckpt, template_variables=variables,
                            batch_buckets=(4,), mesh=mesh)
    np.testing.assert_allclose(
        sharded.predict(batch), single.predict(batch), atol=1e-5
    )


def test_fusion_predictor_int8_on_mesh_matches_single_device(tmp_path):
    """Production config: int8 dynamic quantization + DP mesh — results
    equal the single-device int8 predictor (quant context traces inside
    the sharded forward)."""
    from multimodal_uncertainty_tpu.parallel.mesh import make_mesh

    model, variables, ckpt = _make_ckpt(tmp_path)
    single = FusionPredictor(
        model, ckpt, template_variables=variables, pad_multiple=8,
        batch_buckets=(4,), quantize="int8",
    )
    mesh = make_mesh(8, model_parallel=1)
    sharded = FusionPredictor(
        model, ckpt, template_variables=variables, pad_multiple=8,
        batch_buckets=(4,), quantize="int8", mesh=mesh,
    )
    rng = np.random.default_rng(7)
    img = rng.normal(size=(3, 5, D)).astype(np.float32)
    txt = rng.normal(size=(3, 4, D)).astype(np.float32)
    np.testing.assert_allclose(
        sharded.predict(img, txt), single.predict(img, txt), atol=1e-5
    )


def test_micro_batcher_backpressure_overloaded():
    """max_pending bounds the admission queue: floods raise Overloaded
    while accepted requests still complete; without the bound nothing
    changes."""
    import threading
    import time

    import pytest

    from multimodal_uncertainty_tpu.serving import MicroBatcher, Overloaded

    release = threading.Event()

    def slow_predict(samples):
        release.wait(timeout=10)
        return [s * 2 for s in samples]

    mb = MicroBatcher(slow_predict, max_batch=1, max_wait_ms=1,
                      max_pending=2)
    try:
        futs = [mb.submit(1)]
        time.sleep(0.05)  # collector claims it, enters slow_predict
        futs.append(mb.submit(2))
        futs.append(mb.submit(3))  # queue now holds 2 = max_pending
        with pytest.raises(Overloaded):
            mb.submit(4)
        release.set()
        assert sorted(f.result(timeout=10) for f in futs) == [2, 4, 6]
        # queue drained -> admission reopens
        assert mb.submit(5).result(timeout=10) == 10
    finally:
        release.set()
        mb.close()
