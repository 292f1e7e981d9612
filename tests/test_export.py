"""AOT-exported serving artifacts (jax.export): roundtrip + polymorphism."""
import os

import jax
import numpy as np
import pytest

from multimodal_uncertainty_tpu.export import (
    export_fusion_predictor,
    load_exported,
    save_exported,
    symbolic_batch_specs,
)
from multimodal_uncertainty_tpu.models import FlavaFusionTransformer
from multimodal_uncertainty_tpu.serving import FusionPredictor
from multimodal_uncertainty_tpu.training.checkpoint import save_weights

D = 32


def _make_pred(tmp_path, **kw):
    model = FlavaFusionTransformer(
        out_dim=2, num_classes=3, image_hidden_size=D, text_hidden_size=D,
        multimodal_hidden_size=D, multimodal_num_attention_heads=2,
        multimodal_num_hidden_layers=1, attn_impl="xla",
    )
    rng = np.random.default_rng(0)
    img = rng.normal(size=(2, 5, D)).astype(np.float32)
    txt = rng.normal(size=(2, 4, D)).astype(np.float32)
    variables = model.init(
        {"params": jax.random.key(0)}, (img, txt), train=False
    )
    ckpt = os.path.join(tmp_path, "model_best_val.pt")
    save_weights(variables, None, ckpt)
    return FusionPredictor(
        model, ckpt, template_variables=variables, pad_multiple=8,
        batch_buckets=(4, 16), **kw,
    )


def _padded_inputs(pred, img, txt):
    """Pad exactly like FusionPredictor.predict (full-length masks)."""
    n = img.shape[0]
    li, lt = 8, 8  # pad_multiple=8 over lengths 5/4
    img_p = np.zeros((n, li, D), np.float32)
    txt_p = np.zeros((n, lt, D), np.float32)
    img_p[:, : img.shape[1]] = img
    txt_p[:, : txt.shape[1]] = txt
    im = np.zeros((n, li), bool)
    tm = np.zeros((n, lt), bool)
    im[:, : img.shape[1]] = True
    tm[:, : txt.shape[1]] = True
    return img_p, txt_p, im, tm


def test_export_roundtrip_matches_predictor(tmp_path):
    pred = _make_pred(tmp_path)
    art = os.path.join(tmp_path, "artifact")
    export_fusion_predictor(pred, art, img_len=8, txt_len=8, embed_dim=D)
    assert {"fn.stablehlo", "weights.msgpack", "meta.json"} <= set(
        os.listdir(art)
    )

    loaded = load_exported(art)
    rng = np.random.default_rng(1)
    img = rng.normal(size=(3, 5, D)).astype(np.float32)
    txt = rng.normal(size=(3, 4, D)).astype(np.float32)
    direct = pred.predict(img, txt)
    probs = loaded(*_padded_inputs(pred, img, txt))
    np.testing.assert_allclose(probs, direct, atol=1e-5)
    assert loaded.meta["family"] == "flava_fusion"


def test_symbolic_batch_serves_multiple_sizes(tmp_path):
    """ONE exported program handles every batch size (no per-size export)."""
    pred = _make_pred(tmp_path)
    art = os.path.join(tmp_path, "artifact")
    export_fusion_predictor(pred, art, img_len=8, txt_len=8, embed_dim=D)
    loaded = load_exported(art)
    rng = np.random.default_rng(2)
    for n in (1, 3, 7):
        img = rng.normal(size=(n, 5, D)).astype(np.float32)
        txt = rng.normal(size=(n, 4, D)).astype(np.float32)
        probs = loaded(*_padded_inputs(pred, img, txt))
        assert probs.shape == (n, 3)
        np.testing.assert_allclose(
            probs, pred.predict(img, txt), atol=1e-5
        )


def test_symbolic_lengths_serve_any_padding(tmp_path):
    """symbolic_lengths=True: one program for every (batch, L_i, L_t)."""
    pred = _make_pred(tmp_path)
    art = os.path.join(tmp_path, "artifact_sym")
    export_fusion_predictor(
        pred, art, img_len=8, txt_len=8, embed_dim=D, symbolic_lengths=True
    )
    loaded = load_exported(art)
    assert loaded.meta["symbolic_lengths"] is True
    rng = np.random.default_rng(7)
    img = rng.normal(size=(2, 5, D)).astype(np.float32)
    txt = rng.normal(size=(2, 4, D)).astype(np.float32)
    direct = pred.predict(img, txt)
    for li, lt in ((8, 8), (16, 4), (5, 12)):
        img_p = np.zeros((2, li, D), np.float32)
        txt_p = np.zeros((2, lt, D), np.float32)
        img_p[:, :5] = img
        txt_p[:, :4] = txt
        im = np.zeros((2, li), bool)
        tm = np.zeros((2, lt), bool)
        im[:, :5] = True
        tm[:, :4] = True
        np.testing.assert_allclose(
            loaded(img_p, txt_p, im, tm), direct, atol=1e-5,
            err_msg=f"padding ({li},{lt})",
        )


def test_fixed_shape_export(tmp_path):
    pred = _make_pred(tmp_path)
    art = os.path.join(tmp_path, "artifact_fixed")
    export_fusion_predictor(
        pred, art, img_len=8, txt_len=8, embed_dim=D, symbolic_batch=False
    )
    loaded = load_exported(art)
    rng = np.random.default_rng(3)
    img = rng.normal(size=(1, 5, D)).astype(np.float32)
    txt = rng.normal(size=(1, 4, D)).astype(np.float32)
    np.testing.assert_allclose(
        loaded(*_padded_inputs(pred, img, txt)),
        pred.predict(img, txt), atol=1e-5,
    )
    # fixed-shape program rejects other batch sizes
    img2 = rng.normal(size=(2, 5, D)).astype(np.float32)
    txt2 = rng.normal(size=(2, 4, D)).astype(np.float32)
    with pytest.raises(Exception):
        loaded(*_padded_inputs(pred, img2, txt2))


def test_fixed_batch_kernel_export(tmp_path):
    """fixed_batch bakes the batch size + allow_tpu_kernels plumbing: the
    artifact serves padded-up batches via the micro-batcher and records
    the contract in meta. (On CPU the attention lowers to plain XLA so
    the disabled-safety-check path is a no-op; on TPU the same call baked
    in the Mosaic custom call — tools/bench_export.py measures it.)"""
    from multimodal_uncertainty_tpu.export import (
        fusion_artifact_micro_batcher,
    )

    pred = _make_pred(tmp_path)
    art = os.path.join(tmp_path, "artifact_kern")
    export_fusion_predictor(
        pred, art, img_len=8, txt_len=8, embed_dim=D,
        symbolic_batch=False, allow_tpu_kernels=True, fixed_batch=4,
    )
    loaded = load_exported(art)
    assert loaded.meta["fixed_batch"] == 4
    assert loaded.meta["tpu_kernels"] is True

    # micro-batcher pads a 2-sample coalesced batch up to the baked 4
    mb = fusion_artifact_micro_batcher(loaded, max_batch=16, max_wait_ms=5)
    try:
        rng = np.random.default_rng(11)
        s_img = rng.normal(size=(5, D)).astype(np.float32)
        s_txt = rng.normal(size=(4, D)).astype(np.float32)
        probs = mb((s_img, s_txt))
        direct = pred.predict(s_img[None], s_txt[None])[0]
        np.testing.assert_allclose(probs, direct, atol=1e-5)
    finally:
        mb.close()

    # symbolic shapes + kernels is a hard error, not a silent downgrade
    with pytest.raises(ValueError):
        export_fusion_predictor(
            pred, os.path.join(tmp_path, "bad"), img_len=8, txt_len=8,
            embed_dim=D, allow_tpu_kernels=True,
        )


def test_serve_time_temperature_and_export(tmp_path):
    """Predictor temperature= tempers per-head logits before the head
    average, and --export bakes the same T into the artifact."""
    from multimodal_uncertainty_tpu.ops.metrics import softmax_np

    pred_t = _make_pred(tmp_path, temperature=2.5)
    pred_1 = _make_pred(tmp_path)
    rng = np.random.default_rng(6)
    img = rng.normal(size=(2, 5, D)).astype(np.float32)
    txt = rng.normal(size=(2, 4, D)).astype(np.float32)
    p_t = pred_t.predict(img, txt)
    p_1 = pred_1.predict(img, txt)
    assert np.abs(p_t - p_1).max() > 1e-4  # T actually changes confidence
    # manual check: recover per-head logits from the model, temper, average
    import jax.numpy as jnp

    logits = pred_1.model.apply(
        pred_1.variables,
        (jnp.asarray(img), jnp.asarray(txt)), train=False,
    )
    manual = softmax_np(np.asarray(logits, np.float64) / 2.5).mean(axis=1)
    np.testing.assert_allclose(p_t, manual, atol=1e-5)
    # argmax unchanged by tempering
    np.testing.assert_array_equal(p_t.argmax(-1), p_1.argmax(-1))

    art = os.path.join(tmp_path, "artifact_t")
    export_fusion_predictor(pred_t, art, img_len=8, txt_len=8, embed_dim=D)
    loaded = load_exported(art)
    assert loaded.meta["temperature"] == 2.5
    np.testing.assert_allclose(
        loaded(*_padded_inputs(pred_t, img, txt)), p_t, atol=1e-5
    )


def test_export_quantized_int8(tmp_path):
    """Trace-time int8 quantization bakes into the exported program."""
    pred = _make_pred(tmp_path, quantize="int8")
    art = os.path.join(tmp_path, "artifact_q")
    export_fusion_predictor(pred, art, img_len=8, txt_len=8, embed_dim=D)
    loaded = load_exported(art)
    assert loaded.meta["quantize"] == "int8"
    rng = np.random.default_rng(4)
    img = rng.normal(size=(2, 5, D)).astype(np.float32)
    txt = rng.normal(size=(2, 4, D)).astype(np.float32)
    np.testing.assert_allclose(
        loaded(*_padded_inputs(pred, img, txt)),
        pred.predict(img, txt), atol=1e-5,
    )


def test_artifact_serving_over_http(tmp_path):
    """Model-code-free serving: artifact -> MicroBatcher -> HTTP endpoint,
    probs == the live predictor."""
    import json
    import urllib.request

    from multimodal_uncertainty_tpu.export import (
        fusion_artifact_micro_batcher,
    )
    from multimodal_uncertainty_tpu.server import (
        PredictionServer,
        fusion_request,
    )

    pred = _make_pred(tmp_path)
    art = os.path.join(tmp_path, "artifact")
    export_fusion_predictor(pred, art, img_len=8, txt_len=8, embed_dim=D)
    loaded = load_exported(art)
    mb = fusion_artifact_micro_batcher(loaded, max_batch=8, max_wait_ms=5)
    srv = PredictionServer(mb, fusion_request).start()
    try:
        rng = np.random.default_rng(5)
        s_img = rng.normal(size=(5, D)).astype(np.float32)
        s_txt = rng.normal(size=(4, D)).astype(np.float32)
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/v1/predict",
            data=json.dumps(
                {"img": s_img.tolist(), "txt": s_txt.tolist()}
            ).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=60) as r:
            out = json.loads(r.read())
        direct = pred.predict(s_img[None], s_txt[None])[0]
        np.testing.assert_allclose(out["probs"], direct, atol=1e-5)
        # over-length sample is rejected, not silently truncated
        with pytest.raises(ValueError):
            mb((np.zeros((9, D), np.float32), s_txt))
    finally:
        srv.close()
        mb.close()


def test_export_mmbt_predictor(tmp_path):
    from multimodal_uncertainty_tpu.export import export_mmbt_predictor
    from multimodal_uncertainty_tpu.models.bert import BertConfig
    from multimodal_uncertainty_tpu.models.mmbt import MultimodalBertClf
    from multimodal_uncertainty_tpu.serving import MMBTPredictor

    import jax.numpy as jnp

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
    ckpt = os.path.join(tmp_path, "mmbt_best_val.pt")
    save_weights(variables, None, ckpt)
    pred = MMBTPredictor(model, ckpt, template_variables=variables,
                         batch_buckets=(4,))

    art = os.path.join(tmp_path, "mmbt_artifact")
    export_mmbt_predictor(pred, art, txt_len=lt, image_size=64)
    loaded = load_exported(art)
    assert loaded.meta["family"] == "mmbt"
    for n in (1, 3):
        txt = rng.integers(0, 120, size=(n, lt)).astype(np.int32)
        mask = np.ones((n, lt), np.int32)
        seg = np.ones((n, lt), np.int32)
        img = rng.normal(size=(n, 64, 64, 3)).astype(np.float32)
        probs = loaded(txt, mask, seg, img)
        np.testing.assert_allclose(
            probs, pred.predict(txt, mask, seg, img), atol=1e-5
        )

    # fixed-batch kernel-path plumbing (mirrors the fusion variant)
    art_k = os.path.join(tmp_path, "mmbt_artifact_kern")
    export_mmbt_predictor(
        pred, art_k, txt_len=lt, image_size=64,
        symbolic_batch=False, allow_tpu_kernels=True, fixed_batch=2,
    )
    loaded_k = load_exported(art_k)
    assert loaded_k.meta["fixed_batch"] == 2
    assert loaded_k.meta["tpu_kernels"] is True
    txt = rng.integers(0, 120, size=(2, lt)).astype(np.int32)
    mask = np.ones((2, lt), np.int32)
    seg = np.ones((2, lt), np.int32)
    img = rng.normal(size=(2, 64, 64, 3)).astype(np.float32)
    np.testing.assert_allclose(
        loaded_k(txt, mask, seg, img),
        pred.predict(txt, mask, seg, img), atol=1e-5,
    )
    with pytest.raises(ValueError):
        export_mmbt_predictor(
            pred, os.path.join(tmp_path, "bad"), txt_len=lt, image_size=64,
            allow_tpu_kernels=True,
        )


def test_export_vilt_predictor(tmp_path):
    import dataclasses

    import jax.numpy as jnp

    from multimodal_uncertainty_tpu.export import export_vilt_predictor
    from multimodal_uncertainty_tpu.models.vilt import (
        ViltConfig,
        ViltForImagesAndTextClassification,
    )
    from multimodal_uncertainty_tpu.serving import ViltPredictor

    cfg = dataclasses.replace(
        ViltConfig.b32(), vocab_size=120, hidden_size=32,
        num_hidden_layers=1, num_attention_heads=2, intermediate_size=64,
        image_size=64, num_labels=3,
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

    art = os.path.join(tmp_path, "vilt_artifact")
    export_vilt_predictor(pred, art, txt_len=lt)
    loaded = load_exported(art)
    assert loaded.meta["family"] == "vilt"
    assert loaded.meta["image_size"] == 64
    probs = loaded(
        batch["input_ids"], batch["attention_mask"],
        batch["token_type_ids"], batch["pixel_values"],
        np.ones((n, 64, 64), np.int64),
    )
    np.testing.assert_allclose(probs, pred.predict(batch), atol=1e-5)
    # symbolic batch: a different size runs through the same program
    one = loaded(
        batch["input_ids"][:1], batch["attention_mask"][:1],
        batch["token_type_ids"][:1], batch["pixel_values"][:1],
        np.ones((1, 64, 64), np.int64),
    )
    np.testing.assert_allclose(one, probs[:1], atol=1e-5)


def test_save_exported_generic_fn(tmp_path):
    """The generic helper exports any fn(variables, *inputs)."""
    variables = {"w": np.eye(4, dtype=np.float32) * 2.0}

    def fn(v, x):
        return x @ v["w"]

    example = [np.ones((2, 4), np.float32)]
    art = os.path.join(tmp_path, "gen")
    save_exported(
        art, fn, variables, symbolic_batch_specs(example), meta={"k": "v"}
    )
    loaded = load_exported(art)
    x = np.arange(12, dtype=np.float32).reshape(3, 4)
    np.testing.assert_allclose(loaded(x), x * 2.0)
    assert loaded.meta["k"] == "v"
    assert loaded.meta["jax_version"] == jax.__version__


def test_artifact_micro_batchers_all_families(tmp_path):
    """artifact_micro_batcher dispatches on meta.family; mmbt and vilt
    artifacts serve model-code-free with results == the live predictors
    (text padded to the baked txt_len; over-length/misfit rejected)."""
    import dataclasses

    import jax.numpy as jnp

    from multimodal_uncertainty_tpu.export import (
        artifact_micro_batcher,
        export_mmbt_predictor,
        export_vilt_predictor,
    )
    from multimodal_uncertainty_tpu.models.bert import BertConfig
    from multimodal_uncertainty_tpu.models.mmbt import MultimodalBertClf
    from multimodal_uncertainty_tpu.models.vilt import (
        ViltConfig,
        ViltForImagesAndTextClassification,
    )
    from multimodal_uncertainty_tpu.serving import MMBTPredictor, ViltPredictor

    rng = np.random.default_rng(0)

    # --- mmbt ---
    cfg = BertConfig(vocab_size=120, hidden_size=32, num_hidden_layers=1,
                     num_attention_heads=2, intermediate_size=64,
                     max_position_embeddings=64)
    model = MultimodalBertClf(config=cfg, n_classes=4, num_image_embeds=3,
                              resnet_layers=(1, 1, 1, 1), attn_impl="xla")
    b, lt = 2, 8
    x = (jnp.asarray(rng.integers(0, 120, size=(b, lt))),
         jnp.ones((b, lt), jnp.int32), jnp.ones((b, lt), jnp.int32),
         jnp.asarray(rng.normal(size=(b, 64, 64, 3)).astype(np.float32)))
    variables = model.init({"params": jax.random.key(0)}, x, train=False)
    ckpt = os.path.join(tmp_path, "m.pt")
    save_weights(variables, None, ckpt)
    pred = MMBTPredictor(model, ckpt, template_variables=variables,
                         batch_buckets=(4,))
    art = os.path.join(tmp_path, "m_art")
    export_mmbt_predictor(pred, art, txt_len=lt, image_size=64)
    mb = artifact_micro_batcher(load_exported(art), max_batch=8)
    try:
        ids = rng.integers(0, 120, size=5).astype(np.int64)
        seg = np.ones(5, np.int64)
        img = rng.normal(size=(64, 64, 3)).astype(np.float32)
        got = mb((ids, seg, img))
        # live predictor with the same padded-to-lt text
        txt_p = np.zeros((1, lt), np.int64); txt_p[0, :5] = ids
        m_p = np.zeros((1, lt), np.int64); m_p[0, :5] = 1
        s_p = np.zeros((1, lt), np.int64); s_p[0, :5] = 1
        direct = pred.predict(txt_p * m_p, m_p, s_p, img[None])[0]
        np.testing.assert_allclose(got, direct, atol=1e-5)
        with pytest.raises(ValueError):
            mb((rng.integers(0, 120, size=lt + 1), np.ones(lt + 1), img))
    finally:
        mb.close()

    # --- vilt ---
    vcfg = dataclasses.replace(
        ViltConfig.b32(), vocab_size=120, hidden_size=32,
        num_hidden_layers=1, num_attention_heads=2, intermediate_size=64,
        image_size=64, num_labels=3,
    )
    vmodel = ViltForImagesAndTextClassification(config=vcfg, attn_impl="xla")
    batch = {
        "input_ids": rng.integers(0, 120, size=(2, lt)).astype(np.int64),
        "attention_mask": np.ones((2, lt), np.int64),
        "token_type_ids": np.zeros((2, lt), np.int64),
        "pixel_values": rng.normal(size=(2, 64, 64, 3)).astype(np.float32),
    }
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    vvars = vmodel.init({"params": jax.random.key(1)}, jb, train=False)
    vckpt = os.path.join(tmp_path, "v.pt")
    save_weights(vvars, None, vckpt)
    vpred = ViltPredictor(vmodel, vckpt, template_variables=vvars,
                          batch_buckets=(4,))
    vart = os.path.join(tmp_path, "v_art")
    export_vilt_predictor(vpred, vart, txt_len=lt)
    vmb = artifact_micro_batcher(load_exported(vart), max_batch=8)
    try:
        sample = {
            "input_ids": batch["input_ids"][0],
            "attention_mask": batch["attention_mask"][0],
            "token_type_ids": batch["token_type_ids"][0],
            "pixel_values": batch["pixel_values"][0],
        }
        got = vmb(sample)
        direct = vpred.predict(
            {k: v[:1] for k, v in batch.items()}
        )[0]
        np.testing.assert_allclose(got, direct, atol=1e-5)
    finally:
        vmb.close()

    with pytest.raises(ValueError):
        artifact_micro_batcher(
            type("L", (), {"meta": {"family": "nope"}})()
        )


def test_artifact_uncertainty_all_families(tmp_path):
    """Artifact-served uncertainty diagnostics == the live predictors'.
    Fusion/vilt run the ablations through their mask inputs; mmbt needs
    with_ablations=True (keep-mask becomes a program input) and rejects
    uncertainty mode on a full-forward-only artifact."""
    import dataclasses

    import jax.numpy as jnp

    from multimodal_uncertainty_tpu.export import (
        export_mmbt_predictor,
        export_vilt_predictor,
        fusion_artifact_micro_batcher,
        mmbt_artifact_micro_batcher,
        vilt_artifact_micro_batcher,
    )
    from multimodal_uncertainty_tpu.models.bert import BertConfig
    from multimodal_uncertainty_tpu.models.mmbt import MultimodalBertClf
    from multimodal_uncertainty_tpu.models.vilt import (
        ViltConfig,
        ViltForImagesAndTextClassification,
    )
    from multimodal_uncertainty_tpu.serving import MMBTPredictor, ViltPredictor

    rng = np.random.default_rng(0)

    # --- fusion ---
    pred = _make_pred(tmp_path)
    art = os.path.join(tmp_path, "f_art")
    export_fusion_predictor(pred, art, img_len=8, txt_len=8, embed_dim=D)
    mb = fusion_artifact_micro_batcher(load_exported(art), uncertainty=True)
    try:
        s_img = rng.normal(size=(5, D)).astype(np.float32)
        s_txt = rng.normal(size=(4, D)).astype(np.float32)
        probs, diag = mb((s_img, s_txt))
        direct, ddiag = pred.predict_with_uncertainty(
            s_img[None], s_txt[None]
        )
        np.testing.assert_allclose(probs, direct[0], atol=1e-5)
        for k in ddiag:
            np.testing.assert_allclose(diag[k], ddiag[k][0], atol=1e-5)
    finally:
        mb.close()

    # --- mmbt (with_ablations) ---
    cfg = BertConfig(vocab_size=120, hidden_size=32, num_hidden_layers=1,
                     num_attention_heads=2, intermediate_size=64,
                     max_position_embeddings=64)
    model = MultimodalBertClf(config=cfg, n_classes=4, num_image_embeds=3,
                              resnet_layers=(1, 1, 1, 1), attn_impl="xla")
    lt = 8
    x = (jnp.asarray(rng.integers(0, 120, size=(2, lt))),
         jnp.ones((2, lt), jnp.int32), jnp.ones((2, lt), jnp.int32),
         jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32)))
    variables = model.init({"params": jax.random.key(0)}, x, train=False)
    ckpt = os.path.join(tmp_path, "m.pt")
    save_weights(variables, None, ckpt)
    mpred = MMBTPredictor(model, ckpt, template_variables=variables,
                          batch_buckets=(4,))
    m_art = os.path.join(tmp_path, "m_art_abl")
    export_mmbt_predictor(mpred, m_art, txt_len=lt, image_size=64,
                          with_ablations=True)
    loaded_m = load_exported(m_art)
    assert loaded_m.meta["ablations"] is True
    mmb = mmbt_artifact_micro_batcher(loaded_m, uncertainty=True)
    try:
        ids = rng.integers(0, 120, size=lt).astype(np.int64)
        seg = np.ones(lt, np.int64)
        img = rng.normal(size=(64, 64, 3)).astype(np.float32)
        probs, diag = mmb((ids, seg, img))
        direct, ddiag = mpred.predict_with_uncertainty(
            ids[None], np.ones((1, lt), np.int64), seg[None], img[None]
        )
        np.testing.assert_allclose(probs, direct[0], atol=1e-5)
        for k in ddiag:
            np.testing.assert_allclose(diag[k], ddiag[k][0], atol=1e-5)
    finally:
        mmb.close()

    # full-forward-only artifact rejects uncertainty mode
    m_art2 = os.path.join(tmp_path, "m_art_plain")
    export_mmbt_predictor(mpred, m_art2, txt_len=lt, image_size=64)
    with pytest.raises(ValueError):
        mmbt_artifact_micro_batcher(load_exported(m_art2), uncertainty=True)

    # --- vilt ---
    vcfg = dataclasses.replace(
        ViltConfig.b32(), vocab_size=120, hidden_size=32,
        num_hidden_layers=1, num_attention_heads=2, intermediate_size=64,
        image_size=64, num_labels=3,
    )
    vmodel = ViltForImagesAndTextClassification(config=vcfg, attn_impl="xla")
    batch = {
        "input_ids": rng.integers(0, 120, size=(2, lt)).astype(np.int64),
        "attention_mask": np.ones((2, lt), np.int64),
        "token_type_ids": np.zeros((2, lt), np.int64),
        "pixel_values": rng.normal(size=(2, 64, 64, 3)).astype(np.float32),
    }
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    vvars = vmodel.init({"params": jax.random.key(1)}, jb, train=False)
    vckpt = os.path.join(tmp_path, "v.pt")
    save_weights(vvars, None, vckpt)
    vpred = ViltPredictor(vmodel, vckpt, template_variables=vvars,
                          batch_buckets=(4,))
    v_art = os.path.join(tmp_path, "v_art")
    export_vilt_predictor(vpred, v_art, txt_len=lt)
    vmb = vilt_artifact_micro_batcher(load_exported(v_art), uncertainty=True)
    try:
        sample = {k: batch[k][0] for k in batch}
        probs, diag = vmb(sample)
        direct, ddiag = vpred.predict_with_uncertainty(
            {k: v[:1] for k, v in batch.items()}
        )
        np.testing.assert_allclose(probs, direct[0], atol=1e-5)
        for k in ddiag:
            np.testing.assert_allclose(diag[k], ddiag[k][0], atol=1e-5)
    finally:
        vmb.close()


def test_artifact_integrity_check(tmp_path):
    """meta.json records blob sha256s; a tampered weights file fails the
    load instead of serving garbage, and verify=False overrides."""
    pred = _make_pred(tmp_path)
    art = os.path.join(tmp_path, "artifact_sum")
    export_fusion_predictor(pred, art, img_len=8, txt_len=8, embed_dim=D)
    loaded = load_exported(art)  # clean load verifies silently
    assert set(loaded.meta["sha256"]) == {"fn.stablehlo", "weights.msgpack"}

    with open(os.path.join(art, "weights.msgpack"), "r+b") as f:
        f.seek(20)
        b = f.read(1)
        f.seek(20)
        f.write(bytes([b[0] ^ 0xFF]))
    with pytest.raises(ValueError, match="integrity"):
        load_exported(art)
    with open(os.path.join(art, "weights.msgpack"), "r+b") as f:
        f.seek(20)
        f.write(b)  # undo the corruption

    # stale recorded hash (meta edited): rejected unless verify=False
    import json as _json

    meta_path = os.path.join(art, "meta.json")
    meta = _json.load(open(meta_path))
    meta["sha256"]["weights.msgpack"] = "0" * 64
    _json.dump(meta, open(meta_path, "w"))
    with pytest.raises(ValueError, match="integrity"):
        load_exported(art)
    load_exported(art, verify=False)  # explicit override still loads


class _RecordingArtifact:
    """Proxy over a loaded artifact recording the batch size of every
    program invocation (the shape the jit compiles for)."""

    def __init__(self, inner):
        self.inner = inner
        self.meta = inner.meta
        self.batch_sizes = []
        self.length_shapes = []

    def __call__(self, *inputs):
        self.batch_sizes.append(int(np.shape(inputs[0])[0]))
        self.length_shapes.append(tuple(np.shape(a)[1] for a in inputs[:2]))
        return self.inner(*inputs)


def test_artifact_batcher_pads_symbolic_batch_to_buckets(tmp_path):
    """ADVICE r3: symbolic-batch artifacts must NOT run at the exact
    coalesced size (every new arrival count would trigger a fresh XLA
    compile under the loader's jit) — they pad to serving-style buckets
    and slice back."""
    from multimodal_uncertainty_tpu.export import fusion_artifact_micro_batcher

    pred = _make_pred(tmp_path)
    art = os.path.join(tmp_path, "artifact_buckets")
    export_fusion_predictor(pred, art, img_len=8, txt_len=8, embed_dim=D)
    rec = _RecordingArtifact(load_exported(art))
    mb = fusion_artifact_micro_batcher(rec, batch_buckets=(4, 8))
    try:
        rng = np.random.default_rng(21)
        samples = [
            (rng.normal(size=(5, D)).astype(np.float32),
             rng.normal(size=(4, D)).astype(np.float32))
            for _ in range(7)
        ]
        # three distinct arrival counts -> ONE program shape (bucket 4)
        for k in (1, 2, 3):
            out = mb.predict_batch(samples[:k])
            assert len(out) == k
        assert rec.batch_sizes == [4, 4, 4]
        # larger coalesced batch moves to the next bucket, results correct
        out = mb.predict_batch(samples)
        assert rec.batch_sizes[-1] == 8
        direct = pred.predict(
            np.stack([s[0] for s in samples]),
            np.stack([s[1] for s in samples]),
        )
        np.testing.assert_allclose(np.stack(out), direct, atol=1e-5)
    finally:
        mb.close()


def test_artifact_batcher_symbolic_lengths_accepts_long_samples(tmp_path):
    """ADVICE r3: with symbolic_lengths=True the baked img_len/txt_len are
    documentation-only — samples LONGER than them must serve, padded to
    the coalesced batch's max lengths (rounded to pad_multiple)."""
    from multimodal_uncertainty_tpu.export import fusion_artifact_micro_batcher

    pred = _make_pred(tmp_path)
    art = os.path.join(tmp_path, "artifact_symlen")
    export_fusion_predictor(
        pred, art, img_len=8, txt_len=8, embed_dim=D, symbolic_lengths=True
    )
    rec = _RecordingArtifact(load_exported(art))
    mb = fusion_artifact_micro_batcher(rec, batch_buckets=(4,), pad_multiple=8)
    try:
        rng = np.random.default_rng(22)
        long_img = rng.normal(size=(13, D)).astype(np.float32)  # > baked 8
        long_txt = rng.normal(size=(9, D)).astype(np.float32)   # > baked 8
        (probs,) = mb.predict_batch([(long_img, long_txt)])
        assert probs.shape == (3,)
        assert rec.length_shapes[-1] == (16, 16)  # rounded up, not baked
        direct = pred.predict(long_img[None], long_txt[None])[0]
        np.testing.assert_allclose(probs, direct, atol=1e-5)
    finally:
        mb.close()

    # fixed-length artifacts still reject over-long samples
    art2 = os.path.join(tmp_path, "artifact_fixedlen")
    export_fusion_predictor(pred, art2, img_len=8, txt_len=8, embed_dim=D)
    mb2 = fusion_artifact_micro_batcher(load_exported(art2))
    try:
        with pytest.raises(Exception, match="exceeds"):
            mb2.predict_batch([(long_img, long_txt)])
    finally:
        mb2.close()


def test_predictor_temperature_is_baked_at_trace_time(tmp_path):
    """serving ADVICE r3: temperature is captured at __init__ — mutating
    predictor.temperature afterwards must not change results (no
    inconsistent per-bucket tempering)."""
    pred = _make_pred(tmp_path, temperature=2.5)
    rng = np.random.default_rng(23)
    img = rng.normal(size=(2, 5, D)).astype(np.float32)
    txt = rng.normal(size=(2, 4, D)).astype(np.float32)
    before = pred.predict(img, txt)
    pred.temperature = 0.1  # post-hoc mutation: a no-op by contract
    np.testing.assert_array_equal(pred.predict(img, txt), before)
