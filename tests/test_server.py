"""HTTP serving front end (server.py): routing, coalescing, errors.

Layer split mirrors the code: the HTTP layer is tested against a fake
batcher (fast, no device), then one integration case drives
HTTP -> MicroBatcher -> FusionPredictor end to end and checks the probs
match a direct predictor call.
"""
import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

from multimodal_uncertainty_tpu.server import PredictionServer, fusion_request


def _post(port, path, payload, timeout=30):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return r.status, json.loads(r.read())


def _get(port, path, timeout=10):
    with urllib.request.urlopen(
        f"http://127.0.0.1:{port}{path}", timeout=timeout
    ) as r:
        return r.status, json.loads(r.read())


def test_http_layer_with_fake_batcher():
    calls = []

    def fake_batcher(sample):
        calls.append(sample)
        img, txt = sample
        return np.asarray([float(img.sum()), float(txt.sum())])

    srv = PredictionServer(fake_batcher, fusion_request).start()
    try:
        payload = {"img": [[1.0, 2.0]], "txt": [[3.0, 4.0], [5.0, 6.0]]}
        status, out = _post(srv.port, "/v1/predict", payload)
        assert status == 200
        np.testing.assert_allclose(out["probs"], [3.0, 18.0])

        status, health = _get(srv.port, "/healthz")
        assert status == 200 and health["status"] == "ok"
        assert health["requests"] == 1

        status, stats = _get(srv.port, "/statz")
        assert stats["requests"] == 1 and stats["errors"] == 0
        assert stats["mean_ms"] > 0
    finally:
        srv.close()


def test_http_error_codes():
    srv = PredictionServer(lambda s: s, fusion_request).start()
    try:
        # missing keys -> 400
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(srv.port, "/v1/predict", {"img": [[1.0]]})
        assert e.value.code == 400
        # wrong rank -> 400 (decoder validation)
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(srv.port, "/v1/predict", {"img": [1.0], "txt": [[1.0]]})
        assert e.value.code == 400
        # unknown path -> 404
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(srv.port, "/nope", {})
        assert e.value.code == 404
        _, stats = _get(srv.port, "/statz")
        assert stats["errors"] == 2  # 404s aren't predictor errors
    finally:
        srv.close()

    def boom(sample):
        raise RuntimeError("device on fire")

    srv2 = PredictionServer(boom, fusion_request).start()
    try:
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(srv2.port, "/v1/predict", {"img": [[1.0]], "txt": [[1.0]]})
        assert e.value.code == 500
    finally:
        srv2.close()


def test_concurrent_requests_coalesce():
    """Concurrent HTTP callers land in one (or few) coalesced batch."""
    from multimodal_uncertainty_tpu.serving import MicroBatcher

    batch_sizes = []

    def predict_batch(samples):
        batch_sizes.append(len(samples))
        return [np.asarray([s[0].sum()]) for s in samples]

    mb = MicroBatcher(predict_batch, max_batch=16, max_wait_ms=50)
    srv = PredictionServer(mb, fusion_request).start()
    try:
        results = {}

        def call(i):
            payload = {"img": [[float(i)]], "txt": [[0.0]]}
            _, out = _post(srv.port, "/v1/predict", payload)
            results[i] = out["probs"][0]

        threads = [threading.Thread(target=call, args=(i,)) for i in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert results == {i: float(i) for i in range(8)}
        # 8 concurrent callers served in fewer dispatches than requests
        assert sum(batch_sizes) == 8 and len(batch_sizes) < 8
    finally:
        srv.close()
        mb.close()


def test_end_to_end_fusion_predictor(tmp_path):
    import jax

    from multimodal_uncertainty_tpu.models import FlavaFusionTransformer
    from multimodal_uncertainty_tpu.serving import (
        FusionPredictor,
        fusion_micro_batcher,
    )
    from multimodal_uncertainty_tpu.training.checkpoint import save_weights

    D = 32
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
    ckpt = str(tmp_path / "model_best_val.pt")
    save_weights(variables, None, ckpt)
    pred = FusionPredictor(
        model, ckpt, template_variables=variables, pad_multiple=8,
        batch_buckets=(4, 16),
    )
    mb = fusion_micro_batcher(pred, max_batch=8, max_wait_ms=5)
    srv = PredictionServer(mb, fusion_request).start()
    try:
        s_img = rng.normal(size=(5, D)).astype(np.float32)
        s_txt = rng.normal(size=(4, D)).astype(np.float32)
        _, out = _post(
            srv.port, "/v1/predict",
            {"img": s_img.tolist(), "txt": s_txt.tolist()},
        )
        direct = pred.predict(s_img[None], s_txt[None])[0]
        np.testing.assert_allclose(out["probs"], direct, atol=1e-5)
        np.testing.assert_allclose(np.sum(out["probs"]), 1.0, atol=1e-5)
    finally:
        srv.close()
        mb.close()


def test_mmbt_and_vilt_request_decoders():
    from multimodal_uncertainty_tpu.server import mmbt_request, vilt_request

    ids, seg, img = mmbt_request({
        "token_ids": [1, 2, 3], "segment": [1, 1, 1],
        "image": np.zeros((8, 8, 3)).tolist(),
    })
    assert ids.shape == (3,) and seg.dtype == np.int64
    assert img.shape == (8, 8, 3) and img.dtype == np.float32
    with pytest.raises(ValueError):
        mmbt_request({"token_ids": [1], "segment": [1, 1],
                      "image": np.zeros((8, 8, 3)).tolist()})
    with pytest.raises(ValueError):
        mmbt_request({"token_ids": [1], "segment": [1],
                      "image": np.zeros((8, 8)).tolist()})

    s = vilt_request({
        "input_ids": [101, 5, 102], "attention_mask": [1, 1, 1],
        "pixel_values": np.zeros((4, 4, 3)).tolist(),
        "pixel_mask": np.ones((4, 4)).tolist(),
    })
    assert s["input_ids"].shape == (3,)
    assert s["pixel_values"].shape == (4, 4, 3)
    assert s["pixel_mask"].dtype == np.int64
    assert "token_type_ids" not in s  # optional keys only when provided
    with pytest.raises(ValueError):
        vilt_request({"input_ids": [1]})  # no pixels


def test_body_size_limit():
    srv = PredictionServer(
        lambda s: s, fusion_request, max_body_bytes=1024
    ).start()
    try:
        big = {"img": [[0.0] * 300] * 10, "txt": [[0.0]]}
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(srv.port, "/v1/predict", big)
        assert e.value.code == 413
    finally:
        srv.close()


def test_uncertainty_over_http(tmp_path):
    """--serve --uncertainty: per-sample modality-sensitivity diagnostics
    ride the HTTP response and match the direct predictor call."""
    import jax

    from multimodal_uncertainty_tpu.models import FlavaFusionTransformer
    from multimodal_uncertainty_tpu.serving import (
        FusionPredictor,
        fusion_micro_batcher,
    )
    from multimodal_uncertainty_tpu.server import uncertainty_result
    from multimodal_uncertainty_tpu.training.checkpoint import save_weights

    D = 32
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
    ckpt = str(tmp_path / "model_best_val.pt")
    save_weights(variables, None, ckpt)
    pred = FusionPredictor(
        model, ckpt, template_variables=variables, pad_multiple=8,
        batch_buckets=(4,),
    )
    mb = fusion_micro_batcher(pred, max_batch=4, max_wait_ms=5,
                              uncertainty=True)
    srv = PredictionServer(mb, fusion_request,
                           encode_result=uncertainty_result).start()
    try:
        s_img = rng.normal(size=(5, D)).astype(np.float32)
        s_txt = rng.normal(size=(4, D)).astype(np.float32)
        _, out = _post(
            srv.port, "/v1/predict",
            {"img": s_img.tolist(), "txt": s_txt.tolist()},
        )
        probs, diag = pred.predict_with_uncertainty(
            s_img[None], s_txt[None]
        )
        np.testing.assert_allclose(out["probs"], probs[0], atol=1e-5)
        for k in ("confidence", "image_sensitivity", "text_sensitivity"):
            assert k in out
            np.testing.assert_allclose(out[k], float(diag[k][0]), atol=1e-5)
    finally:
        srv.close()
        mb.close()


def test_overloaded_maps_to_503():
    """MicroBatcher admission-control rejections surface as HTTP 503."""
    from multimodal_uncertainty_tpu.serving import Overloaded

    def reject(sample):
        raise Overloaded("2 requests pending (max_pending=2)")

    srv = PredictionServer(reject, fusion_request).start()
    try:
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(srv.port, "/v1/predict", {"img": [[1.0]], "txt": [[1.0]]})
        assert e.value.code == 503
        assert "overloaded" in json.loads(e.value.read())["error"]
    finally:
        srv.close()


def test_statz_exposes_backpressure():
    """/statz reports queued-request count and the admission bound."""
    from multimodal_uncertainty_tpu.serving import MicroBatcher

    mb = MicroBatcher(lambda xs: [x for x in xs], max_batch=4,
                      max_wait_ms=1, max_pending=7)
    srv = PredictionServer(mb, fusion_request).start()
    try:
        _post(srv.port, "/v1/predict", {"img": [[1.0]], "txt": [[1.0]]})
        _, stats = _get(srv.port, "/statz")
        assert stats["max_pending"] == 7
        assert stats["pending"] == 0  # drained
    finally:
        srv.close()
        mb.close()
