"""Serving: checkpoint -> jitted batched predictor.

The reference has no serving path (research scripts only); this module makes
trained checkpoints directly consumable for deployment-style inference:

* one jitted forward per padded shape bucket (bounded compile count),
* ensemble-mean probabilities (the eval-time head handling used everywhere),
* optional modality ablation via the masked forward (uncertainty probes at
  serving time — the framework's scientific capability as an inference
  feature).
"""
from __future__ import annotations

from contextlib import nullcontext
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_uncertainty_tpu.ops.quant import quantized
from multimodal_uncertainty_tpu.training.checkpoint import load_weights, restore_into


class Overloaded(RuntimeError):
    """Raised by :meth:`MicroBatcher.submit` when the admission queue is
    full (``max_pending``) — maps to HTTP 503 in the serving endpoint."""


def _quant_ctx(mode: Optional[str]):
    """Context entered inside the traced forward so Linear matmuls quantize
    (ops/quant.py). nullcontext when serving full-precision."""
    return quantized(mode) if mode else nullcontext()


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _bucket_for(n: int, buckets: Sequence[int], multiple: int) -> int:
    """Smallest bucket holding ``n``, rounded up to ``multiple`` (the mesh
    data-axis size, so sharded batches divide evenly); past the largest
    bucket, round to the lcm of bucket granularity and ``multiple``."""
    for b in buckets:
        if n <= b:
            return _round_up(b, multiple)
    top = buckets[-1]
    lcm = top * multiple // np.gcd(top, multiple)
    return _round_up(n, lcm)


def _mesh_shardings(mesh, tp: bool, variables):
    """Serving shardings over a device mesh: a variables sharding tree
    (params megatron-TP-sharded along 'model' when ``tp``, everything else
    replicated) and the batch sharding for array inputs/outputs.

    Returns ``(var_shardings, batch_sharding, device_variables)`` — the
    variables are committed to their shardings once here, so per-request
    dispatch moves only the batch."""
    from multimodal_uncertainty_tpu.parallel.sharding import (
        batch_sharding,
        param_shardings,
        replicated,
    )

    repl = replicated(mesh)
    if tp and mesh.shape.get("model", 1) > 1:
        var_shardings = {
            k: (param_shardings(v, mesh) if k == "params"
                else jax.tree_util.tree_map(lambda _: repl, v))
            for k, v in variables.items()
        }
    else:
        var_shardings = jax.tree_util.tree_map(lambda _: repl, variables)
    device_vars = jax.device_put(variables, var_shardings)
    return var_shardings, batch_sharding(mesh), device_vars


class FusionPredictor:
    """Batched predictor over a FlavaFusionTransformer checkpoint.

    ``mesh`` scales serving across chips: array inputs shard their batch
    dim over the mesh's 'data' axis (DP), and with ``tp=True`` the
    transformer weights additionally shard megatron-style over 'model' —
    the same layout the training path uses, so a v5e-8 serves one
    coalesced batch across all 8 chips. Batch buckets round up to a
    multiple of the data-axis size. On TPU meshes pass a model built with
    ``attn_impl='pallas_sharded'`` (as train.py auto-selects) so the fused
    kernels partition instead of forcing a gather."""

    def __init__(
        self,
        model,
        checkpoint_path: str,
        *,
        template_variables,
        pad_multiple: int = 32,
        batch_buckets: Sequence[int] = (8, 32, 128),
        quantize: Optional[str] = None,  # None | 'int8' | 'int8_weight'
        temperature: float = 1.0,  # analysis.calibration.fit_temperature
        mesh=None,
        tp: bool = False,
    ):
        model_sd, _ = load_weights(checkpoint_path)
        self.variables = restore_into(template_variables, model_sd)
        self.model = model
        self.pad_multiple = pad_multiple
        self.batch_buckets = sorted(batch_buckets)
        self.quantize = quantize
        # baked into every compiled batch bucket at trace time — retuning
        # means building a new predictor, not mutating this attribute
        self.temperature = temperature = float(temperature)
        self.batch_multiple = 1

        def _forward(variables, img, txt, img_mask, txt_mask):
            with _quant_ctx(quantize):
                logits = model.apply(
                    variables, (img, txt), train=False,
                    img_mask=img_mask, txt_mask=txt_mask,
                )
            # per-head tempering BEFORE the head average keeps every member
            # a proper distribution (analysis/calibration.py semantics)
            logits = logits.astype(jnp.float32) / temperature
            probs = jax.nn.softmax(logits, axis=-1)
            return probs.mean(axis=1)  # ensemble-mean over heads

        if mesh is None:
            self._forward = jax.jit(_forward)
        else:
            var_sh, batch_sh, self.variables = _mesh_shardings(
                mesh, tp, self.variables
            )
            self.batch_multiple = mesh.shape["data"]
            self._forward = jax.jit(
                _forward,
                in_shardings=(var_sh, batch_sh, batch_sh, batch_sh,
                              batch_sh),
                out_shardings=batch_sh,
            )

    def _bucket_batch(self, n: int) -> int:
        return _bucket_for(n, self.batch_buckets, self.batch_multiple)

    def predict(
        self,
        img: np.ndarray,
        txt: np.ndarray,
        *,
        img_lengths: Optional[np.ndarray] = None,
        txt_lengths: Optional[np.ndarray] = None,
        ablate: Optional[str] = None,  # None | 'image' | 'text'
    ) -> np.ndarray:
        """(N, L_i, D), (N, L_t, D) -> (N, C) ensemble-mean probabilities.

        Lengths (if given) mask padding; ``ablate`` drops a modality using the
        numerically-exact masked forward.
        """
        n = img.shape[0]
        nb = self._bucket_batch(n)
        li = _round_up(img.shape[1], self.pad_multiple)
        lt = _round_up(txt.shape[1], self.pad_multiple)

        img_p = np.zeros((nb, li, img.shape[2]), np.float32)
        txt_p = np.zeros((nb, lt, txt.shape[2]), np.float32)
        img_p[:n, : img.shape[1]] = img
        txt_p[:n, : txt.shape[1]] = txt

        pos_i = np.arange(li)[None, :]
        pos_t = np.arange(lt)[None, :]
        im_full = np.zeros((nb, li), bool)
        tm_full = np.zeros((nb, lt), bool)
        il = img_lengths if img_lengths is not None else np.full(n, img.shape[1])
        tl = txt_lengths if txt_lengths is not None else np.full(n, txt.shape[1])
        im_full[:n] = pos_i < np.asarray(il)[:, None]
        tm_full[:n] = pos_t < np.asarray(tl)[:, None]
        if ablate == "image":
            im_full[:] = False
        elif ablate == "text":
            tm_full[:] = False

        probs = self._forward(
            self.variables,
            jnp.asarray(img_p),
            jnp.asarray(txt_p),
            jnp.asarray(im_full),
            jnp.asarray(tm_full),
        )
        return np.asarray(probs)[:n]

    def predict_with_uncertainty(
        self, img: np.ndarray, txt: np.ndarray, **kw
    ) -> Tuple[np.ndarray, dict]:
        """Probabilities + modality-sensitivity diagnostics (|dp| against
        image-only / text-only ablations)."""
        if "ablate" in kw:
            raise ValueError(
                "predict_with_uncertainty computes its own ablations; "
                "pass ablate= to predict() instead"
            )
        full = self.predict(img, txt, **kw)
        img_only = self.predict(img, txt, ablate="text", **kw)
        txt_only = self.predict(img, txt, ablate="image", **kw)
        return full, {
            "confidence": full.max(-1),
            "image_sensitivity": np.abs(full - txt_only).max(-1),
            "text_sensitivity": np.abs(full - img_only).max(-1),
        }


class ViltPredictor:
    """Batched predictor over a ViLT checkpoint (processor batch dicts in,
    ensemble-free class probabilities out; modality ablation via the
    attention/pixel masks — text keeps its CLS, image keeps its CLS, same
    convention as the MMBT ablations)."""

    def __init__(self, model, checkpoint_path, *, template_variables,
                 batch_buckets: Sequence[int] = (8, 32),
                 quantize: Optional[str] = None,
                 temperature: float = 1.0,
                 mesh=None, tp: bool = False):
        model_vars, _ = load_weights(checkpoint_path)
        self.variables = restore_into(template_variables, model_vars)
        self.model = model
        self.batch_buckets = sorted(batch_buckets)
        self.quantize = quantize
        # baked at trace time (see FusionPredictor)
        self.temperature = temperature = float(temperature)
        self.batch_multiple = 1

        def _forward(variables, batch):
            with _quant_ctx(quantize):
                out = model.apply(variables, batch, train=False)
            logits = out.logits.astype(jnp.float32) / temperature
            return jax.nn.softmax(logits, axis=-1)

        if mesh is None:
            self._forward = jax.jit(_forward)
        else:
            var_sh, batch_sh, self.variables = _mesh_shardings(
                mesh, tp, self.variables
            )
            self.batch_multiple = mesh.shape["data"]
            # batch_sh is a pytree PREFIX for the whole batch dict
            self._forward = jax.jit(
                _forward, in_shardings=(var_sh, batch_sh),
                out_shardings=batch_sh,
            )

    def _bucket(self, n: int) -> int:
        return _bucket_for(n, self.batch_buckets, self.batch_multiple)

    def predict(self, batch: dict, *, ablate: Optional[str] = None):
        n = batch["input_ids"].shape[0]
        nb = self._bucket(n)

        def pad(a):
            out = np.zeros((nb,) + a.shape[1:], a.dtype)
            out[:n] = a
            return out

        b = {k: pad(np.asarray(v)) for k, v in batch.items()
             if v is not None and k != "labels"}
        if "pixel_mask" not in b:
            pv = b["pixel_values"]
            hw = pv.shape[-2:] if pv.shape[1] in (1, 3) else pv.shape[1:3]
            b["pixel_mask"] = np.ones((nb,) + hw, np.int64)
        if ablate == "text":  # keep only the text CLS token
            am = np.zeros_like(b["attention_mask"])
            am[:, 0] = 1
            b["attention_mask"] = am
        elif ablate == "image":  # drop all patches (image CLS stays)
            b["pixel_mask"] = np.zeros_like(b["pixel_mask"])
        probs = self._forward(
            self.variables, {k: jnp.asarray(v) for k, v in b.items()}
        )
        return np.asarray(probs)[:n]

    def predict_with_uncertainty(self, batch: dict):
        full = self.predict(batch)
        img_only = self.predict(batch, ablate="text")
        txt_only = self.predict(batch, ablate="image")
        return full, {
            "confidence": full.max(-1),
            "image_sensitivity": np.abs(full - txt_only).max(-1),
            "text_sensitivity": np.abs(full - img_only).max(-1),
        }


class MMBTPredictor:
    """Batched predictor over an MMBT (BERT+ResNet) checkpoint.

    Raw inputs: tokenized text (ids/mask/segment) + uint8 or float images.
    Modality ablation reuses the encoder's keep-masks (the same masked
    forward the robustness sweeps use), so image-only / text-only
    uncertainty probes cost one extra forward each."""

    def __init__(
        self,
        model,  # MultimodalBertClf
        checkpoint_path: str,
        *,
        template_variables,
        batch_buckets: Sequence[int] = (8, 32),
        quantize: Optional[str] = None,
        temperature: float = 1.0,
        mesh=None,
        tp: bool = False,
    ):
        model_vars, _ = load_weights(checkpoint_path)
        self.variables = restore_into(template_variables, model_vars)
        self.model = model
        self.batch_buckets = sorted(batch_buckets)
        self.quantize = quantize
        # baked at trace time (see FusionPredictor)
        self.temperature = temperature = float(temperature)
        self.batch_multiple = 1

        def _forward(variables, txt, mask, segment, img, keep_mask):
            with _quant_ctx(quantize):
                logits = model.apply(
                    variables, (txt, mask, segment, img), train=False,
                    seq_keep_mask=keep_mask,
                )
            logits = logits.astype(jnp.float32) / temperature
            return jax.nn.softmax(logits, axis=-1)

        if mesh is None:
            self._forward = jax.jit(_forward)
        else:
            var_sh, batch_sh, self.variables = _mesh_shardings(
                mesh, tp, self.variables
            )
            self.batch_multiple = mesh.shape["data"]
            from multimodal_uncertainty_tpu.parallel.sharding import (
                replicated,
            )

            # keep_mask is model-derived, identical per row: replicated
            self._forward = jax.jit(
                _forward,
                in_shardings=(var_sh, batch_sh, batch_sh, batch_sh,
                              batch_sh, replicated(mesh)),
                out_shardings=batch_sh,
            )

    def _bucket(self, n: int) -> int:
        return _bucket_for(n, self.batch_buckets, self.batch_multiple)

    def predict(self, txt, mask, segment, img, *,
                ablate: Optional[str] = None) -> np.ndarray:
        """(N, L) ids/mask/segment + (N, H, W, 3) image -> (N, C) probs."""
        n, lt = txt.shape
        nb = self._bucket(n)

        def pad(a):
            out = np.zeros((nb,) + a.shape[1:], a.dtype)
            out[:n] = a
            return out

        txt_p, mask_p, seg_p, img_p = map(pad, (txt, mask, segment, img))
        enc = self.model  # MultimodalBertClf; mask helpers on the encoder
        from multimodal_uncertainty_tpu.models.mmbt import MultimodalBertEncoder

        helper = MultimodalBertEncoder(
            self.model.config, self.model.num_image_embeds
        )
        if ablate == "text":
            keep = helper.img_only_mask(nb, lt)
        elif ablate == "image":
            keep = helper.txt_only_mask(nb, lt)
        else:
            keep = None
        del enc
        probs = self._forward(
            self.variables, jnp.asarray(txt_p), jnp.asarray(mask_p),
            jnp.asarray(seg_p), jnp.asarray(img_p),
            keep if keep is None else jnp.asarray(keep),
        )
        return np.asarray(probs)[:n]

    def predict_with_uncertainty(self, txt, mask, segment, img):
        full = self.predict(txt, mask, segment, img)
        img_only = self.predict(txt, mask, segment, img, ablate="text")
        txt_only = self.predict(txt, mask, segment, img, ablate="image")
        return full, {
            "confidence": full.max(-1),
            "image_sensitivity": np.abs(full - txt_only).max(-1),
            "text_sensitivity": np.abs(full - img_only).max(-1),
        }


# ---------------------------------------------------------------------------
# Dynamic micro-batching (serving runtime)
# ---------------------------------------------------------------------------


class MicroBatcher:
    """Dynamic request batching in front of a predictor.

    Concurrent callers submit single samples; a collector thread coalesces
    them into one batched ``predict_batch`` call — up to ``max_batch``
    samples, waiting at most ``max_wait_ms`` after the first arrival — then
    distributes per-sample results to the callers' futures. This amortizes
    per-dispatch latency (material on remote/tunneled backends) and rides
    the predictors' existing shape buckets, so the compiled-program count
    stays bounded no matter the request arrival pattern.

    ``predict_batch``: ``list[sample] -> sequence[result]`` (one result per
    sample, same order). Exceptions fail every request in that batch.

    Usage::

        mb = MicroBatcher(lambda xs: predictor.predict(np.stack(xs)), ...)
        fut = mb.submit(x)          # concurrent.futures.Future
        probs = mb(x)               # blocking convenience
        mb.close()
    """

    _CLOSE = object()  # queue sentinel: no submit/close race, no idle polling

    def __init__(self, predict_batch, *, max_batch: int = 32,
                 max_wait_ms: float = 5.0, max_pending: Optional[int] = None):
        import queue as _queue
        import threading as _threading

        self.predict_batch = predict_batch
        self.max_batch = max_batch
        self.max_wait_s = max_wait_ms / 1e3
        # backpressure: bound the admission queue so overload sheds load at
        # the door (Overloaded -> HTTP 503) instead of growing latency
        # without bound. None = unbounded (library/offline use).
        self.max_pending = max_pending
        self._q: "_queue.Queue" = _queue.Queue()
        self._pending = 0
        self._closed = _threading.Event()
        self._submit_lock = _threading.Lock()
        self._thread = _threading.Thread(target=self._collect, daemon=True)
        self._thread.start()

    def submit(self, sample):
        """Enqueue one sample; returns a concurrent.futures.Future.
        Raises :class:`Overloaded` when ``max_pending`` requests are
        already queued (admission control, not an error in the batch)."""
        from concurrent.futures import Future

        fut: Future = Future()
        # atomic closed-check + enqueue: every accepted request lands
        # BEFORE close()'s sentinel, so none is orphaned
        with self._submit_lock:
            if self._closed.is_set():
                raise RuntimeError("MicroBatcher is closed")
            if (self.max_pending is not None
                    and self._pending >= self.max_pending):
                raise Overloaded(
                    f"{self._pending} requests pending (max_pending="
                    f"{self.max_pending})"
                )
            self._pending += 1
            self._q.put((sample, fut))
        return fut

    def __call__(self, sample):
        return self.submit(sample).result()

    def close(self):
        """Stop the collector; requests accepted before close are still
        served (the sentinel travels the queue behind them)."""
        with self._submit_lock:
            already = self._closed.is_set()
            self._closed.set()
            if not already:
                self._q.put(self._CLOSE)
        self._thread.join()

    # -- collector ---------------------------------------------------------
    def _drain_remaining(self):
        """Serve any requests that raced past the closed-check and landed
        behind the sentinel, then exit."""
        import queue as _queue

        while True:
            batch = []
            while len(batch) < self.max_batch:
                try:
                    item = self._q.get_nowait()
                except _queue.Empty:
                    break
                if item is not self._CLOSE:
                    batch.append(item)
            if not batch:
                return
            self._serve(batch)

    def _serve(self, batch):
        # these items left the admission queue: free their pending slots
        # (bounds QUEUED requests; one in-flight batch rides on top)
        with self._submit_lock:
            self._pending -= len(batch)
        # claim the futures: cancelled ones (client gave up) drop out,
        # live ones can no longer be cancelled mid-flight
        samples, futures = [], []
        for s, f in batch:
            if f.set_running_or_notify_cancel():
                samples.append(s)
                futures.append(f)
        if not samples:
            return
        try:
            results = self.predict_batch(samples)
            if len(results) != len(samples):
                raise ValueError(
                    f"predict_batch returned {len(results)} results "
                    f"for {len(samples)} samples"
                )
        except BaseException as e:
            for f in futures:
                f.set_exception(e)
        else:
            for f, r in zip(futures, results):
                f.set_result(r)

    def _collect(self):
        import queue as _queue
        import time as _time

        while True:
            first = self._q.get()
            if first is self._CLOSE:
                self._drain_remaining()
                return
            batch = [first]
            deadline = _time.monotonic() + self.max_wait_s
            saw_close = False
            while len(batch) < self.max_batch:
                timeout = deadline - _time.monotonic()
                if timeout <= 0:
                    break
                try:
                    item = self._q.get(timeout=timeout)
                except _queue.Empty:
                    break
                if item is self._CLOSE:
                    saw_close = True
                    break
                batch.append(item)
            self._serve(batch)
            if saw_close:
                self._drain_remaining()
                return


def fusion_micro_batcher(predictor: "FusionPredictor", *, max_batch: int = 32,
                         max_wait_ms: float = 5.0,
                       max_pending=None,
                         uncertainty: bool = False) -> MicroBatcher:
    """MicroBatcher over a FusionPredictor for variable-length samples.

    Each sample is ``(img, txt)`` with shapes (L_i, D)/(L_t, D); the batch
    call pads to the max length in the coalesced batch (the predictor's
    pad_multiple bounds compile count) and passes true lengths so padding
    is masked. With ``uncertainty=True`` each result is
    ``(probs, {confidence, image_sensitivity, text_sensitivity})`` —
    the modality-ablation diagnostics served per sample (three masked
    forwards per coalesced batch, not per caller)."""

    def predict_batch(samples):
        n = len(samples)
        li = max(s[0].shape[0] for s in samples)
        lt = max(s[1].shape[0] for s in samples)
        d_img = samples[0][0].shape[-1]
        d_txt = samples[0][1].shape[-1]  # may differ (text_hidden_size)
        img = np.zeros((n, li, d_img), np.float32)
        txt = np.zeros((n, lt, d_txt), np.float32)
        il = np.zeros(n, np.int32)
        tl = np.zeros(n, np.int32)
        for i, (im, tx) in enumerate(samples):
            img[i, : im.shape[0]] = im
            txt[i, : tx.shape[0]] = tx
            il[i], tl[i] = im.shape[0], tx.shape[0]
        if uncertainty:
            probs, diag = predictor.predict_with_uncertainty(
                img, txt, img_lengths=il, txt_lengths=tl
            )
            return [
                (probs[i], {k: v[i] for k, v in diag.items()})
                for i in range(n)
            ]
        probs = predictor.predict(img, txt, img_lengths=il, txt_lengths=tl)
        return list(probs)

    return MicroBatcher(predict_batch, max_batch=max_batch,
                        max_wait_ms=max_wait_ms,
                        max_pending=max_pending)


def mmbt_micro_batcher(predictor: "MMBTPredictor", *, max_batch: int = 32,
                       max_wait_ms: float = 5.0,
                       max_pending=None,
                       pad_multiple: int = 32,
                       uncertainty: bool = False) -> MicroBatcher:
    """MicroBatcher over an MMBTPredictor. Each sample is
    ``(token_ids, segment, image)`` — the JsonlDataset row convention
    (variable-length text, (H, W, 3) image); text pads to the coalesced
    batch's max length rounded up to ``pad_multiple`` (bounds the compiled
    shape count), mask marks real tokens. ``uncertainty=True`` returns
    ``(probs, diag)`` per sample via the encoder keep-mask ablations
    (three forwards per coalesced batch)."""

    def predict_batch(samples):
        n = len(samples)
        lt = _round_up(max(len(s[0]) for s in samples), pad_multiple)
        txt = np.zeros((n, lt), np.int64)
        seg = np.zeros((n, lt), np.int64)
        mask = np.zeros((n, lt), np.int64)
        img = np.stack([s[2] for s in samples])
        for i, (ids, segment, _) in enumerate(samples):
            txt[i, : len(ids)] = ids
            seg[i, : len(ids)] = segment
            mask[i, : len(ids)] = 1
        if uncertainty:
            probs, diag = predictor.predict_with_uncertainty(
                txt, mask, seg, img
            )
            return [
                (probs[i], {k: v[i] for k, v in diag.items()})
                for i in range(n)
            ]
        return list(predictor.predict(txt, mask, seg, img))

    return MicroBatcher(predict_batch, max_batch=max_batch,
                        max_wait_ms=max_wait_ms,
                        max_pending=max_pending)


def vilt_micro_batcher(predictor: "ViltPredictor", *, max_batch: int = 32,
                       max_wait_ms: float = 5.0,
                       max_pending=None,
                       pad_multiple: int = 8,
                       uncertainty: bool = False) -> MicroBatcher:
    """MicroBatcher over a ViltPredictor. Each sample is a per-sample
    processor dict (``input_ids``/``attention_mask``/``token_type_ids``
    of length L, ``pixel_values`` (H, W, 3), optional ``pixel_mask``);
    text pads to the coalesced batch's max length rounded up to
    ``pad_multiple``."""

    text_keys = ("input_ids", "attention_mask", "token_type_ids")

    def predict_batch(samples):
        n = len(samples)
        lt = _round_up(
            max(len(s["input_ids"]) for s in samples), pad_multiple
        )
        batch = {}
        for k in text_keys:
            rows = np.zeros((n, lt), np.int64)
            for i, s in enumerate(samples):
                if k in s:
                    rows[i, : len(s[k])] = s[k]
            batch[k] = rows
        batch["pixel_values"] = np.stack(
            [np.asarray(s["pixel_values"]) for s in samples]
        )
        if any("pixel_mask" in s for s in samples):
            # mixed batches: samples without a mask get all-ones — never
            # DROP a provided mask (results must not depend on batch
            # companions)
            hw = batch["pixel_values"].shape[1:3]
            batch["pixel_mask"] = np.stack([
                np.asarray(s["pixel_mask"]) if "pixel_mask" in s
                else np.ones(hw, np.int64)
                for s in samples
            ])
        if uncertainty:
            probs, diag = predictor.predict_with_uncertainty(batch)
            return [
                (probs[i], {k: v[i] for k, v in diag.items()})
                for i in range(n)
            ]
        return list(predictor.predict(batch))

    return MicroBatcher(predict_batch, max_batch=max_batch,
                        max_wait_ms=max_wait_ms,
                        max_pending=max_pending)
