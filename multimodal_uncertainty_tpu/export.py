"""AOT-exported serving artifacts (``jax.export``).

The reference deploys nothing (research scripts only; SURVEY.md §1 lists no
serving layer). Production TPU serving wants a **model-code-free** artifact:
a serialized StableHLO program plus a weights blob that any process with jax
installed can load and run — no model classes, no flax modules, no framework
import, stable across refactors of the Python model code. ``jax.export``
provides exactly this; this module packages it as a directory artifact:

    artifact/
      fn.stablehlo     serialized Exported (StableHLO + calling convention)
      weights.msgpack  plain pytree of arrays (msgpack_restore needs no
                       template -> loading requires NO model classes)
      meta.json        input signature, platforms, jax version

Two extras beyond a plain ``jax.export.export``:

* **Symbolic batch**: the default exports with a polymorphic leading batch
  dim (``jax.export.symbolic_shape``), so ONE artifact serves every batch
  size with no per-size re-EXPORT. Note what that does and doesn't buy:
  the loaded program still XLA-compiles once per concrete input shape it
  is called with (symbolic export removes the need to re-run the Python
  exporter, not per-shape compilation), so the artifact micro-batchers
  below pad coalesced batches to serving-style buckets to keep the
  compile count bounded. Requires the XLA attention path (the Pallas
  kernels' grids are specialized on concrete batch blocks); pass
  ``symbolic_batch=False`` to export a fixed-shape kernel-path program.
* **Multi-platform**: ``platforms=("cpu", "tpu")`` lowers one artifact that
  runs on both — export on a CPU build box, serve on TPU.
"""
from __future__ import annotations

import json
import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

_FN_FILE = "fn.stablehlo"
_WEIGHTS_FILE = "weights.msgpack"
_META_FILE = "meta.json"


def save_exported(
    path: str,
    fn,
    variables,
    input_specs: Sequence[jax.ShapeDtypeStruct],
    *,
    platforms: Optional[Sequence[str]] = None,
    meta: Optional[dict] = None,
    allow_tpu_kernels: bool = False,
) -> None:
    """Export ``fn(variables, *inputs)`` and write the directory artifact.

    ``input_specs`` are ShapeDtypeStructs for the non-variable inputs; shapes
    may contain symbolic dims (see :func:`symbolic_batch_specs`).

    ``allow_tpu_kernels=True`` permits the Mosaic ``tpu_custom_call`` in the
    exported program, so fixed-shape artifacts can bake the fused Pallas
    attention path (jax.export rejects non-portable custom calls by
    default). Such artifacts are TPU-only and tied to the compiler
    generation that serialized them — the trade for serving at live-kernel
    speed; ``meta.json`` records ``tpu_kernels: true`` so loaders can warn.
    """
    import hashlib

    os.makedirs(path, exist_ok=True)
    var_specs = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(np.shape(a), jnp.asarray(a).dtype),
        variables,
    )
    disabled = (
        [jax.export.DisabledSafetyCheck.custom_call("tpu_custom_call")]
        if allow_tpu_kernels
        else []
    )
    exported = jax.export.export(
        jax.jit(fn),
        platforms=tuple(platforms) if platforms else None,
        disabled_checks=disabled,
    )(var_specs, *input_specs)
    fn_bytes = exported.serialize()
    with open(os.path.join(path, _FN_FILE), "wb") as f:
        f.write(fn_bytes)
    host_vars = jax.tree_util.tree_map(np.asarray, variables)
    weight_bytes = serialization.msgpack_serialize(host_vars)
    with open(os.path.join(path, _WEIGHTS_FILE), "wb") as f:
        f.write(weight_bytes)
    record = {
        "jax_version": jax.__version__,
        "platforms": list(exported.platforms),
        "inputs": [
            {"shape": [str(d) for d in s.shape], "dtype": str(s.dtype)}
            for s in input_specs
        ],
        # integrity: a loader can detect a corrupt or mixed-up artifact
        # (wrong weights next to a program) before serving garbage
        "sha256": {
            _FN_FILE: hashlib.sha256(fn_bytes).hexdigest(),
            _WEIGHTS_FILE: hashlib.sha256(weight_bytes).hexdigest(),
        },
        **(meta or {}),
    }
    with open(os.path.join(path, _META_FILE), "w") as f:
        json.dump(record, f, indent=2)


def symbolic_batch_specs(
    example_inputs: Sequence[np.ndarray], *, dim: str = "b"
) -> list:
    """ShapeDtypeStructs matching the examples with a shared symbolic
    leading dim — one exported program for every batch size."""
    (b,) = jax.export.symbolic_shape(dim)
    return [
        jax.ShapeDtypeStruct((b,) + np.shape(a)[1:], jnp.asarray(a).dtype)
        for a in example_inputs
    ]


class ExportedPredictor:
    """A loaded artifact: ``__call__(*inputs) -> np.ndarray``.

    Loading touches NO model code — just the StableHLO bytes and the plain
    weights pytree."""

    def __init__(self, exported, variables, meta: dict):
        self.exported = exported
        # Device-commit the weights ONCE: the msgpack restore yields numpy
        # arrays, and passing those to a jit re-uploads every weight on
        # EVERY call (measured 28x serving slowdown before this line —
        # invisible on a fast PCIe host, glaring on a slow link).
        self.variables = jax.tree_util.tree_map(jnp.asarray, variables)
        self.meta = meta
        self._call = jax.jit(exported.call)

    def __call__(self, *inputs):
        out = self._call(self.variables, *(jnp.asarray(a) for a in inputs))
        return jax.tree_util.tree_map(np.asarray, out)


def load_exported(path: str, *, verify: bool = True) -> ExportedPredictor:
    """``verify=True`` checks the meta.json sha256 of both blobs (written
    by every exporter) — a corrupt download or mismatched weights file
    fails here instead of serving garbage."""
    import hashlib

    with open(os.path.join(path, _FN_FILE), "rb") as f:
        fn_bytes = f.read()
    with open(os.path.join(path, _WEIGHTS_FILE), "rb") as f:
        weight_bytes = f.read()
    with open(os.path.join(path, _META_FILE)) as f:
        meta = json.load(f)
    if verify and "sha256" in meta:
        for name, blob in ((_FN_FILE, fn_bytes), (_WEIGHTS_FILE, weight_bytes)):
            want = meta["sha256"].get(name)
            got = hashlib.sha256(blob).hexdigest()
            if want is not None and got != want:
                raise ValueError(
                    f"artifact integrity check failed for {name}: "
                    f"sha256 {got} != recorded {want} (pass verify=False "
                    f"to load anyway)"
                )
    exported = jax.export.deserialize(fn_bytes)
    variables = serialization.msgpack_restore(weight_bytes)
    if meta.get("tpu_kernels") and jax.default_backend() not in ("tpu",):
        import logging

        logging.getLogger(__name__).warning(
            "artifact %s was exported with TPU Pallas kernels allowed "
            "(tpu_custom_call) but the current backend is %s — calls will "
            "fail if the program contains the kernels; re-export without "
            "allow_tpu_kernels for a portable artifact",
            path, jax.default_backend(),
        )
    return ExportedPredictor(exported, variables, meta)


def export_mmbt_predictor(
    predictor,
    path: str,
    *,
    txt_len: int,
    image_size: int = 224,
    symbolic_batch: bool = True,
    platforms: Optional[Sequence[str]] = None,
    allow_tpu_kernels: bool = False,
    fixed_batch: int = 1,
    with_ablations: bool = False,
) -> None:
    """Export a :class:`serving.MMBTPredictor`'s full-input forward
    ``(txt_ids, mask, segment, img) -> probs``.
    ``allow_tpu_kernels``/``fixed_batch`` as in
    :func:`export_fusion_predictor` (fixed-shape kernel-path artifact).

    ``with_ablations=True`` adds a boolean ``keep_mask`` input over the
    concatenated image+text sequence (the encoder's ``seq_keep_mask``),
    so the artifact can run the image-only / text-only uncertainty
    ablations model-code-free (pass all-True for the full forward);
    meta records ``ablations`` + ``num_image_embeds`` so the artifact
    micro-batcher can build the masks itself."""
    if allow_tpu_kernels and symbolic_batch:
        raise ValueError("allow_tpu_kernels requires symbolic_batch=False")
    nb = 1 if symbolic_batch else int(fixed_batch)
    n_img_tok = int(predictor.model.num_image_embeds) + 2
    example = [
        np.zeros((nb, txt_len), np.int32),
        np.ones((nb, txt_len), np.int32),
        np.ones((nb, txt_len), np.int32),
        np.zeros((nb, image_size, image_size, 3), np.float32),
    ]
    if with_ablations:
        example.append(np.ones((nb, n_img_tok + txt_len), bool))
    if symbolic_batch:
        specs = symbolic_batch_specs(example)
    else:
        specs = [
            jax.ShapeDtypeStruct(np.shape(a), jnp.asarray(a).dtype)
            for a in example
        ]
    model = predictor.model
    quantize = predictor.quantize
    temperature = float(getattr(predictor, "temperature", 1.0))

    def fn(variables, txt, mask, segment, img, *keep):
        from multimodal_uncertainty_tpu.serving import _quant_ctx

        with _quant_ctx(quantize):
            logits = model.apply(
                variables, (txt, mask, segment, img), train=False,
                seq_keep_mask=(keep[0] if keep else None),
            )
        return jax.nn.softmax(
            logits.astype(jnp.float32) / temperature, axis=-1
        )

    save_exported(
        path, fn, predictor.variables, specs, platforms=platforms,
        allow_tpu_kernels=allow_tpu_kernels,
        meta={
            "family": "mmbt",
            "temperature": temperature,
            "txt_len": txt_len,
            "image_size": image_size,
            "fixed_batch": (None if symbolic_batch else int(fixed_batch)),
            "quantize": quantize,
            "tpu_kernels": allow_tpu_kernels,
            "ablations": with_ablations,
            "num_image_embeds": int(predictor.model.num_image_embeds),
            "outputs": "class probabilities",
        },
    )


def export_vilt_predictor(
    predictor,
    path: str,
    *,
    txt_len: int,
    image_size: Optional[int] = None,  # defaults to the model config's
    pixel_dtype=np.float32,  # processor-normalized floats (uint8 also works)
    symbolic_batch: bool = True,
    platforms: Optional[Sequence[str]] = None,
    allow_tpu_kernels: bool = False,
    fixed_batch: int = 1,
) -> None:
    """Export a :class:`serving.ViltPredictor`'s forward
    ``(input_ids, attention_mask, token_type_ids, pixel_values,
    pixel_mask) -> probs``. ``allow_tpu_kernels``/``fixed_batch`` as in
    :func:`export_fusion_predictor`."""
    if allow_tpu_kernels and symbolic_batch:
        raise ValueError("allow_tpu_kernels requires symbolic_batch=False")
    size = image_size or predictor.model.config.image_size
    nb = 1 if symbolic_batch else int(fixed_batch)
    example = [
        np.zeros((nb, txt_len), np.int64),
        np.ones((nb, txt_len), np.int64),
        np.zeros((nb, txt_len), np.int64),
        np.zeros((nb, size, size, 3), pixel_dtype),
        np.ones((nb, size, size), np.int64),
    ]
    if symbolic_batch:
        specs = symbolic_batch_specs(example)
    else:
        specs = [
            jax.ShapeDtypeStruct(np.shape(a), jnp.asarray(a).dtype)
            for a in example
        ]
    model = predictor.model
    quantize = predictor.quantize
    temperature = float(getattr(predictor, "temperature", 1.0))

    def fn(variables, ids, am, tt, pv, pm):
        from multimodal_uncertainty_tpu.serving import _quant_ctx

        batch = {
            "input_ids": ids,
            "attention_mask": am,
            "token_type_ids": tt,
            "pixel_values": pv,
            "pixel_mask": pm,
        }
        with _quant_ctx(quantize):
            out = model.apply(variables, batch, train=False)
        return jax.nn.softmax(
            out.logits.astype(jnp.float32) / temperature, axis=-1
        )

    save_exported(
        path, fn, predictor.variables, specs, platforms=platforms,
        allow_tpu_kernels=allow_tpu_kernels,
        meta={
            "family": "vilt",
            "temperature": temperature,
            "txt_len": txt_len,
            "image_size": size,
            "fixed_batch": (None if symbolic_batch else int(fixed_batch)),
            "quantize": quantize,
            "tpu_kernels": allow_tpu_kernels,
            "outputs": "class probabilities",
        },
    )


def _coalesced_batch(n: int, fixed_b, buckets) -> int:
    """Program-shape batch size for ``n`` coalesced requests: fixed-batch
    artifacts run at exactly the baked size; symbolic-batch artifacts pad
    up to serving-style buckets so the jit around ``Exported.call``
    compiles a BOUNDED set of programs (symbolic export avoids re-export,
    not per-shape XLA compilation — on slow-compile backends an unpadded
    batcher would stall on every new arrival count)."""
    if fixed_b is not None:
        return int(fixed_b)
    from multimodal_uncertainty_tpu.serving import _bucket_for

    return _bucket_for(n, sorted(buckets), 1)


def fusion_artifact_micro_batcher(
    loaded: ExportedPredictor, *, max_batch: int = 32,
    max_wait_ms: float = 5.0, max_pending=None, uncertainty: bool = False,
    batch_buckets: Sequence[int] = (8, 32),
    pad_multiple: int = 32,
):
    """A :class:`serving.MicroBatcher` over a LOADED fusion artifact —
    the model-code-free serving path (`predict.py --artifact DIR --serve`).

    Samples are `(img[L_i,D], txt[L_t,D])` pairs as in
    `fusion_micro_batcher`; they pad to the artifact's baked img_len /
    txt_len with true-length masks. For artifacts exported with
    ``symbolic_lengths=True`` the baked lengths are documentation-only:
    samples of any length are accepted and pad to the coalesced batch's
    max lengths rounded up to ``pad_multiple``. Symbolic-BATCH programs
    pad the coalesced batch up to ``batch_buckets`` (and slice back), so
    only a bounded set of shapes ever compiles.

    ``uncertainty=True`` returns ``(probs, diag)`` per sample — the
    masks are artifact INPUTS, so the image-only / text-only ablations
    run through the same exported program (three calls per coalesced
    batch), keeping the live predictors' uncertainty surface available
    model-code-free."""
    from multimodal_uncertainty_tpu.serving import MicroBatcher, _round_up

    baked_li = int(loaded.meta["img_len"])
    baked_lt = int(loaded.meta["txt_len"])
    sym_len = bool(loaded.meta.get("symbolic_lengths"))
    fixed_b = loaded.meta.get("fixed_batch")
    if fixed_b is not None:
        max_batch = min(max_batch, int(fixed_b))

    def predict_batch(samples):
        n = len(samples)
        nb = _coalesced_batch(n, fixed_b, batch_buckets)
        if sym_len:
            li = _round_up(max(a.shape[0] for a, _ in samples), pad_multiple)
            lt = _round_up(max(b.shape[0] for _, b in samples), pad_multiple)
        else:
            li, lt = baked_li, baked_lt
        d_img = samples[0][0].shape[-1]
        d_txt = samples[0][1].shape[-1]  # may differ (text_hidden_size)
        img = np.zeros((nb, li, d_img), np.float32)
        txt = np.zeros((nb, lt, d_txt), np.float32)
        im = np.zeros((nb, li), bool)
        tm = np.zeros((nb, lt), bool)
        for i, (a, b) in enumerate(samples):
            if a.shape[0] > li or b.shape[0] > lt:
                raise ValueError(
                    f"sample ({a.shape[0]}, {b.shape[0]}) exceeds the "
                    f"artifact's baked lengths ({li}, {lt})"
                )
            img[i, : a.shape[0]] = a
            txt[i, : b.shape[0]] = b
            im[i, : a.shape[0]] = True
            tm[i, : b.shape[0]] = True
        full = loaded(img, txt, im, tm)[:n]
        if not uncertainty:
            return [full[i] for i in range(n)]
        img_only = loaded(img, txt, im, np.zeros_like(tm))[:n]
        txt_only = loaded(img, txt, np.zeros_like(im), tm)[:n]
        diag = {
            "confidence": full.max(-1),
            "image_sensitivity": np.abs(full - txt_only).max(-1),
            "text_sensitivity": np.abs(full - img_only).max(-1),
        }
        return [
            (full[i], {k: v[i] for k, v in diag.items()}) for i in range(n)
        ]

    return MicroBatcher(
        predict_batch, max_batch=max_batch, max_wait_ms=max_wait_ms,
        max_pending=max_pending,
    )


def mmbt_artifact_micro_batcher(
    loaded: ExportedPredictor, *, max_batch: int = 32,
    max_wait_ms: float = 5.0, max_pending=None, uncertainty: bool = False,
    batch_buckets: Sequence[int] = (8, 32),
):
    """MicroBatcher over a LOADED mmbt artifact — model-code-free serving
    with the same per-sample convention as ``serving.mmbt_micro_batcher``
    (``(token_ids, segment, image)``). Text pads to the artifact's baked
    txt_len (longer samples rejected); fixed-batch artifacts pad the
    coalesced batch up to the baked size. ``uncertainty=True`` needs an
    artifact exported ``with_ablations=True`` (the keep-mask is then a
    program input and the img-only/txt-only masks are built here from
    meta — still no model code)."""
    from multimodal_uncertainty_tpu.serving import MicroBatcher

    lt = int(loaded.meta["txt_len"])
    size = int(loaded.meta["image_size"])
    has_ablations = bool(loaded.meta.get("ablations"))
    if uncertainty and not has_ablations:
        raise ValueError(
            "uncertainty=True needs an artifact exported with_ablations="
            "True (this one fixes the full forward)"
        )
    n_img_tok = int(loaded.meta.get("num_image_embeds", 3)) + 2
    total = n_img_tok + lt
    fixed_b = loaded.meta.get("fixed_batch")
    if fixed_b is not None:
        max_batch = min(max_batch, int(fixed_b))

    def predict_batch(samples):
        n = len(samples)
        nb = _coalesced_batch(n, fixed_b, batch_buckets)
        txt = np.zeros((nb, lt), np.int32)
        seg = np.zeros((nb, lt), np.int32)
        mask = np.zeros((nb, lt), np.int32)
        img = np.zeros((nb, size, size, 3), np.float32)
        for i, (ids, segment, image) in enumerate(samples):
            if len(ids) > lt:
                raise ValueError(
                    f"sample text length {len(ids)} exceeds the artifact's "
                    f"baked txt_len {lt}"
                )
            if image.shape[:2] != (size, size):
                raise ValueError(
                    f"image {image.shape[:2]} != baked size ({size},{size})"
                )
            txt[i, : len(ids)] = ids
            seg[i, : len(ids)] = segment
            mask[i, : len(ids)] = 1
            img[i] = image
        extra = (np.ones((nb, total), bool),) if has_ablations else ()
        full = loaded(txt, mask, seg, img, *extra)[:n]
        if not uncertainty:
            return [full[i] for i in range(n)]
        # keep-mask columns 1/2 of the robustness contract (img-only keeps
        # the image tokens; txt-only keeps [CLS] + the text tokens)
        img_only_keep = np.zeros((nb, total), bool)
        img_only_keep[:, :n_img_tok] = True
        txt_only_keep = np.zeros((nb, total), bool)
        txt_only_keep[:, 0] = True
        txt_only_keep[:, n_img_tok:] = True
        img_only = loaded(txt, mask, seg, img, img_only_keep)[:n]
        txt_only = loaded(txt, mask, seg, img, txt_only_keep)[:n]
        diag = {
            "confidence": full.max(-1),
            "image_sensitivity": np.abs(full - txt_only).max(-1),
            "text_sensitivity": np.abs(full - img_only).max(-1),
        }
        return [
            (full[i], {k: v[i] for k, v in diag.items()}) for i in range(n)
        ]

    return MicroBatcher(
        predict_batch, max_batch=max_batch, max_wait_ms=max_wait_ms,
        max_pending=max_pending,
    )


def vilt_artifact_micro_batcher(
    loaded: ExportedPredictor, *, max_batch: int = 32,
    max_wait_ms: float = 5.0, max_pending=None, uncertainty: bool = False,
    batch_buckets: Sequence[int] = (8, 32),
):
    """MicroBatcher over a LOADED vilt artifact (per-sample processor
    dicts as in ``serving.vilt_micro_batcher``). ``uncertainty=True``
    runs the text-CLS-only / pixel-masked ablations through the same
    program (the masks are artifact inputs; same conventions as
    ``ViltPredictor.predict(ablate=...)``)."""
    from multimodal_uncertainty_tpu.serving import MicroBatcher

    lt = int(loaded.meta["txt_len"])
    size = int(loaded.meta["image_size"])
    fixed_b = loaded.meta.get("fixed_batch")
    if fixed_b is not None:
        max_batch = min(max_batch, int(fixed_b))

    def predict_batch(samples):
        n = len(samples)
        nb = _coalesced_batch(n, fixed_b, batch_buckets)
        ids = np.zeros((nb, lt), np.int64)
        am = np.zeros((nb, lt), np.int64)
        tt = np.zeros((nb, lt), np.int64)
        pv = np.zeros((nb, size, size, 3), np.float32)
        pm = np.zeros((nb, size, size), np.int64)
        for i, s in enumerate(samples):
            l = len(s["input_ids"])
            if l > lt:
                raise ValueError(
                    f"sample text length {l} exceeds the artifact's baked "
                    f"txt_len {lt}"
                )
            ids[i, :l] = s["input_ids"]
            am[i, :l] = s.get("attention_mask", np.ones(l, np.int64))
            tt[i, :l] = s.get("token_type_ids", np.zeros(l, np.int64))
            img = np.asarray(s["pixel_values"])
            if img.shape[:2] != (size, size):
                raise ValueError(
                    f"pixels {img.shape[:2]} != baked size ({size},{size})"
                )
            pv[i] = img
            pm[i] = np.asarray(
                s.get("pixel_mask", np.ones((size, size), np.int64))
            )
        full = loaded(ids, am, tt, pv, pm)[:n]
        if not uncertainty:
            return [full[i] for i in range(n)]
        am_cls = np.zeros_like(am)
        am_cls[:, 0] = 1  # text ablated: keep only the text CLS
        img_only = loaded(ids, am_cls, tt, pv, pm)[:n]
        txt_only = loaded(ids, am, tt, pv, np.zeros_like(pm))[:n]
        diag = {
            "confidence": full.max(-1),
            "image_sensitivity": np.abs(full - txt_only).max(-1),
            "text_sensitivity": np.abs(full - img_only).max(-1),
        }
        return [
            (full[i], {k: v[i] for k, v in diag.items()}) for i in range(n)
        ]

    return MicroBatcher(
        predict_batch, max_batch=max_batch, max_wait_ms=max_wait_ms,
        max_pending=max_pending,
    )


def artifact_micro_batcher(loaded: ExportedPredictor, **kw):
    """Family-dispatched batcher over any loaded artifact (meta.family)."""
    family = loaded.meta.get("family")
    if family == "flava_fusion":
        return fusion_artifact_micro_batcher(loaded, **kw)
    if family == "mmbt":
        return mmbt_artifact_micro_batcher(loaded, **kw)
    if family == "vilt":
        return vilt_artifact_micro_batcher(loaded, **kw)
    raise ValueError(f"unknown artifact family: {family!r}")


def export_fusion_predictor(
    predictor,
    path: str,
    *,
    img_len: int,
    txt_len: int,
    embed_dim: int = 768,
    txt_embed_dim: Optional[int] = None,  # defaults to embed_dim
    symbolic_batch: bool = True,
    symbolic_lengths: bool = False,
    platforms: Optional[Sequence[str]] = None,
    allow_tpu_kernels: bool = False,
    fixed_batch: int = 1,
) -> None:
    """Export a :class:`serving.FusionPredictor`'s padded forward
    ``(img, txt, img_mask, txt_mask) -> ensemble-mean probs`` as an
    artifact. ``img_len``/``txt_len`` fix the (padded) sequence lengths;
    callers pad exactly like ``FusionPredictor.predict`` does. With
    ``symbolic_lengths=True`` the sequence dims are ALSO polymorphic
    (``li``/``lt`` symbols; img_len/txt_len become documentation-only
    meta) — one program for every padding, zero length buckets.

    ``allow_tpu_kernels=True`` (fixed shapes only) bakes the predictor
    model's Pallas attention kernels into the artifact — TPU-only, but
    serves at live-kernel speed (see :func:`save_exported`).
    ``fixed_batch`` sets the baked batch size when ``symbolic_batch`` is
    off (callers pad requests up to it, like the live predictors' batch
    buckets); recorded in meta so artifact servers know the contract."""
    if allow_tpu_kernels and (symbolic_batch or symbolic_lengths):
        raise ValueError(
            "allow_tpu_kernels requires fixed shapes (the Pallas grids "
            "specialize on concrete batch/sequence blocks)"
        )
    d_i, d_t = embed_dim, txt_embed_dim or embed_dim
    if symbolic_lengths:
        if not symbolic_batch:
            raise ValueError("symbolic_lengths requires symbolic_batch")
        b, li, lt = jax.export.symbolic_shape("b, li, lt")
        specs = [
            jax.ShapeDtypeStruct((b, li, d_i), jnp.float32),
            jax.ShapeDtypeStruct((b, lt, d_t), jnp.float32),
            jax.ShapeDtypeStruct((b, li), jnp.bool_),
            jax.ShapeDtypeStruct((b, lt), jnp.bool_),
        ]
    else:
        nb = 1 if symbolic_batch else int(fixed_batch)
        example = [
            np.zeros((nb, img_len, d_i), np.float32),
            np.zeros((nb, txt_len, d_t), np.float32),
            np.zeros((nb, img_len), bool),
            np.zeros((nb, txt_len), bool),
        ]
        if symbolic_batch:
            specs = symbolic_batch_specs(example)
        else:
            specs = [
                jax.ShapeDtypeStruct(np.shape(a), jnp.asarray(a).dtype)
                for a in example
            ]

    model = predictor.model
    quantize = predictor.quantize
    temperature = float(getattr(predictor, "temperature", 1.0))

    def fn(variables, img, txt, img_mask, txt_mask):
        from multimodal_uncertainty_tpu.serving import _quant_ctx

        with _quant_ctx(quantize):
            logits = model.apply(
                variables, (img, txt), train=False,
                img_mask=img_mask, txt_mask=txt_mask,
            )
        probs = jax.nn.softmax(
            logits.astype(jnp.float32) / temperature, axis=-1
        )
        return probs.mean(axis=1)

    save_exported(
        path, fn, predictor.variables, specs, platforms=platforms,
        allow_tpu_kernels=allow_tpu_kernels,
        meta={
            "family": "flava_fusion",
            "temperature": temperature,
            "img_len": img_len,
            "txt_len": txt_len,
            "img_dim": d_i,
            "txt_dim": d_t,
            "symbolic_lengths": symbolic_lengths,
            "fixed_batch": (None if symbolic_batch else int(fixed_batch)),
            "quantize": quantize,
            "tpu_kernels": allow_tpu_kernels,
            "outputs": "ensemble-mean class probabilities",
        },
    )
