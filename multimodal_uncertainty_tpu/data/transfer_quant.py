"""Int8 host->device *transfer* quantization for embedding batches.

Motivation (measured, BASELINE.md "End-to-end incl. preprocessing"): the
FLAVA-encoded training path ships ~0.5 MB of bf16 embeddings per sample to
the chip; on this environment's tunneled interconnect the transfer stage
runs at ~152 samples/s while the host pipeline does ~6,260/s and the device
step ~2,760/s — the wire is the end-to-end bottleneck by ~18x. The
reference never faces this (its GPU reads the same tensors over local PCIe,
``src/dataset.py:196-226``), but any TPU deployment whose feature source is
remote (storage service, dataloader hosts, or a thin tunnel like this one)
does.

Scheme: per-token symmetric int8. For each trailing-axis row of a floating
batch leaf, ``scale = max(|row|)/127`` (fp32), ``q = round(row/scale)``
(int8). Only ``q`` and the per-row scales cross the wire — 0.5x the bytes
of bf16 (0.25x of f32) plus a ~0.1% scale overhead — and a tiny jitted
elementwise program dequantizes back to the original dtype on device, so
the training step and every downstream consumer see exactly the arrays they
would have seen, at int8-rounded precision (max elementwise error =
``max|row|/254``). All-zero rows (the collate padding,
``collate_fn_flava``) survive bit-exactly: their scale is forced to 1 and
``q`` to 0.

This is a lossy, **opt-in** knob (``train.py --transfer_quant int8``): the
FLAVA embeddings it targets are already bf16 inputs to a bf16 matmul, so
the extra rounding is ~one ulp of the compute dtype per element, but it is
a real numerics change and stays off by default (DEVIATIONS.md).
"""
from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


def quantize_rows(x: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Symmetric per-row (trailing axis) int8 quantization on the host.

    Returns ``(q, scale)`` with ``q`` int8 of ``x.shape`` and ``scale``
    fp32 of ``x.shape[:-1] + (1,)``. Rows of all zeros get scale 1.0 and
    quantize to exact zeros; rows containing any non-finite value (NaN/Inf)
    are treated the same — scale 1.0, exact zeros — in both the native and
    numpy paths (bit-parity holds for non-finite inputs too).

    Dispatches to the C++ row-threaded kernel (``csrc/quant.cpp``,
    bit-identical, GIL-free, ~10x the numpy fallback on one core) when the
    native library is available and the dtype is f32/bf16.
    """
    from multimodal_uncertainty_tpu.data.native import native_quantize_rows

    native = native_quantize_rows(x)
    if native is not None:
        return native
    return _numpy_quantize_rows(x)


def _numpy_quantize_rows(x: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """The pure-numpy reference path (used by parity tests)."""
    xf = np.asarray(x, np.float32)
    finite = np.isfinite(xf).all(axis=-1, keepdims=True)
    if not finite.all():  # non-finite rows -> zeros, scale 1.0 (see above)
        xf = np.where(finite, xf, np.float32(0.0))
    amax = np.max(np.abs(xf), axis=-1, keepdims=True)
    scale = np.where(amax > 0, amax / 127.0, np.float32(1.0)).astype(np.float32)
    q = np.clip(np.rint(xf / scale), -127, 127).astype(np.int8)
    return q, scale


@functools.lru_cache(maxsize=None)
def _dequant_fn(dtype_name: str):
    """One compiled dequant program per output dtype (and, under jit's
    shape cache, per padded bucket shape — bounded like the step itself)."""

    @jax.jit
    def dequant(q: jax.Array, scale: jax.Array) -> jax.Array:
        return (q.astype(jnp.float32) * scale).astype(dtype_name)

    return dequant


@functools.lru_cache(maxsize=None)
def _packed_dequant_fn(specs: tuple):
    """Dequantize a PACKED wire payload: one flat int8 buffer + one flat
    fp32 scale buffer carrying every quantized leaf, split/reshaped/scaled
    in a single compiled program. Minimizes per-batch host->device
    operations — on latency-dominated links (a tunneled chip here, DCN
    feeds in production) each separate put/dispatch costs a round trip,
    which at 2 leaves + scales would otherwise cancel the byte savings.

    ``specs`` is a tuple of ``(shape, dtype_name)`` per leaf, in order.
    """
    sizes = [int(np.prod(s)) for s, _ in specs]
    scale_sizes = [int(np.prod(s[:-1])) for s, _ in specs]

    @jax.jit
    def dequant(qflat: jax.Array, sflat: jax.Array):
        outs = []
        qo = so = 0
        for (shape, dtype_name), n, m in zip(specs, sizes, scale_sizes):
            q = qflat[qo : qo + n].reshape(shape)
            s = sflat[so : so + m].reshape(tuple(shape[:-1]) + (1,))
            outs.append((q.astype(jnp.float32) * s).astype(dtype_name))
            qo += n
            so += m
        return tuple(outs)

    return dequant


def dequantize(q: jax.Array, scale: jax.Array, dtype) -> jax.Array:
    """Device-side inverse of :func:`quantize_rows` (jitted, elementwise)."""
    return _dequant_fn(np.dtype(dtype).name)(q, scale)


class Int8TransferPut:
    """A Trainer ``put_batch_fn`` that quantizes floating batch leaves on
    the host, moves int8+scales to device, and dequantizes there.

    * Only host-side ``np.ndarray`` leaves with ``ndim >= 2`` and a trailing
      feature axis of at least ``min_last_dim`` are quantized (embedding
      tensors); integer leaves (labels, token ids, masks, uint8 images) and
      small/1-D floats pass through untouched.
    * Blast radius: when the batch is a 2-tuple ``(x, y)`` (the trainer's
      layout) only leaves inside ``x`` are ever quantized — a float target
      or auxiliary leaf on the ``y`` side can never be lossy-quantized. For
      finer control pass ``predicate`` (called with each ``x``-side leaf;
      return False to exempt it from quantization).
    * Leaves that are already ``jax.Array`` pass through, making the put
      idempotent — the trainer applies ``put_batch`` again after a
      ``DevicePrefetcher`` already placed the batch.
    * ``base_put``, when given, performs the device placement of the whole
      (quantized) pytree — e.g. ``parallel.sharding.put_batch_fn(mesh)`` to
      shard the int8 payload over a 'data' mesh axis before the on-device
      dequant, so a DP fleet also ships the small wire format.
    """

    def __init__(self, base_put: Optional[Callable] = None,
                 min_last_dim: int = 64,
                 predicate: Optional[Callable] = None):
        self.base_put = base_put
        self.min_last_dim = min_last_dim
        self.predicate = predicate

    def _eligible(self, leaf) -> bool:
        return (
            isinstance(leaf, np.ndarray)
            and leaf.ndim >= 2
            and leaf.shape[-1] >= self.min_last_dim
            and jnp.issubdtype(leaf.dtype, jnp.floating)
            and (self.predicate is None or self.predicate(leaf))
        )

    def __call__(self, batch):
        leaves, treedef = jax.tree_util.tree_flatten(batch)
        # (x, y) trainer layout: only the first len(x-leaves) flattened slots
        # (tree_flatten is depth-first, x before y) may be quantized
        if isinstance(batch, (tuple, list)) and len(batch) == 2:
            n_quantizable = len(jax.tree_util.tree_leaves(batch[0]))
        else:
            n_quantizable = len(leaves)
        plan = []  # dtype_name for quantized slots, else None
        wire = []
        for i, leaf in enumerate(leaves):
            if i < n_quantizable and self._eligible(leaf):
                q, s = quantize_rows(leaf)
                plan.append(np.dtype(leaf.dtype).name)
                wire.append((q, s))
            else:
                plan.append(None)
                wire.append(leaf)
        if self.base_put is not None:
            # mesh placement: keep leaves separate so the 'data' axis shards
            # each (q, scale) pair along its own batch dimension
            wire = self.base_put(wire)
            out = [
                _dequant_fn(d)(*placed) if d is not None else placed
                for d, placed in zip(plan, wire)
            ]
            return jax.tree_util.tree_unflatten(treedef, out)

        # single-device: pack every quantized leaf into ONE int8 payload +
        # ONE fp32 scale payload, dequantized by a single compiled program
        quant_slots = [(i, w) for i, (d, w) in enumerate(zip(plan, wire))
                       if d is not None]
        out = [
            None if d is not None else jnp.asarray(leaf)
            for d, leaf in zip(plan, wire)
        ]
        if quant_slots:
            specs = tuple(
                (tuple(w[0].shape), plan[i]) for i, w in quant_slots
            )
            qflat = np.concatenate([w[0].ravel() for _, w in quant_slots])
            sflat = np.concatenate([w[1].ravel() for _, w in quant_slots])
            deq = _packed_dequant_fn(specs)(jnp.asarray(qflat),
                                            jnp.asarray(sflat))
            for (i, _), arr in zip(quant_slots, deq):
                out[i] = arr
        return jax.tree_util.tree_unflatten(treedef, out)
