"""Int8 quantized matmuls for serving (dynamic W8A8 + weight-only modes).

The reference has no quantization story (torch fp32 end to end); this is a
TPU-native serving feature: the v5e MXU executes int8 x int8 -> int32 at
2x the bf16 FLOP rate, and int8 weights halve HBM weight traffic vs bf16.

Two modes:

* ``"int8"`` — dynamic W8A8: per-token symmetric activation scales +
  per-output-channel symmetric weight scales, int8 ``dot_general`` with
  int32 accumulation (hits the int8 MXU path), fp32 rescale. The standard
  dynamic-quantization recipe (no calibration pass needed).
* ``"int8_weight"`` — weight-only: weights quantized per-channel to int8 and
  dequantized to the activation dtype before the matmul. Numerically gentler
  (activations untouched); saves weight HBM reads, not MXU cycles.

Both are *trace-time* modes: :func:`quantized` is a context manager that
:class:`~multimodal_uncertainty_tpu.models.layers.Linear` consults when its
``__call__`` is traced, so any existing model runs quantized under ``jit``
without model-definition changes::

    with quantized("int8"):
        forward = jax.jit(lambda v, x: model.apply(v, x, train=False))
        probs = forward(variables, x)   # traced (and compiled) quantized

Weight quantization happens inside the traced program — a single abs-max
pass over each weight matrix, negligible next to the matmul it feeds and
fused by XLA into the surrounding program.
"""
from __future__ import annotations

import threading
from contextlib import contextmanager
from typing import Optional

import jax
import jax.numpy as jnp

_MODES = ("int8", "int8_weight")
_state = threading.local()


def current_mode() -> Optional[str]:
    return getattr(_state, "mode", None)


@contextmanager
def quantized(mode: str = "int8"):
    """Enable quantized Linear matmuls for code traced inside the block."""
    if mode not in _MODES:
        raise ValueError(f"unknown quantization mode {mode!r}; use one of {_MODES}")
    prev = current_mode()
    _state.mode = mode
    try:
        yield
    finally:
        _state.mode = prev


def _weight_int8(w: jax.Array):
    """Symmetric per-output-channel int8 quantization of a (K, N) kernel."""
    w32 = w.astype(jnp.float32)
    ws = jnp.max(jnp.abs(w32), axis=0, keepdims=True) / 127.0  # (1, N)
    ws = jnp.maximum(ws, 1e-12)
    wq = jnp.round(w32 / ws).astype(jnp.int8)
    return wq, ws


def int8_weight_dot(x: jax.Array, w: jax.Array) -> jax.Array:
    """Weight-only int8: dequantize per-channel int8 weights to x.dtype."""
    wq, ws = _weight_int8(w)
    w_deq = (wq.astype(jnp.float32) * ws).astype(x.dtype)
    return jnp.dot(x, w_deq)


def int8_dot(x: jax.Array, w: jax.Array) -> jax.Array:
    """Dynamic W8A8 matmul: (..., K) @ (K, N) -> (..., N).

    Per-token (last-axis) activation scales, per-channel weight scales,
    int8 x int8 -> int32 accumulation on the MXU, fp32 rescale. Returns
    x.dtype to slot into existing bf16/fp32 compute paths.
    """
    x32 = x.astype(jnp.float32)
    xs = jnp.max(jnp.abs(x32), axis=-1, keepdims=True) / 127.0  # (..., 1)
    xs = jnp.maximum(xs, 1e-12)
    xq = jnp.round(x32 / xs).astype(jnp.int8)
    wq, ws = _weight_int8(w)
    acc = jax.lax.dot_general(
        xq,
        wq,
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return (acc.astype(jnp.float32) * xs * ws).astype(x.dtype)


def quant_dot(x: jax.Array, w: jax.Array, mode: Optional[str] = None) -> jax.Array:
    """Dispatch on the active (or given) quantization mode."""
    mode = mode or current_mode()
    if mode == "int8":
        return int8_dot(x, w)
    if mode == "int8_weight":
        return int8_weight_dot(x, w)
    return jnp.dot(x, w)
