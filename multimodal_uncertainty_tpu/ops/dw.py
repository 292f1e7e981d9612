"""Pallas weight-gradient (dW) matmul — the round-3 attack on the dW wall.

Round-2 profiling (BASELINE.md "MFU wall") left ~61% of the flagship step in
XLA backward fusions whose dW matmuls read transposed activations; isolated,
the autodiff-emitted ``einsum('kd,ke->de')`` on the flagship shape runs at
~14 TF/s on v5e while the SAME contraction from a pre-transposed operand
runs at ~101 TF/s (tools/bench_dw.py). The Pallas kernel here reaches ~99
TF/s *without* changing the stored activation layout: it streams x and dy
blocks in their natural K-major layout and accumulates the (Din, Dout)
output in a fp32 VMEM scratch across the K grid dimension — the MXU
consumes the dim-0 contraction directly, so no HBM transpose ever happens.

``dot_general_dw`` is a drop-in for ``jnp.dot(x, w)`` whose custom VJP
routes dW through this kernel (forward and dx stay on XLA — they already
run at ~peak). Enabled per-call (``Linear`` consults
:func:`use_pallas_dw`); numerics are identical to XLA's (bf16 MXU operands,
fp32 accumulation) and exactness is tested in tests/test_ops.py.

**Measured verdict (round 3): OFF by default.** The isolated win does not
transfer to the training step — flagship bench with every Linear routed
through this kernel measured -30% (2,192 vs 3,152 samples/s/chip): each
opaque custom call forces its activation-sized cotangent to materialize in
HBM where XLA otherwise keeps it fused into the surrounding backward ops.
Kept in-tree as a documented negative result and for shapes/fusion regimes
where XLA's scheduling may differ; see BASELINE.md "dW-wall attack".

K (=B*S rows) is padded to the K-block multiple with zero rows when needed —
zero rows contribute nothing to x^T dy, so padding is exact.
"""
from __future__ import annotations

import contextlib
import functools
import threading

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_state = threading.local()


def use_pallas_dw():
    """False (off), True (compiled kernel), or "interpret" (CPU testing)."""
    return getattr(_state, "on", False)


@contextlib.contextmanager
def pallas_dw(enable=True):
    """Trace-time switch: Linears traced inside route dW through the kernel.
    Pass ``"interpret"`` to run the kernel interpreted (CPU tests)."""
    prev = use_pallas_dw()
    _state.on = enable
    try:
        yield
    finally:
        _state.on = prev


def _dw_kernel(x_ref, dy_ref, o_ref, acc_ref, *, nk):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += jax.lax.dot_general(
        x_ref[...], dy_ref[...],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(k == nk - 1)
    def _done():
        o_ref[...] = acc_ref[...]


def _dw_blocks(k: int, din: int, dout: int, itemsize: int):
    """(bk, bn) sized to ~13MB VMEM. Footprint per grid step: fp32 (din, bn)
    accumulator + fp32 (din, bn) output block (single-buffered: its index is
    constant across the K grid dim) + double-buffered (bk, din) x and
    (bk, bn) dy streams."""
    budget = 8 * 1024 * 1024
    for bk in (512, 256):
        for bn in (512, 256, 128):
            if dout % bn:
                continue
            need = 2 * 4 * din * bn + 2 * itemsize * bk * (din + bn)
            if need <= budget:
                return bk, bn
    return 256, 128


def _dw_pallas_2d(x2d: jax.Array, dy2d: jax.Array, interpret: bool):
    """(K, Din) x (K, Dout) -> (Din, Dout) fp32-accumulated, out in x dtype
    promoted... returns fp32 (caller casts)."""
    k, din = x2d.shape
    _, dout = dy2d.shape
    bk, bn = _dw_blocks(k, din, dout, x2d.dtype.itemsize)
    if k % bk:
        pad = bk - k % bk
        x2d = jnp.pad(x2d, ((0, pad), (0, 0)))
        dy2d = jnp.pad(dy2d, ((0, pad), (0, 0)))
        k += pad
    nk = k // bk
    kernel = functools.partial(_dw_kernel, nk=nk)
    return pl.pallas_call(
        kernel,
        grid=(dout // bn, nk),
        in_specs=[
            pl.BlockSpec((bk, din), lambda n, kk: (kk, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda n, kk: (kk, n),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((din, bn), lambda n, kk: (0, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((din, dout), jnp.float32),
        scratch_shapes=[pltpu.VMEM((din, bn), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * k * din * dout,
            bytes_accessed=x2d.dtype.itemsize * k * (din + dout)
            + 4 * din * dout,
            transcendentals=0,
        ),
    )(x2d, dy2d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def dot_general_dw(x, w, interpret=False):
    """y = x @ w with the Pallas dW backward. x: (..., Din); w: (Din, Dout)."""
    return jnp.dot(x, w)


def _fwd(x, w, interpret):
    return jnp.dot(x, w), (x, w)


def _bwd(interpret, res, g):
    x, w = res
    din = x.shape[-1]
    dout = w.shape[-1]
    dx = jnp.dot(g, w.T)
    x2d = x.reshape(-1, din)
    g2d = g.reshape(-1, dout).astype(x2d.dtype)
    dw = _dw_pallas_2d(x2d, g2d, interpret).astype(w.dtype)
    return dx.astype(x.dtype), dw


dot_general_dw.defvjp(_fwd, _bwd)
