"""dW-wall microbench (VERDICT r2 stretch item #9).

The round-2 profile prices the flagship step's remaining time at ~61% XLA
backward/optimizer fusions, whose dW matmuls run at ~58 TF/s (vs ~125+ for
the forward) — attributed to transposed-activation reads: dW = x^T dy
contracts the (B*S) MAJOR axis of both operands, so the MXU streams
sublane-transposed tiles.

This tool isolates that op and races three implementations on the training
shapes (fusion MLP: x bf16[70144, 768] -> dW[768, 3072]):

1. xla        — jnp.einsum('kd,ke->de') bf16 operands, f32 accumulation
                (exactly what autodiff emits for a Linear's dW)
2. xla_pre_t  — same contraction but from a PRE-TRANSPOSED x (d-major):
                prices what a layout change of the stored activation buys
3. pallas     — K-chunked accumulation kernel: grid (Dout/BN, K/BK),
                out block revisited across the K dim, operands streamed in
                their natural K-major layout, fp32 VMEM accumulator

plus the forward matmul as the speed-of-light reference on the same bytes.

Usage (real TPU): python tools/bench_dw.py [--k 70144] [--din 768]
                  [--dout 3072] [--iters 30]
Chained scalar-fetch timing per the tunnel rules (BASELINE.md).
"""
from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _arg(flag, default):
    if flag in sys.argv:
        i = sys.argv.index(flag)
        if i + 1 < len(sys.argv):
            return int(sys.argv[i + 1])
    return default


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    K = _arg("--k", 70144)       # 256 * 274: flagship batch x seq
    DIN = _arg("--din", 768)
    DOUT = _arg("--dout", 3072)  # the c_fc MLP dW, the biggest one
    ITERS = _arg("--iters", 30)
    interpret = "--interpret" in sys.argv

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(K, DIN)).astype(np.float32), jnp.bfloat16)
    dy = jnp.asarray(rng.normal(size=(K, DOUT)).astype(np.float32), jnp.bfloat16)
    xt = jnp.asarray(np.ascontiguousarray(np.asarray(x, np.float32).T),
                     jnp.bfloat16)  # (DIN, K), d-major storage

    @jax.jit
    def dw_xla(x, dy):
        return jnp.einsum("kd,ke->de", x, dy,
                          preferred_element_type=jnp.float32)

    @jax.jit
    def dw_xla_pre_t(xt, dy):
        return jnp.einsum("dk,ke->de", xt, dy,
                          preferred_element_type=jnp.float32)

    @jax.jit
    def fwd_ref(x, dy):  # forward-shaped matmul on the same byte volume
        w = dy[:DIN].T  # (DOUT, DIN) slice as a stand-in weight
        return jnp.einsum("kd,ed->ke", x, w,
                          preferred_element_type=jnp.float32)

    # ---- pallas K-chunked dW ------------------------------------------------
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

    def make_dw_pallas(bk, bn):
        nk = K // bk
        kernel = functools.partial(_dw_kernel, nk=nk)

        @jax.jit
        def dw(x, dy):
            return pl.pallas_call(
                kernel,
                grid=(DOUT // bn, nk),
                in_specs=[
                    pl.BlockSpec((bk, DIN), lambda n, k: (k, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((bk, bn), lambda n, k: (k, n),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((DIN, bn), lambda n, k: (0, n),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((DIN, DOUT), jnp.float32),
                scratch_shapes=[pltpu.VMEM((DIN, bn), jnp.float32)],
                interpret=interpret,
                cost_estimate=pl.CostEstimate(
                    flops=2 * K * DIN * DOUT,
                    bytes_accessed=2 * K * (DIN + DOUT) + 4 * DIN * DOUT,
                    transcendentals=0,
                ),
            )(x, dy)

        return dw

    flops = 2 * K * DIN * DOUT

    def race(fn, *args, iters=ITERS):
        out = fn(*args)
        float(out.astype(jnp.float32).sum())  # compile+warm, full-output dep
        t0 = time.perf_counter()
        acc = None
        for _ in range(iters):
            o = fn(*args)
            # chain through a data dependency so steps serialize
            acc = o if acc is None else acc + o
        float(acc.astype(jnp.float32).sum())
        dt = (time.perf_counter() - t0) / iters
        return dt * 1e3, flops / dt / 1e12

    results = {}
    results["fwd_ref"] = race(fwd_ref, x, dy)
    results["xla"] = race(dw_xla, x, dy)
    results["xla_pre_t"] = race(dw_xla_pre_t, xt, dy)
    for bk in (512, 1096, 2192):
        if K % bk:
            continue
        for bn in (256, 512):
            try:
                results[f"pallas_bk{bk}_bn{bn}"] = race(
                    make_dw_pallas(bk, bn), x, dy)
            except Exception as exc:  # noqa: BLE001
                results[f"pallas_bk{bk}_bn{bn}"] = f"{type(exc).__name__}: {exc}"[:120]

    print(json.dumps(
        {k: (f"{v[0]:.2f} ms, {v[1]:.1f} TF/s" if isinstance(v, tuple) else v)
         for k, v in results.items()}, indent=1))


if __name__ == "__main__":
    main()
