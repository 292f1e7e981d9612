"""Long-context attention bench: flash (sequence-blocked) kernels.

The whole-sequence kernels (ops/attention.py heads-last family) hold a
head's full (S, S) score plane in VMEM — right for the reference's S<=512
workloads, impossible past S~1k (67MB at S=4096). The flash kernels stream
K/V chunks with the online-softmax recurrence. This tool races, at each
sequence length:

1. xla        — sdpa_xla via attention_heads_last(impl="xla"): XLA
                materializes the B·H·S² score tensor in HBM
2. whole_seq  — the heads-last whole-sequence kernel (expected to fail
                Mosaic compilation past its VMEM envelope — recorded)
3. flash      — attention_flash (auto-selected by impl="pallas" at these
                lengths; called directly here)

for fwd-only (serving) and fwd+bwd (training), B*S held constant so each
row does the same S-scaling work. Chained-dependency timing with a single
scalar fetch per the tunnel rules (BASELINE.md measurement notes).

Usage (real TPU): python tools/bench_flash.py [--iters 10] [--dh 64]
                  [--tokens 16384] [--seqs 512,1024,2048,4096]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _arg(flag, default, cast=int):
    if flag in sys.argv:
        i = sys.argv.index(flag)
        if i + 1 < len(sys.argv):
            return cast(sys.argv[i + 1])
    return default


def main():
    import jax
    import jax.numpy as jnp

    from multimodal_uncertainty_tpu.ops.attention import (
        attention_flash,
        attention_heads_last,
    )

    ITERS = _arg("--iters", 10)
    DH = _arg("--dh", 64)
    D = _arg("--d", 768)
    TOKENS = _arg("--tokens", 16384)  # B*S per step, constant across rows
    seqs = [int(s) for s in
            _arg("--seqs", "512,1024,2048,4096,8192,16384", str).split(",")]
    interpret = "--interpret" in sys.argv
    h = D // DH
    rng = np.random.default_rng(0)

    def timed(fn, q, k, v, iters=ITERS):
        out = fn(q, k, v)
        # warm/compile; consume the FULL output (partial consumption lets
        # XLA dead-code-eliminate the op — BASELINE.md false-alarm note)
        float(jax.tree.leaves(out)[0].astype(jnp.float32).sum())
        t0 = time.perf_counter()
        x = q
        for _ in range(iters):
            out = fn(x, k, v)
            lead = jax.tree.leaves(out)[0]
            x = lead * 1e-3 + q  # serialize steps through a data dependency
        float(x.astype(jnp.float32).sum())
        return (time.perf_counter() - t0) / iters

    results = []
    for s in seqs:
        b = max(1, TOKENS // s)
        q, k, v = (jnp.asarray(rng.normal(size=(b, s, D)).astype(np.float32),
                               jnp.bfloat16) for _ in range(3))
        m = np.ones((b, s), bool)
        m[: max(1, b // 2), (4 * s) // 5:] = False  # padded-key realism
        mask = jnp.asarray(m)
        flops_fwd = 2 * 2 * b * s * s * D        # QK^T + PV
        flops_train = flops_fwd + 5 * 2 * b * s * s * D

        def fwd(impl):
            def f(q, k, v):
                if impl == "flash":
                    return attention_flash(q, k, v, mask, n_head=h,
                                           interpret=interpret)
                return attention_heads_last(q, k, v, mask, n_head=h,
                                            impl=impl)

            return jax.jit(f)

        def train(impl):
            base = fwd(impl)

            def loss(q, k, v):
                return jnp.sum(base(q, k, v).astype(jnp.float32) ** 2)

            g = jax.grad(loss, argnums=(0, 1, 2))
            return jax.jit(lambda q, k, v: g(q, k, v))

        row = {"S": s, "B": b, "H": h, "Dh": DH}
        wl = "pallas" if not interpret else "pallas_interpret"
        for label, impl, make, fl in [
            ("xla_fwd", "xla", fwd, flops_fwd),
            ("whole_seq_fwd", wl, fwd, flops_fwd),
            ("flash_fwd", "flash", fwd, flops_fwd),
            ("xla_train", "xla", train, flops_train),
            ("whole_seq_train", wl, train, flops_train),
            ("flash_train", "flash", train, flops_train),
        ]:
            try:
                dt = timed(make(impl), q, k, v)
                row[label] = {"ms": round(dt * 1e3, 2),
                              "tf_s": round(fl / dt / 1e12, 1)}
            except Exception as exc:  # noqa: BLE001 — record the failure mode
                row[label] = f"{type(exc).__name__}: {exc}"[:110]
        results.append(row)
        print(json.dumps(row))
    return results


if __name__ == "__main__":
    main()
