"""Serving-throughput microbench: fp32/bf16 vs int8-quantized fusion forward.

Measures the flagship FLAVA-fusion inference forward (ensemble-mean probs,
the FusionPredictor compute) on the current default JAX backend at a serving
batch, comparing:
  * fp32 params / fp32 activations (predictor default)
  * bf16 activations
  * int8 dynamic W8A8 (ops/quant.py) over bf16 activations
  * int8 weight-only

Run on the real TPU chip:  python tools/bench_quant.py [--batch 256]

Chained-dispatch + scalar-fetch barrier, per BASELINE.md measurement notes
(block_until_ready does not block on the tunneled axon backend).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_uncertainty_tpu.models import FlavaFusionTransformer
from multimodal_uncertainty_tpu.ops.quant import quantized

B = int(sys.argv[sys.argv.index("--batch") + 1]) if "--batch" in sys.argv else 256
LI, LT, D, C, E = 197, 77, 768, 2, 2
STEPS = 20


def build_forward(dtype, quant_mode):
    model = FlavaFusionTransformer(
        out_dim=E, num_classes=C,
        multimodal_num_attention_heads=3, multimodal_num_hidden_layers=3,
        attn_impl="auto", dtype=dtype,
    )
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(B, LI, D)).astype(np.float32))
    txt = jnp.asarray(rng.normal(size=(B, LT, D)).astype(np.float32))
    variables = model.init({"params": jax.random.key(0)}, (img, txt), train=False)

    @jax.jit
    def forward(v, img, txt, salt):
        # salt folds the previous output back in so steps chain (no dead-code
        # elimination, honest dispatch timing on the tunnel)
        img = img + salt
        if quant_mode:
            with quantized(quant_mode):
                logits = model.apply(v, (img, txt), train=False)
        else:
            logits = model.apply(v, (img, txt), train=False)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).mean(1)
        return probs

    return forward, variables, img, txt


def bench(name, dtype, quant_mode):
    fwd, v, img, txt = build_forward(dtype, quant_mode)
    salt = jnp.zeros((), img.dtype)
    probs = fwd(v, img, txt, salt)
    float(probs.sum())  # compile + barrier
    t0 = time.perf_counter()
    for _ in range(STEPS):
        probs = fwd(v, img, txt, probs.mean() * 1e-9)
    float(probs.sum())
    dt = time.perf_counter() - t0
    sps = B * STEPS / dt
    print(f"{name:24s} {dt / STEPS * 1e3:8.2f} ms/fwd  {sps:10.0f} samples/s")
    return sps, probs


def main():
    print(f"backend={jax.default_backend()} batch={B} (LI,LT,D)=({LI},{LT},{D})")
    base, p_fp32 = bench("fp32", None, None)
    bf16, p_bf16 = bench("bf16", jnp.bfloat16, None)
    w8a8, p_int8 = bench("int8 W8A8 (bf16 acts)", jnp.bfloat16, "int8")
    wonly, p_wo = bench("int8 weight-only", jnp.bfloat16, "int8_weight")
    for name, p in (("bf16", p_bf16), ("int8", p_int8), ("int8_weight", p_wo)):
        d = np.abs(np.asarray(p) - np.asarray(p_fp32)).max()
        print(f"max |dprob| vs fp32 [{name}]: {d:.4f}")
    print(f"speedups vs fp32: bf16 {bf16 / base:.2f}x, "
          f"W8A8 {w8a8 / base:.2f}x, weight-only {wonly / base:.2f}x")


if __name__ == "__main__":
    main()
