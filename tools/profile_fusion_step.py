"""Per-op device attribution of the flagship FLAVA-fusion MIMO train step
(VERDICT r4 #8): EXACTLY bench_tpu's program (B=256, L_img=197, L_txt=77,
d=768, MIMO-shuffle-instance, bf16, Pallas attention via attn_impl=auto).

Prints the jit_step program device span (honest step time), top-K ops by
self time, and the hlo_category table with achieved GB/s — the evidence
for either the next >=3% lever or the closing trace-backed statement next
to BASELINE.md's MFU number.

Run on the real chip:  python tools/profile_fusion_step.py [--steps 6]
"""
from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402


def analytic_step_flops(b, li, lt, d, layers=3, heads=3, n_classes=2):
    """fwd+bwd ~= 3x fwd for the fusion transformer: per-token matmuls
    (qkvo + 4d MLP) + attention O(S^2 d) over S = li+lt+2 (pads/CLS are
    still computed), x2 modality views stacked on batch by data-forming."""
    s = li + lt
    per_tok = 2 * (4 * d * d + 2 * d * 4 * d) * layers
    attn = 2 * 2 * s * s * d * layers
    fwd = b * (per_tok * s + attn + 2 * d * n_classes)
    return 3.0 * fwd


def main():
    import bench  # noqa: E402

    bench._enable_compile_cache()

    import jax  # noqa: E402
    import jax.numpy as jnp  # noqa: E402

    import trace_report  # noqa: E402
    from multimodal_uncertainty_tpu.training.steps import build_train_step
    from multimodal_uncertainty_tpu.zoo import setup_flava

    steps = int(bench._arg_after("--steps", 6))
    b = int(bench._arg_after("--batch", bench.B))
    top = int(bench._arg_after("--top", 20))
    attn_impl = bench._arg_after("--attn_impl", "auto")

    li, lt, d = bench.LI, bench.LT, bench.D
    setup = setup_flava(
        model_type="MIMO-shuffle-instance", n_classes=bench.N_CLASSES,
        lr=1e-4, n_epochs=100, steps_per_epoch=100,
        sample_shapes=((b, li), (b, lt)), seed_key=jax.random.key(0),
        attn_impl=attn_impl, dtype=jnp.bfloat16,
    )
    train_step = build_train_step(setup.bundle, setup.optimizer, donate=False)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(b, li, d)).astype(np.float32))
    txt = jnp.asarray(rng.normal(size=(b, lt, d)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, bench.N_CLASSES, size=b).astype(np.int64))
    box = [setup.state]

    def once(i):
        box[0], logs = train_step(box[0], (img, txt), y,
                                  jax.random.key(990 + i), None)
        return logs["loss"]

    print(f"batch={b} li={li} lt={lt} d={d} attn={attn_impl}", flush=True)
    print("compiling...", flush=True)
    loss = once(0)
    print(f"compiled; loss={float(loss):.4f}", flush=True)

    td = tempfile.mkdtemp(prefix="prof_fusion_trace_")
    jax.profiler.start_trace(td)
    barrier = None
    for i in range(steps):
        barrier = once(1 + i)
    float(barrier)
    jax.profiler.stop_trace()

    trace_report.print_step_report(
        td, steps=steps, batch=b,
        flops=analytic_step_flops(b, li, lt, d), top=top,
    )
    print(f"\ntrace dir: {td}")


if __name__ == "__main__":
    main()
