#!/usr/bin/env python3
"""Device-trace probe: plain Pallas kernels vs their custom_partitioning
(`pallas_sharded`) wrappers on a 1-device mesh, plus ring attention vs
plain flash — all per-call DEVICE time (wall clock through the axon tunnel
swings run to run; the device stream is the stable signal, BASELINE.md
measurement notes).

Purpose (VERDICT r3 weak #6 / next #6 + #3): train.py auto-selects
`pallas_sharded` on TPU meshes and `ring` under --sequence_parallel; this
proves on real hardware that the custom_partitioning wrapper adds zero
dispatch/layout overhead vs the plain kernels, and that a 1-device ring
costs the same as the flash kernel it wraps — before any real multi-chip
run trusts the auto-selection.

Run on the TPU: python tools/profile_sharded_kernels.py
"""
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

CALLS = 5
B, LI, LT, D = 256, 197, 77, 768


def device_ms(trace_dir):
    from bench import _device_ms_from_trace

    return _device_ms_from_trace(trace_dir)


def probe(name, fn, barrier):
    fn()  # warmup/compile
    float(barrier(fn()))
    td = tempfile.mkdtemp(prefix="prof_sharded_")
    jax.profiler.start_trace(td)
    out = None
    for _ in range(CALLS):
        out = fn()
    float(barrier(out))
    jax.profiler.stop_trace()
    ms = device_ms(td) / CALLS
    print(f"{name}: {ms:.2f} ms/call (device)")
    sys.stdout.flush()
    return ms


def main():
    from multimodal_uncertainty_tpu.ops.attention import configure_ring_mesh
    from multimodal_uncertainty_tpu.parallel.mesh import make_mesh
    from multimodal_uncertainty_tpu.training.steps import build_train_step
    from multimodal_uncertainty_tpu.zoo import setup_flava

    print(f"backend={jax.default_backend()} devices={len(jax.devices())}")
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(B, LI, D)).astype(np.float32))
    txt = jnp.asarray(rng.normal(size=(B, LT, D)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 2, size=B).astype(np.int64))

    results = {}

    # --- flagship train step: plain kernels vs custom_partitioning wrapper
    def step_probe(label, attn_impl, mesh=None):
        setup = setup_flava(
            model_type="MIMO-shuffle-instance", n_classes=2, lr=1e-4,
            n_epochs=100, steps_per_epoch=100,
            sample_shapes=((B, LI), (B, LT)), seed_key=jax.random.key(0),
            attn_impl=attn_impl, dtype=jnp.bfloat16,
        )
        step = build_train_step(setup.bundle, setup.optimizer, donate=False)
        state = setup.state
        if mesh is not None:
            from multimodal_uncertainty_tpu.parallel.sharding import (
                shard_state,
            )

            state = shard_state(state, mesh)
        box = [state]

        def once():
            box[0], logs = step(box[0], (img, txt), y, jax.random.key(1), None)
            return logs["loss"]

        results[label] = probe(label, once, float)

    step_probe("train step, attn_impl=pallas (plain)", "pallas")
    mesh1 = make_mesh(1, model_parallel=1)
    step_probe("train step, attn_impl=pallas_sharded (1-dev mesh)",
               "pallas_sharded", mesh=mesh1)

    # --- ring attention on a 1-device seq mesh vs the flash kernel --------
    S, DR, H = 2048, 768, 6  # Dh=128; S past the whole-seq VMEM budget
    q, k, v = (jnp.asarray(rng.normal(size=(8, S, DR)).astype(np.float32),
                           jnp.bfloat16) for _ in range(3))
    mask = jnp.ones((8, S), bool)

    from multimodal_uncertainty_tpu.ops.attention import attention_heads_last

    flash = jax.jit(lambda q, k, v: attention_heads_last(
        q, k, v, mask, n_head=H, impl="flash"))
    results["flash attention (plain), S=2048"] = probe(
        "flash attention (plain), S=2048", lambda: flash(q, k, v),
        lambda o: jnp.sum(o.astype(jnp.float32)))

    # 3-axis mesh built explicitly: the 'seq' axis must exist (size 1)
    grid = np.asarray(jax.devices()[:1]).reshape(1, 1, 1)
    from jax.sharding import Mesh

    ring_mesh = Mesh(grid, ("data", "model", "seq"))
    configure_ring_mesh(ring_mesh)
    try:
        ring = jax.jit(lambda q, k, v: attention_heads_last(
            q, k, v, mask, n_head=H, impl="ring"))
        results["ring attention (1-dev seq mesh), S=2048"] = probe(
            "ring attention (1-dev seq mesh), S=2048", lambda: ring(q, k, v),
            lambda o: jnp.sum(o.astype(jnp.float32)))
    finally:
        configure_ring_mesh(None)

    print("\nsummary:", {k: round(v, 2) for k, v in results.items()})


if __name__ == "__main__":
    main()
