"""AOT-artifact serving microbench: live predictor vs jax.export artifact.

Answers "does the model-code-free artifact cost throughput?" — builds the
flagship fusion serving config, exports it (symbolic batch, XLA attention:
the shape-polymorphic path), then measures the SAME forward three ways on
the current backend at a serving batch:

  * live jitted forward (XLA attention — apples-to-apples with the artifact)
  * live jitted forward (Pallas fused attention — the predictor's default)
  * the deserialized artifact via ``Exported.call`` under jit

Run on the real TPU chip:  python tools/bench_export.py [--batch 256]

Chained-dispatch + scalar-fetch barrier, per BASELINE.md measurement notes.
CAVEAT: on the tunneled backend the wall-clock of these paths swings 3-10x
run to run; tools/profile_export.py is the authoritative comparison (device
-trace times: artifacts add ZERO device overhead; allow_tpu_kernels
artifacts run at live-Pallas speed).
"""
from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_uncertainty_tpu.export import load_exported, save_exported, symbolic_batch_specs
from multimodal_uncertainty_tpu.models import FlavaFusionTransformer

B = int(sys.argv[sys.argv.index("--batch") + 1]) if "--batch" in sys.argv else 256
LI, LT, D, C, E = 224, 96, 768, 2, 2  # pad_multiple-32 lengths (197/77 padded)
STEPS = 20


def _inputs():
    rng = np.random.default_rng(0)
    img = rng.normal(size=(B, LI, D)).astype(np.float32)
    txt = rng.normal(size=(B, LT, D)).astype(np.float32)
    im = np.zeros((B, LI), bool)
    tm = np.zeros((B, LT), bool)
    im[:, :197] = True
    tm[:, :77] = True
    return img, txt, im, tm


def _model(attn_impl):
    return FlavaFusionTransformer(
        out_dim=E, num_classes=C,
        multimodal_num_attention_heads=3, multimodal_num_hidden_layers=3,
        attn_impl=attn_impl,
    )


def _chain(fn):
    """Run STEPS chained dispatches; the salt folds the previous output back
    in so XLA cannot dead-code or overlap-cheat; one scalar fetch = barrier."""
    salt = jnp.zeros(())
    probs = fn(salt)
    float(probs.sum())  # compile + barrier
    t0 = time.perf_counter()
    for _ in range(STEPS):
        probs = fn(probs.mean() * 1e-9)
    float(probs.sum())
    dt = time.perf_counter() - t0
    return B * STEPS / dt, dt / STEPS * 1e3, probs


def main():
    print(f"backend={jax.default_backend()} batch={B} (LI,LT,D)=({LI},{LT},{D})")
    img, txt, im, tm = _inputs()
    model_x = _model("xla")
    variables = model_x.init(
        {"params": jax.random.key(0)},
        (jnp.asarray(img[:2]), jnp.asarray(txt[:2])), train=False,
    )

    def forward(model):
        @jax.jit
        def f(v, img, txt, im, tm, salt):
            logits = model.apply(
                v, (img + salt, txt), train=False, img_mask=im, txt_mask=tm
            )
            return jax.nn.softmax(logits.astype(jnp.float32), -1).mean(1)

        jimg, jtxt, jim, jtm = map(jnp.asarray, (img, txt, im, tm))
        return lambda salt: f(variables, jimg, jtxt, jim, jtm, salt)

    live_x, ms_x, p_x = _chain(forward(model_x))
    print(f"live forward (xla attn)    {ms_x:8.2f} ms/fwd  {live_x:10.0f} samples/s")
    live_p, ms_p, _ = _chain(forward(_model("auto")))
    print(f"live forward (pallas attn) {ms_p:8.2f} ms/fwd  {live_p:10.0f} samples/s")

    with tempfile.TemporaryDirectory() as d:
        def fn(v, img, txt, im, tm):
            logits = model_x.apply(
                v, (img, txt), train=False, img_mask=im, txt_mask=tm
            )
            return jax.nn.softmax(logits.astype(jnp.float32), -1).mean(1)

        save_exported(
            d, fn, variables,
            symbolic_batch_specs([img, txt, im, tm]),
            platforms=("cpu", "tpu"),
        )
        loaded = load_exported(d)

        @jax.jit
        def call(v, img, txt, im, tm, salt):
            return loaded.exported.call(v, img + salt, txt, im, tm)

        jv = loaded.variables
        jimg, jtxt, jim, jtm = map(jnp.asarray, (img, txt, im, tm))
        art, ms_a, p_a = _chain(
            lambda salt: call(jv, jimg, jtxt, jim, jtm, salt)
        )
        print(f"AOT artifact (symbolic b)  {ms_a:8.2f} ms/fwd  {art:10.0f} samples/s")
        print(f"symbolic artifact vs live-xla: {art / live_x:.3f}x   "
              f"max |dprob|: {float(jnp.abs(p_a - p_x).max()):.2e}")

    # fixed-shape artifacts: the TPU serving shape is baked (one artifact
    # per batch bucket, like the live predictors' bucket padding). Three
    # variants isolate where artifact overhead comes from:
    #   * cpu+tpu multi-platform (the portable default)
    #   * current-platform only (drops the platform_index wrapping)
    #   * current-platform + Pallas kernels baked in (allow_tpu_kernels)
    def fn_pallas(v, img, txt, im, tm):
        logits = _model("auto").apply(
            v, (img, txt), train=False, img_mask=im, txt_mask=tm
        )
        return jax.nn.softmax(logits.astype(jnp.float32), -1).mean(1)

    fixed_variants = [
        ("fixed cpu+tpu", fn, ("cpu", "tpu"), False, live_x, "live-xla"),
        ("fixed 1-platform", fn, None, False, live_x, "live-xla"),
        ("fixed + tpu kernels", fn_pallas, None, True, live_p, "live-pallas"),
    ]
    for name, f, platforms, kern, ref_rate, ref_name in fixed_variants:
        with tempfile.TemporaryDirectory() as d:
            specs = [
                jax.ShapeDtypeStruct(a.shape, jnp.asarray(a).dtype)
                for a in (img, txt, im, tm)
            ]
            try:
                save_exported(d, f, variables, specs, platforms=platforms,
                              allow_tpu_kernels=kern)
            except Exception as e:  # noqa: BLE001 — report and continue
                print(f"AOT artifact ({name}): export failed: {e!r}")
                continue
            loaded_f = load_exported(d)

            @jax.jit
            def call_f(v, img, txt, im, tm, salt, _l=loaded_f):
                return _l.exported.call(v, img + salt, txt, im, tm)

            jv = loaded_f.variables
            jimg, jtxt, jim, jtm = map(jnp.asarray, (img, txt, im, tm))
            artf, ms_f, p_f = _chain(
                lambda salt: call_f(jv, jimg, jtxt, jim, jtm, salt)
            )
            print(f"AOT artifact ({name:19s}) {ms_f:8.2f} ms/fwd  "
                  f"{artf:10.0f} samples/s   {artf / ref_rate:.3f}x {ref_name}"
                  f"   max |dprob| vs live-xla: "
                  f"{float(jnp.abs(p_f - p_x).max()):.2e}")


if __name__ == "__main__":
    main()
