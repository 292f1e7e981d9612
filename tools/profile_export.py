"""Device-trace probe: live pallas / live xla / fixed artifact (xla) /
fixed artifact (kernels) — per-call DEVICE time (stable over the tunnel;
wall-clock comparisons of these paths swing 3-10x run to run, see
BASELINE.md measurement notes, so artifact overhead can only be judged
from the device stream).

Measured 2026-08-18 (1x v5e, B=256 fusion forward): artifact-xla device
time == live-xla (87.8 ms/call) and artifact-with-kernels == live-pallas
(65.3 ms/call) — AOT artifacts add ZERO device overhead, and
allow_tpu_kernels recovers the full fused-attention speedup (1.34x).

Run: python tools/profile_export.py"""
import glob
import gzip
import json
import os
import sys
import tempfile
import collections

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_uncertainty_tpu.export import load_exported, save_exported
from multimodal_uncertainty_tpu.models import FlavaFusionTransformer

B, LI, LT, D, C, E = 256, 224, 96, 768, 2, 2
CALLS = 5


def _model(attn_impl):
    return FlavaFusionTransformer(
        out_dim=E, num_classes=C,
        multimodal_num_attention_heads=3, multimodal_num_hidden_layers=3,
        attn_impl=attn_impl,
    )


def device_ms(trace_dir):
    """Sum device-stream event durations per pid-name; return dict."""
    pid_names = {}
    totals = collections.Counter()
    for f in glob.glob(trace_dir + "/**/*.trace.json.gz", recursive=True):
        with gzip.open(f, "rt") as fh:
            data = json.load(fh)
        for e in data.get("traceEvents", []):
            if e.get("ph") == "M" and e.get("name") == "process_name":
                pid_names[e["pid"]] = e["args"].get("name", "")
        for e in data.get("traceEvents", []):
            if e.get("ph") == "X":
                totals[pid_names.get(e["pid"], str(e["pid"]))] += e.get("dur", 0)
    return {k: v / 1e3 for k, v in totals.items()}


def probe(name, fn):
    # warmup/compile
    out = fn()
    float(np.asarray(out).sum())
    td = tempfile.mkdtemp()
    jax.profiler.start_trace(td)
    for _ in range(CALLS):
        out = fn()
    float(np.asarray(out).sum())
    jax.profiler.stop_trace()
    per = device_ms(td)
    dev = {k: v for k, v in per.items() if "TPU" in k or "tpu" in k or "/device" in k.lower()}
    print(f"{name}: " + "  ".join(
        f"{k}={v / CALLS:.1f}ms/call" for k, v in sorted(per.items(), key=lambda kv: -kv[1])[:4]))
    sys.stdout.flush()


rng = np.random.default_rng(0)
img = jnp.asarray(rng.normal(size=(B, LI, D)).astype(np.float32))
txt = jnp.asarray(rng.normal(size=(B, LT, D)).astype(np.float32))
im = np.zeros((B, LI), bool); im[:, :197] = True
tm = np.zeros((B, LT), bool); tm[:, :77] = True
jim, jtm = jnp.asarray(im), jnp.asarray(tm)

model_x = _model("xla")
model_p = _model("auto")
variables = model_x.init({"params": jax.random.key(0)}, (img[:2], txt[:2]), train=False)


def mk_live(model):
    @jax.jit
    def f(v, img, txt, im, tm):
        logits = model.apply(v, (img, txt), train=False, img_mask=im, txt_mask=tm)
        return jax.nn.softmax(logits.astype(jnp.float32), -1).mean(1)
    return lambda: f(variables, img, txt, jim, jtm)


probe("live pallas", mk_live(model_p))
probe("live xla   ", mk_live(model_x))

specs = [jax.ShapeDtypeStruct(np.shape(a), jnp.asarray(a).dtype)
         for a in (img, txt, im, tm)]

for label, model, kern in (("artifact xla", model_x, False),
                           ("artifact kern", model_p, True)):
    def fn(v, a, b, c, d, _m=model):
        logits = _m.apply(v, (a, b), train=False, img_mask=c, txt_mask=d)
        return jax.nn.softmax(logits.astype(jnp.float32), -1).mean(1)

    with tempfile.TemporaryDirectory() as d:
        save_exported(d, fn, variables, specs, allow_tpu_kernels=kern)
        loaded = load_exported(d)
        call = jax.jit(loaded.exported.call)
        jv = loaded.variables
        probe(label, lambda: call(jv, img, txt, jim, jtm))
