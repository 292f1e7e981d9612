"""Benchmark: flagship FLAVA-fusion MIMO training throughput on TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no numbers (BASELINE.md), so the baseline is the
reference-equivalent torch model (same architecture/af/optimizer family) run
on CPU — matching BASELINE.json's north star of ">=5x CPU-reference
end-to-end samples/sec/chip". Config: FLAVA fusion transformer
(768 wide, 3 layers, 3 heads), MIMO-shuffle-instance, batch 256,
197 image + 77 text tokens — the Hateful-Memes training shape.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

B, LI, LT, D = 256, 197, 77, 768
N_CLASSES = 2
WARMUP_STEPS = 3
MEASURE_STEPS = 20
BASELINE_STEPS = 2
BASELINE_B = 64

# Measured once in this container (1 vCPU, torch 2.13 CPU, 1 thread,
# batch 64, 3-layer/768-wide fusion transformer fwd+bwd+AdamW):
# 0.95 samples/sec. Re-measure with --remeasure-baseline (takes ~4 min).
CACHED_BASELINE_SPS = 0.95


def _enable_compile_cache():
    """Persistent XLA compile cache: measured on this axon backend, a
    cached program loads in ~2s where the remote compile takes minutes —
    so repeat bench runs (and the driver's) skip the compile wall. Off via
    MMU_COMPILE_CACHE="". Measurement-neutral: only warmup is affected."""
    import jax

    cc = os.environ.get("MMU_COMPILE_CACHE", "/tmp/mmu_compile_cache")
    if cc:
        jax.config.update("jax_compilation_cache_dir", cc)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)


def bench_tpu(fast_dw=None, with_trace=False):
    import jax
    import jax.numpy as jnp

    _enable_compile_cache()
    from multimodal_uncertainty_tpu.zoo import setup_flava

    if fast_dw is None:
        fast_dw = "--fast-dw" in sys.argv

    setup = setup_flava(
        model_type="MIMO-shuffle-instance",
        n_classes=N_CLASSES,
        lr=1e-4,
        n_epochs=100,
        steps_per_epoch=100,
        sample_shapes=((B, LI), (B, LT)),
        seed_key=jax.random.key(0),
        attn_impl="auto",
        dtype=jnp.bfloat16,
        fast_dw=fast_dw,
    )
    from multimodal_uncertainty_tpu.training.steps import build_train_step

    train_step = build_train_step(setup.bundle, setup.optimizer)

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(B, LI, D)).astype(np.float32))
    txt = jnp.asarray(rng.normal(size=(B, LT, D)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, N_CLASSES, size=B).astype(np.int64))

    state = setup.state
    for i in range(WARMUP_STEPS):
        state, logs = train_step(state, (img, txt), y, jax.random.key(i), None)
    # NOTE: sync via scalar fetch — on the axon-tunneled TPU backend,
    # block_until_ready does not actually block, so fetching a scalar that
    # depends on the whole chain is the only honest barrier.
    float(logs["loss"])

    # Median of 3 chained windows: a tunnel RPC stall inside one window
    # deflates that window only — the median is the honest steady-state
    # rate (wall-clock on this link swings run to run; BASELINE.md notes).
    rates = []
    for w in range(3):
        t0 = time.perf_counter()
        for i in range(MEASURE_STEPS):
            state, logs = train_step(
                state, (img, txt), y, jax.random.key(100 + 50 * w + i), None
            )
        float(logs["loss"])  # barrier: depends on the whole window's chain
        rates.append(B * MEASURE_STEPS / (time.perf_counter() - t0))

    if with_trace:
        box = [state]

        def once():
            box[0], logs_ = train_step(
                box[0], (img, txt), y, jax.random.key(7000), None
            )
            return logs_["loss"]

        try:
            traced = _traced_step_sps(once, 6, B)
        except Exception:  # noqa: BLE001 — trace support is best-effort
            traced = None
        return sorted(rates)[1], traced
    return sorted(rates)[1]


def bench_torch_cpu_baseline() -> float:
    """Reference-equivalent model in torch on CPU (architecture per
    reference src/model.py:225-304: pre-LN CLIP blocks, QuickGELU, AdamW)."""
    import torch
    import torch.nn as nn

    torch.set_num_threads(os.cpu_count() or 8)

    class Block(nn.Module):
        def __init__(self, d, h):
            super().__init__()
            self.attn = nn.MultiheadAttention(d, h, batch_first=True)
            self.ln1 = nn.LayerNorm(d)
            self.fc = nn.Linear(d, 4 * d)
            self.proj = nn.Linear(4 * d, d)
            self.ln2 = nn.LayerNorm(d)

        def forward(self, x):
            h = self.ln1(x)
            x = x + self.attn(h, h, h, need_weights=False)[0]
            h = self.fc(self.ln2(x))
            h = self.proj(h * torch.sigmoid(1.702 * h))  # QuickGELU
            return x + h

    class Fusion(nn.Module):
        def __init__(self, d=D, layers=3, heads=3, e=2, c=N_CLASSES):
            super().__init__()
            self.pi = nn.Linear(d, d)
            self.pt = nn.Linear(d, d)
            self.ln_pre = nn.LayerNorm(d)
            self.blocks = nn.ModuleList([Block(d, heads) for _ in range(layers)])
            self.ln_post = nn.LayerNorm(d)
            self.heads = nn.ModuleList([nn.Linear(d, c) for _ in range(e)])

        def forward(self, img, txt):
            x = torch.cat([self.pi(img), self.pt(txt)], dim=1)
            x = self.ln_pre(x)
            for b in self.blocks:
                x = b(x)
            x = self.ln_post(x)
            return torch.stack([f(x[:, i]) for i, f in enumerate(self.heads)], 1)

    model = Fusion()
    opt = torch.optim.AdamW(model.parameters(), lr=1e-4, betas=(0.9, 0.98), eps=1e-9)
    loss_fn = nn.CrossEntropyLoss()
    g = torch.Generator().manual_seed(0)
    bb = BASELINE_B
    img = torch.randn(bb, LI, D, generator=g)
    txt = torch.randn(bb, LT, D, generator=g)
    y = torch.randint(0, N_CLASSES, (bb, 2), generator=g)

    def step():
        opt.zero_grad()
        # MIMO shuffle (reference data_forming_func_transformer)
        pi, pt = torch.randperm(bb, generator=g), torch.randperm(bb, generator=g)
        out = model(img[pi], txt[pt])
        loss = loss_fn(out.reshape(-1, N_CLASSES), torch.stack([y[pi, 0], y[pt, 1]], 1).reshape(-1))
        loss.backward()
        opt.step()

    step()  # warmup
    t0 = time.perf_counter()
    for _ in range(BASELINE_STEPS):
        step()
    dt = time.perf_counter() - t0
    return bb * BASELINE_STEPS / dt


# ---------------------------------------------------------------------------
# End-to-end benchmark incl. preprocessing (north star: BASELINE.json —
# "Food-101 img+text end-to-end samples/sec/chip incl. preprocessing").
# Measures the full pipeline: storage -> decode/tokenize/collate (host
# workers + prefetch) -> host->device transfer -> jitted train step,
# overlapped — plus a per-stage breakdown so the bottleneck is attributable.
#
# Honesty notes for THIS environment: the TPU is reached through a tunnel
# whose host->device link moves ~4-7 MB/s (measured; a real v5e host moves
# GB/s over PCIe), so on the tunnel the end-to-end number is transfer-bound.
# The breakdown lines let the reader reconstruct the non-tunnel rate:
# min(host_pipeline, device_step) once transfer is not the artifact.
# ---------------------------------------------------------------------------


def _cycle(loader):
    while True:
        for item in loader:
            yield item


def _synth_flava_packed(root: str, n: int, d: int = D, seed: int = 0):
    """Packed shards at Hateful-Memes-realistic lengths, stored bf16
    (pack_split dtype option: half the bytes of f32, lossless for a bf16
    compute path)."""
    import ml_dtypes

    rng = np.random.default_rng(seed)
    os.makedirs(root, exist_ok=True)
    lis = rng.integers(150, LI + 1, size=n)
    lts = rng.integers(30, LT + 1, size=n)
    img = rng.normal(size=(int(lis.sum()), d)).astype(ml_dtypes.bfloat16)
    txt = rng.normal(size=(int(lts.sum()), d)).astype(ml_dtypes.bfloat16)
    np.save(os.path.join(root, "train_img.npy"), img)
    np.save(os.path.join(root, "train_txt.npy"), txt)
    np.save(os.path.join(root, "train_img_offsets.npy"),
            np.concatenate([[0], np.cumsum(lis)]))
    np.save(os.path.join(root, "train_txt_offsets.npy"),
            np.concatenate([[0], np.cumsum(lts)]))
    np.save(os.path.join(root, "train_labels.npy"),
            rng.integers(0, N_CLASSES, size=n).astype(np.int64))


def _synth_food101_raw(root: str, n: int, px: int = 512, seed: int = 0):
    """jsonl + JPEGs + WordPiece vocab. px=512 approximates UPMC-Food-101
    source images (also large enough that --fast_decode's DCT 1/2-scale
    decode actually engages: draft needs source >= 2x the 256 target)."""
    from PIL import Image

    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    words = ("spicy sweet fried baked grilled noodle rice burger pizza salad "
             "cheese sauce tomato garlic pepper onion recipe dinner lunch").split()
    rows = []
    for i in range(n):
        label = int(rng.integers(0, 5))
        arr = (rng.normal(128, 40, size=(px, px, 3))).clip(0, 255).astype(np.uint8)
        rel = f"images/train{i:05d}.jpg"
        Image.fromarray(arr).save(os.path.join(root, rel), quality=85)
        text = " ".join(words[int(rng.integers(0, len(words)))]
                        for _ in range(int(rng.integers(8, 24))))
        rows.append({"img": rel, "text": text, "label": f"dish_{label}"})
    import json as _json

    for phase in ("train", "dev", "test"):
        with open(os.path.join(root, f"{phase}.jsonl"), "w") as f:
            for r in (rows if phase == "train" else rows[: max(2, n // 8)]):
                f.write(_json.dumps(r) + "\n")
    with open(os.path.join(root, "vocab.txt"), "w") as f:
        for tok in ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + sorted(set(words)):
            f.write(tok + "\n")


def _measure_pipeline(loader, put_and_step, resident_step, steps, batch,
                      put_fn=None):
    """Shared measurement harness. Returns the breakdown dict."""
    import time as _t

    # 1) host pipeline alone (decode/tokenize/collate with prefetch)
    it = _cycle(loader)
    next(it)  # warm caches / thread pool
    t0 = _t.perf_counter()
    n_host = 0
    for _ in range(steps):
        x, y = next(it)
        n_host += len(y)
    host_sps = n_host / (_t.perf_counter() - t0)

    # 2+3) resident step rate (chained, scalar-fetch barrier)
    x, y = next(it)
    step_sps, transfer_sps = resident_step(x, y)

    # 4) overlapped end-to-end: host pipeline in the loader's producer
    # thread, host->device transfer in the DevicePrefetcher's thread, step
    # dispatch on the main thread — all three stages run concurrently.
    from multimodal_uncertainty_tpu.data.loaders import DevicePrefetcher

    it = iter(DevicePrefetcher(_cycle(loader), put_fn=put_fn))
    x, y = next(it)
    float(put_and_step(x, y))  # warmup; barrier so t0 excludes its chain
    t0 = _t.perf_counter()
    n = 0
    logs_last = None
    for _ in range(steps):
        x, y = next(it)
        logs_last = put_and_step(x, y)
        n += len(y)
    float(logs_last)  # barrier: depends on the whole chain
    e2e_sps = n / (_t.perf_counter() - t0)
    it.close()  # reap the prefetch + loader producer threads
    return {
        "host_pipeline_sps": round(host_sps, 2),
        "transfer_sps": round(transfer_sps, 2),
        "device_step_sps": round(step_sps, 2),
        "end2end_sps": round(e2e_sps, 2),
        "batch": batch,
        "steps": steps,
    }


def bench_end2end_flava(batch=128, steps=5, workers=0, transfer_quant=False):
    import tempfile

    import jax
    import jax.numpy as jnp

    from multimodal_uncertainty_tpu.data.flava_encoded import (
        PackedFlavaDataset,
        collate_fn_flava,
    )
    from multimodal_uncertainty_tpu.data.loaders import MapLoader
    from multimodal_uncertainty_tpu.training.steps import build_train_step
    from multimodal_uncertainty_tpu.zoo import setup_flava

    tmp = tempfile.mkdtemp(prefix="bench_flava_")
    _synth_flava_packed(tmp, n=max(2 * batch, 256))
    ds = PackedFlavaDataset(tmp, "train")
    loader = MapLoader(ds, batch, collate_fn_flava, shuffle=True, seed=0,
                       num_workers=workers, prefetch=2)
    (img, txt), y = next(iter(loader))
    li, lt = img.shape[1], txt.shape[1]

    setup = setup_flava(
        model_type="MIMO-shuffle-instance", n_classes=N_CLASSES, lr=1e-4,
        n_epochs=100, steps_per_epoch=100, sample_shapes=((batch, li), (batch, lt)),
        seed_key=jax.random.key(0), attn_impl="auto", dtype=jnp.bfloat16,
    )
    train_step = build_train_step(setup.bundle, setup.optimizer, donate=False)
    state_box = [setup.state]
    key_ctr = [0]

    qput = None
    if transfer_quant:
        from multimodal_uncertainty_tpu.data.transfer_quant import (
            Int8TransferPut,
        )

        qput = Int8TransferPut()

    def put_and_step(x, yy):
        key_ctr[0] += 1
        im, tx = jax.device_put(x[0]), jax.device_put(x[1])
        y_d = yy if isinstance(yy, jax.Array) else jax.device_put(np.asarray(yy))
        state_box[0], logs = train_step(
            state_box[0], (im, tx), y_d, jax.random.key(key_ctr[0]), None
        )
        return logs["loss"]

    def resident_step(x, yy):
        import time as _t

        im, tx = jnp.asarray(x[0]), jnp.asarray(x[1])
        y_d = jnp.asarray(np.asarray(yy))
        st = state_box[0]
        for i in range(2):  # warmup
            st, logs = train_step(st, (im, tx), y_d, jax.random.key(900 + i), None)
        float(logs["loss"])
        t0 = _t.perf_counter()
        for i in range(10):
            st, logs = train_step(st, (im, tx), y_d, jax.random.key(950 + i), None)
        float(logs["loss"])
        step_sps = 10 * len(yy) / (_t.perf_counter() - t0)

        red = jax.jit(lambda a, b: a.astype(jnp.float32).sum()
                      + b.astype(jnp.float32).sum())
        float(red(im, tx))  # compile
        if qput is not None:
            # transfer stage = host quantize + int8 wire + device dequant
            warm = qput((x, yy))
            float(red(warm[0][0], warm[0][1]))
            t0 = _t.perf_counter()
            for _ in range(2):
                out = qput((x, yy))
                float(red(out[0][0], out[0][1]))
        else:
            t0 = _t.perf_counter()
            for _ in range(2):
                float(red(jax.device_put(x[0]), jax.device_put(x[1])))
        transfer_sps = 2 * len(yy) / (_t.perf_counter() - t0)
        return step_sps, transfer_sps

    def traced_step_sps():
        (x, yy) = next(_cycle(loader))
        im, tx = jnp.asarray(x[0]), jnp.asarray(x[1])
        y_d = jnp.asarray(np.asarray(yy))
        box = [state_box[0], None]

        def once():
            box[0], logs = train_step(
                box[0], (im, tx), y_d, jax.random.key(990), None
            )
            return logs["loss"]

        once()  # ensure compiled before tracing
        return _traced_step_sps(once, 6, len(yy))

    out = _measure_pipeline(loader, put_and_step, resident_step, steps, batch,
                            put_fn=qput)
    out["bytes_per_batch_mb"] = round((img.nbytes + txt.nbytes) / 1e6, 1)
    if transfer_quant:
        # derive the wire size from the actual quantizer output so layout
        # changes (leaf rank, scale shape) can never desync this number
        from multimodal_uncertainty_tpu.data.transfer_quant import (
            quantize_rows,
        )

        wire = sum(
            part.nbytes
            for leaf in (img, txt)
            for part in quantize_rows(np.asarray(leaf))
        )
        out["bytes_per_batch_mb_wire"] = round(wire / 1e6, 1)
        out["transfer_quant"] = "int8"
    try:
        out["device_trace_step_sps"] = traced_step_sps()
    except Exception as exc:  # noqa: BLE001 — trace support is best-effort
        out["device_trace_error"] = f"{type(exc).__name__}: {exc}"[:120]
    return out


def bench_end2end_raw(batch=32, steps=4, workers=0, tiny=False,
                      fast_decode=None, batch_decode=None):
    import tempfile

    import jax
    import jax.numpy as jnp

    from multimodal_uncertainty_tpu.data.food101 import get_food101
    from multimodal_uncertainty_tpu.models.bert import BertConfig
    from multimodal_uncertainty_tpu.zoo import setup_mmbt
    from multimodal_uncertainty_tpu.training.steps import build_train_step

    if fast_decode is None:
        fast_decode = "--fast_decode" in sys.argv
    if batch_decode is None:
        batch_decode = "--batch_decode" in sys.argv
    tmp = tempfile.mkdtemp(prefix="bench_raw_")
    _synth_food101_raw(tmp, n=max(2 * batch, 128))
    train, _, _, n_classes, vocab = get_food101(
        datapath=tmp, batch_size=batch, n_workers=workers, max_seq_len=512,
        num_image_embeds=3, fast_decode=fast_decode,
        batch_decode=batch_decode,
    )
    if tiny:
        import dataclasses as _dc

        cfg = _dc.replace(BertConfig.base(), hidden_size=64,
                          num_hidden_layers=2, num_attention_heads=2,
                          intermediate_size=128)
        resnet_layers = (1, 1, 1, 1)
    else:
        cfg, resnet_layers = BertConfig.base(), (3, 8, 36, 3)

    (text, segment, mask, imgs), y = next(iter(train))
    setup = setup_mmbt(
        n_classes=n_classes, bert_config=cfg, resnet_layers=resnet_layers,
        num_image_embeds=3, gradient_accumulation_steps=1,
        vocab_size=vocab.vocab_sz, sample_txt_len=text.shape[1],
        seed_key=jax.random.key(0), attn_impl="auto",
        dtype=jnp.bfloat16 if not tiny else None,
    )
    train_step = build_train_step(setup.bundle, setup.optimizer, donate=False)
    state_box = [setup.state]
    key_ctr = [0]
    flags = jnp.asarray([False, False])

    def put_and_step(x, yy):
        key_ctr[0] += 1
        x_d = jax.tree_util.tree_map(jax.device_put, tuple(x))
        y_d = yy if isinstance(yy, jax.Array) else jax.device_put(np.asarray(yy))
        state_box[0], logs = train_step(
            state_box[0], x_d, y_d, jax.random.key(key_ctr[0]), flags
        )
        return logs["loss"]

    def resident_step(x, yy):
        import time as _t

        x_d = jax.tree_util.tree_map(jnp.asarray, tuple(x))
        y_d = jnp.asarray(np.asarray(yy))
        st = state_box[0]
        for i in range(2):
            st, logs = train_step(st, x_d, y_d, jax.random.key(900 + i), flags)
        float(logs["loss"])
        t0 = _t.perf_counter()
        n_meas = 6
        for i in range(n_meas):
            st, logs = train_step(st, x_d, y_d, jax.random.key(950 + i), flags)
        float(logs["loss"])
        step_sps = n_meas * len(yy) / (_t.perf_counter() - t0)

        red = jax.jit(lambda im: im.astype(jnp.float32).sum())
        float(red(x_d[3]))
        t0 = _t.perf_counter()
        for _ in range(2):
            float(red(jax.device_put(x[3])))
        transfer_sps = 2 * len(yy) / (_t.perf_counter() - t0)
        return step_sps, transfer_sps

    def traced_step_sps():
        (x, yy) = next(_cycle(train))
        x_d = jax.tree_util.tree_map(jnp.asarray, tuple(x))
        y_d = jnp.asarray(np.asarray(yy))
        box = [state_box[0]]

        def once():
            box[0], logs = train_step(
                box[0], x_d, y_d, jax.random.key(990), flags
            )
            return logs["loss"]

        once()  # ensure compiled before tracing
        return _traced_step_sps(once, 6, len(yy))

    out = _measure_pipeline(train, put_and_step, resident_step, steps, batch)
    out["bytes_per_batch_mb"] = round(
        sum(np.asarray(a).nbytes for a in (text, segment, mask, imgs)) / 1e6, 1
    )
    out["decode"] = ("native_batch" if batch_decode
                     else "native_fast" if fast_decode else "pil")
    try:
        out["device_trace_step_sps"] = traced_step_sps()
    except Exception as exc:  # noqa: BLE001 — trace support is best-effort
        out["device_trace_error"] = f"{type(exc).__name__}: {exc}"[:120]
    return out


def _arg_after(flag, default):
    if flag in sys.argv:
        i = sys.argv.index(flag)
        if i + 1 < len(sys.argv):
            return sys.argv[i + 1]
    return default


def _wire_probe(mb: float = 4.0, reps: int = 3) -> float:
    """Host->device wire speed right now, MB/s: device_put a fixed buffer
    and barrier on a dependent scalar. The tunneled link swings ~2x hour to
    hour (VERDICT r4 weak #3); this field lets any reader separate 'the
    code got slower' from 'the wire was slower' in round-over-round JSON."""
    import time as _t

    import jax
    import jax.numpy as jnp

    buf = np.random.default_rng(0).normal(size=(int(mb * 1e6 // 4),)).astype(
        np.float32
    )
    red = jax.jit(lambda a: a.sum())
    float(red(jax.device_put(buf)))  # warmup: compile + first transfer
    t0 = _t.perf_counter()
    for _ in range(reps):
        float(red(jax.device_put(buf)))
    return round(reps * buf.nbytes / 1e6 / (_t.perf_counter() - t0), 2)


def _end2end_stats(fn, runs=3, max_runs=7, target_spread=1.3):
    """Run an end2end bench >= `runs` times (adding runs up to `max_runs`
    while the wall numbers spread > `target_spread` — VERDICT r4 #2);
    report the MEDIAN end-to-end rate with min/max spread plus the median
    run's per-stage breakdown.

    The HEADLINE comparison field is `headline_sps`: the median
    device-trace step rate (union of device-stream intervals — immune to
    tunnel weather) when traces are available, else the wall median, with
    `headline_source` saying which. Wall medians stay as secondary fields;
    `wall_usable: false` marks them untrustworthy when the spread never
    converged."""
    import statistics

    results = [fn() for _ in range(runs)]

    def _best_window(rs):
        """Tightest max/min ratio over any `runs`-sized subset (contiguous
        in sorted order — the optimal subset for a range criterion). The
        all-runs spread is monotonically non-decreasing, so testing it
        could never converge after one early outlier; a single tunnel
        stall should cost extra runs only until `runs` CLEAN runs exist."""
        vals = sorted(r["end2end_sps"] for r in rs)
        best_ratio, best_vals = None, vals
        for i in range(len(vals) - runs + 1):
            w = vals[i:i + runs]
            ratio = w[-1] / max(w[0], 1e-9)
            if best_ratio is None or ratio < best_ratio:
                best_ratio, best_vals = ratio, w
        return best_ratio, best_vals

    while _best_window(results)[0] > target_spread and len(results) < max_runs:
        results.append(fn())
    rates = [r["end2end_sps"] for r in results]
    spread_ratio, window = _best_window(results)
    spread_ratio = round(spread_ratio, 2)
    med = statistics.median(window)  # wall stats over the converged window
    med_run = min(results, key=lambda r: abs(r["end2end_sps"] - med))
    traces = [r["device_trace_step_sps"] for r in results
              if r.get("device_trace_step_sps")]
    trace_med = round(statistics.median(traces), 2) if traces else None
    return {
        "headline_sps": trace_med if trace_med else round(med, 2),
        "headline_source": "device_trace" if trace_med else "wall_median",
        "end2end_sps_median": round(med, 2),
        "end2end_sps_spread": [round(min(window), 2), round(max(window), 2)],
        "end2end_runs": rates,
        "spread_ratio": spread_ratio,
        "noisy": spread_ratio > target_spread,
        "wall_usable": spread_ratio <= target_spread,
        "device_trace_step_sps_runs": traces,
        **{k: v for k, v in med_run.items() if k != "end2end_sps"},
    }


def _device_ms_from_trace(trace_dir: str) -> float:
    """Device busy time (ms) in a jax.profiler trace: the UNION of OP-level
    X-event intervals on the busiest device pid — delegates to the ONE
    shared implementation in multimodal_uncertainty_tpu/utils/traces.py
    (also behind tools/trace_report.py), so the dispatch-umbrella filter
    can never desync between the bench headline and the report tool.

    Union, not sum — trace events nest (op hierarchies), so summing
    durations double-counts parents over children (measured ~3x inflation
    on the flagship step). Excluded from the union (r5 fix): bare-number
    dispatch-umbrella spans and whole-program ``jit_*(fingerprint)`` spans.
    On the tunneled backend those umbrella tracks bridge the inter-step
    dispatch gaps, so including them made the 'device' number
    dispatch-contaminated — r04's MMBT 476 sps was really ~873 sps of
    actual device execution. Wall clock through the axon tunnel swings
    2-70x; the op stream is the stable signal (BASELINE.md measurement
    notes)."""
    from multimodal_uncertainty_tpu.utils.traces import device_busy_ms

    return device_busy_ms(trace_dir)


def _traced_step_sps(step_once, n_steps: int, batch: int):
    """samples/sec of `step_once` from the device trace (n_steps calls)."""
    import tempfile

    import jax

    td = tempfile.mkdtemp(prefix="bench_trace_")
    jax.profiler.start_trace(td)
    barrier = None
    for _ in range(n_steps):
        barrier = step_once()
    float(barrier)
    jax.profiler.stop_trace()
    ms = _device_ms_from_trace(td)
    return round(batch * n_steps / (ms / 1e3), 2) if ms > 0 else None


def _ratio_fields(sps, baseline_sps):
    """Both names for the CPU-baseline RATIO: 'vs_baseline' is the driver's
    required key; 'x_vs_cpu_baseline' states the semantics (a multiple of
    the 0.95 samples/s torch-CPU reference run, NOT a baseline absolute)."""
    r = round(sps / baseline_sps, 2)
    return {
        "vs_baseline": r,
        "x_vs_cpu_baseline": r,
        "cpu_baseline_sps": baseline_sps,
    }


def main_end2end():
    _enable_compile_cache()
    path = _arg_after("--end2end", "flava") or "flava"
    if path.startswith("--"):
        path = "flava"
    workers = int(_arg_after("--workers", "0"))
    tiny = "--tiny" in sys.argv
    runs = int(_arg_after("--runs", "3"))
    if path == "flava":
        batch = int(_arg_after("--batch", "128"))
        steps = int(_arg_after("--steps", "20"))
        res = _end2end_stats(
            lambda: bench_end2end_flava(
                batch=batch, steps=steps, workers=workers,
                transfer_quant="--transfer_quant" in sys.argv), runs)
    else:
        batch = int(_arg_after("--batch", "32"))
        steps = int(_arg_after("--steps", "20"))
        res = _end2end_stats(
            lambda: bench_end2end_raw(batch=batch, steps=steps,
                                      workers=workers, tiny=tiny), runs)
    print(json.dumps({
        "metric": f"end2end_{path}_train_samples_per_sec_per_chip",
        "value": res["end2end_sps_median"],
        "unit": "samples/sec",
        **_ratio_fields(res["end2end_sps_median"], CACHED_BASELINE_SPS),
        "wire_probe_mbps": _wire_probe(),
        "breakdown": res,
    }))


def main():
    _enable_compile_cache()
    if "--end2end" in sys.argv:
        main_end2end()
        return
    if "--remeasure-baseline" in sys.argv:
        baseline_sps = bench_torch_cpu_baseline()
    else:
        baseline_sps = CACHED_BASELINE_SPS
    tpu_sps, traced_sps = bench_tpu(with_trace=True)
    line = {
        "metric": "flava_fusion_mimo_train_samples_per_sec_per_chip",
        "value": round(tpu_sps, 2),
        "unit": "samples/sec",
        **_ratio_fields(tpu_sps, baseline_sps),
        # tunnel-immune companion to `value` (same program, device-stream
        # time): compare THIS field round over round; `value` (wall) moves
        # with link weather, wire_probe_mbps quantifies said weather
        "value_device_trace": traced_sps,
        "wire_probe_mbps": _wire_probe(),
    }
    if "--skip-end2end" not in sys.argv:
        # attach the north-star end-to-end story for BOTH pipelines
        # (packed FLAVA shards + raw Food-101 JPEG->MMBT), ≥20 measured
        # steps x 3 runs, median±spread (storage -> preprocess -> transfer
        # -> step, overlapped); never let it sink the headline
        try:
            line["end2end_flava"] = _end2end_stats(
                lambda: bench_end2end_flava(batch=64, steps=20))
        except Exception as exc:  # noqa: BLE001 — report, don't fail bench
            line["end2end_error"] = f"{type(exc).__name__}: {exc}"[:200]
        try:
            # same pipeline with --transfer_quant int8: the wire (not the
            # host or the chip) bounds this path here, so halving the
            # transferred bytes is the end-to-end lever (BASELINE.md)
            line["end2end_flava_q8"] = _end2end_stats(
                lambda: bench_end2end_flava(batch=64, steps=20,
                                            transfer_quant=True))
        except Exception as exc:  # noqa: BLE001
            line["end2end_q8_error"] = f"{type(exc).__name__}: {exc}"[:200]
        try:
            # production decode mode (native batch decode; PIL-path numbers
            # and the parity caveat live in BASELINE.md / DEVIATIONS.MD).
            # adaptive runs (5..7) until wall spread < 1.3x, else
            # wall_usable:false — headline_sps is trace-based either way.
            line["end2end_raw_mmbt"] = _end2end_stats(
                lambda: bench_end2end_raw(batch=32, steps=20,
                                          fast_decode=True,
                                          batch_decode=True), runs=5)
        except Exception as exc:  # noqa: BLE001
            line["end2end_raw_error"] = f"{type(exc).__name__}: {exc}"[:200]
    print(json.dumps(line))


if __name__ == "__main__":
    main()
