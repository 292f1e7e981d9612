"""Per-stage host-pipeline profile for the raw Food-101 path (VERDICT r2
weak #5 / next-item #7b): measures where collate time goes — JPEG decode,
WordPiece tokenize, batch assembly — and which stages hold the GIL, so the
multi-core scaling ceiling is attributable (this container has 1 vCPU; true
parallel speedup can't be shown here, only the serial-share analysis).

GIL facts per stage (how, not guesswork):
* native batch decode (``make_batch_decode_collate``): ONE ctypes call per
  batch into a C++ thread pool; ctypes releases the GIL for the call's
  duration -> fully parallel across loader threads AND internally.
* native per-item decode (``--fast_decode``): one ctypes call per image —
  the decode itself releases the GIL but the per-item Python wrapper
  (file read, array alloc) doesn't.
* native tokenizer: one ctypes call per text (GIL released inside) + Python
  pre/post processing per item.
* assembly (padding/stacking/np.stack): pure Python/numpy under the GIL
  (numpy releases it only inside large ufunc bodies).

Usage: python tools/profile_collate.py [--batch 32] [--iters 5] [--px 512]
"""
from __future__ import annotations

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
            return sys.argv[i + 1]
    return default


def main():
    import tempfile

    from bench import _synth_food101_raw
    from multimodal_uncertainty_tpu.data.food101 import (
        JsonlDataset,
        collate_fn,
        get_labels_and_frequencies,
        make_batch_decode_collate,
    )
    from multimodal_uncertainty_tpu.data.native import NativeTokenizer
    from multimodal_uncertainty_tpu.data.tokenization import get_vocab

    batch = int(_arg("--batch", "32"))
    iters = int(_arg("--iters", "5"))
    px = int(_arg("--px", "512"))

    tmp = tempfile.mkdtemp(prefix="profile_collate_")
    _synth_food101_raw(tmp, n=batch, px=px)
    labels, _ = get_labels_and_frequencies(os.path.join(tmp, "train.jsonl"))
    vocab_file = os.path.join(tmp, "vocab.txt")
    tokenizer = NativeTokenizer(vocab_file, do_lower_case=True)
    vocab = get_vocab(vocab_file)

    def ds(fast, in_collate):
        return JsonlDataset(
            os.path.join(tmp, "train.jsonl"), tokenizer, vocab, len(labels),
            0.0, 160, 3, labels,
            fast_decode=fast, decode_in_collate=in_collate,
        )

    def timeit(fn, n=iters):
        fn()  # warm
        t0 = time.perf_counter()
        for _ in range(n):
            fn()
        return (time.perf_counter() - t0) / n * 1000  # ms

    out = {"batch": batch, "px": px}

    # ---- full collate variants (per batch) --------------------------------
    d_std = ds(False, False)
    items_std = None

    def full_std():
        nonlocal items_std
        items_std = [d_std[i] for i in range(batch)]
        return collate_fn(items_std)

    out["collate_pil_ms"] = round(timeit(full_std), 1)

    d_fast = ds(True, False)
    out["collate_native_fast_ms"] = round(
        timeit(lambda: collate_fn([d_fast[i] for i in range(batch)])), 1)

    d_bd = ds(True, True)
    bd_collate = make_batch_decode_collate()
    out["collate_batch_decode_ms"] = round(
        timeit(lambda: bd_collate([d_bd[i] for i in range(batch)])), 1)

    # ---- stage isolation (std path) ---------------------------------------
    texts = [d_std.data[i]["text"] for i in range(batch)]
    out["tokenize_ms"] = round(
        timeit(lambda: [tokenizer.encode(t) for t in texts]), 1)

    from PIL import Image

    paths = [os.path.join(tmp, d_std.data[i]["img"]) for i in range(batch)]

    def pil_decode_all():
        for p in paths:
            with Image.open(p) as im:
                im.convert("RGB").load()

    out["decode_pil_ms"] = round(timeit(pil_decode_all), 1)

    # assembly = std collate minus decode minus tokenize (already-built items)
    out["assembly_ms"] = round(timeit(lambda: collate_fn(items_std)), 1)

    # ---- GIL serial-share analysis ----------------------------------------
    # Under --batch_decode the decode is one GIL-free native call; the GIL
    # serial remainder per batch is tokenize-wrapper + assembly. Amdahl
    # ceiling across N loader cores = total / (serial + parallel/N).
    total = out["collate_batch_decode_ms"]
    serial = out["assembly_ms"] + out["tokenize_ms"]  # upper bound: tokenize
    serial = min(serial, total)                        # wrappers hold the GIL
    parallel = max(total - serial, 0.0)
    out["gil_serial_ms_upper_bound"] = round(serial, 1)
    for n in (4, 20):
        out[f"amdahl_ceiling_{n}core_x"] = round(
            total / (serial + parallel / n), 2)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
