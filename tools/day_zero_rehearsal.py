#!/usr/bin/env python3
"""Day-zero dress rehearsal (VERDICT r4 #4): execute the DEPLOYMENT.md §5
provisioning runbook end-to-end against FABRICATED reference-format
artifacts, proving every command, path pairing, and converter works before
the real-data day.

What it fabricates (random weights, reference-exact formats):
  $DATA_DIR/food101/            UPMC source tree: images/{train,test}/
                                <label>/<label>_<num>.jpg + texts_txt/
                                <label>/<label>_<num>.txt
  $DATA_DIR/hateful-meme-dataset/  img/*.png + {train,dev,test}.jsonl
  $DATA_DIR/FashionMNIST/raw/   idx-ubyte files (train/t10k images+labels)
  weights/bert-base-uncased/pytorch_model.bin   (HF BertModel, random)
  weights/resnet152_imagenet.pt                 (torchvision, random)
  weights/vilt-b32-mlm/pytorch_model.bin        (HF ViltForMaskedLM, random)
  weights/flava-full/           full HF dir: FlavaModel (reduced layers,
                                768-wide — format-true) + FlavaProcessor
  weights/SHA256SUMS            via the runbook's own find|sha256sum line

Then it runs, verbatim from docs/DEPLOYMENT.md §5:
  1. the Food-101 offline formatter (python -c one-liner),
  2. python -m multimodal_uncertainty_tpu.data.encode_flava --dataset
     hateful-meme-dataset --model weights/flava-full,
  3. MMU_REHEARSAL=1 tools/parity_matrix.py — every row must come out
     REAL-FORMAT/FAKE-WEIGHTS (rehearsal),
  4. a ViLT training leg: train.py --framework vilt --vilt_weights
     <fabricated mlm checkpoint> (parity_matrix has no ViLT config).

Usage:  MMU_PLATFORM=cpu python tools/day_zero_rehearsal.py
          [--root DIR] [--epochs 1] [--sample_size 8] [--skip_vilt]
"""
from __future__ import annotations

import argparse
import json
import os
import struct
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402

LABELS = ("apple_pie", "baby_back_ribs", "sushi")


def log(msg):
    print(f"[rehearsal +{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def sh(cmd, env=None, timeout=3600, shell=False):
    log("RUN " + (cmd if shell else " ".join(map(str, cmd))))
    e = dict(os.environ)
    e.setdefault("MMU_PLATFORM", "cpu")
    e.update(env or {})
    p = subprocess.run(cmd, cwd=REPO, env=e, timeout=timeout, shell=shell,
                       capture_output=True, text=True)
    if p.returncode != 0:
        sys.stderr.write(p.stdout[-3000:] + "\n" + p.stderr[-5000:])
        raise RuntimeError(f"rehearsal step failed: {cmd}")
    return p.stdout


# --- fabrication ----------------------------------------------------------

def make_upmc_tree(root, n_train=16, n_test=4, px=256, seed=0):
    from PIL import Image

    rng = np.random.default_rng(seed)
    for split, n in (("train", n_train), ("test", n_test)):
        for label in LABELS:
            os.makedirs(os.path.join(root, "images", split, label),
                        exist_ok=True)
            os.makedirs(os.path.join(root, "texts_txt", label), exist_ok=True)
            for i in range(n):
                num = i if split == "train" else 900 + i
                arr = rng.integers(0, 255, size=(px, px, 3)).astype(np.uint8)
                Image.fromarray(arr).save(os.path.join(
                    root, "images", split, label, f"{label}_{num}.jpg"),
                    quality=85)
                with open(os.path.join(root, "texts_txt", label,
                                       f"{label}_{num}.txt"), "w") as f:
                    f.write(f"A Classic {label.replace('_', ' ')} recipe; "
                            f"step {i}: mix, (bake) & serve -- enjoy!\n")


def make_hm_tree(root, n_train=24, n_eval=6, px=128, seed=1):
    from PIL import Image

    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(root, "img"), exist_ok=True)
    words = "meme text caption funny photo person street dog cat".split()
    for phase, n in (("train", n_train), ("dev", n_eval), ("test", n_eval)):
        with open(os.path.join(root, f"{phase}.jsonl"), "w") as f:
            for i in range(n):
                name = f"{phase}{i:05d}"
                arr = rng.integers(0, 255, size=(px, px, 3)).astype(np.uint8)
                Image.fromarray(arr).save(
                    os.path.join(root, "img", f"{name}.png"))
                row = {"id": name, "img": f"img/{name}.png",
                       "label": int(rng.integers(0, 2)),
                       "text": " ".join(
                           words[int(rng.integers(0, len(words)))]
                           for _ in range(int(rng.integers(4, 10))))}
                f.write(json.dumps(row) + "\n")


def make_fmnist_idx(root, n_train=512, n_test=128, seed=2):
    """idx-ubyte files in the torchvision FashionMNIST/raw layout."""
    rng = np.random.default_rng(seed)
    raw = os.path.join(root, "FashionMNIST", "raw")
    os.makedirs(raw, exist_ok=True)
    for prefix, n in (("train", n_train), ("t10k", n_test)):
        imgs = rng.integers(0, 255, size=(n, 28, 28)).astype(np.uint8)
        lbls = rng.integers(0, 10, size=n).astype(np.uint8)
        with open(os.path.join(raw, f"{prefix}-images-idx3-ubyte"), "wb") as f:
            f.write(struct.pack(">IIII", 2051, n, 28, 28))
            f.write(imgs.tobytes())
        with open(os.path.join(raw, f"{prefix}-labels-idx1-ubyte"), "wb") as f:
            f.write(struct.pack(">II", 2049, n))
            f.write(lbls.tobytes())


def make_bert_vocab(path, size=30522):
    """A WordPiece vocab file in the bert-base format (specials first).
    Default size 30522 = bert-base-uncased: the embedding-table width the
    fabricated BERT/FLAVA checkpoints carry, so the vocab<->checkpoint
    pairing is format-true (the first rehearsal run caught exactly this
    mismatch)."""
    words = ("a classic recipe step mix bake serve enjoy apple pie baby back "
             "ribs sushi meme text caption funny photo person street dog cat "
             "the and of to in is it this that").split()
    subwords = [f"##{c}" for c in "abcdefghijklmnopqrstuvwxyz0123456789"]
    toks = list(dict.fromkeys(  # order-preserving dedupe (e.g. 'a' twice)
        ["[PAD]"] + [f"[unused{i}]" for i in range(10)]
        + ["[UNK]", "[CLS]", "[SEP]", "[MASK]"]
        + list("abcdefghijklmnopqrstuvwxyz0123456789")
        + subwords + sorted(set(words))
    ))
    toks += [f"tok{i}" for i in range(size - len(toks))]
    with open(path, "w") as f:
        f.write("\n".join(toks) + "\n")


def _fabricate_resnet152_sd():
    """Random-weight state dict with torchvision resnet152's exact keys and
    shapes (what the runbook's torchvision one-liner would save)."""
    import torch

    g = torch.Generator().manual_seed(0)
    sd = {}

    def conv(name, cout, cin, k):
        sd[name + ".weight"] = torch.randn(cout, cin, k, k,
                                           generator=g) * 0.05

    def bn(name, c):
        sd[name + ".weight"] = torch.ones(c)
        sd[name + ".bias"] = torch.zeros(c)
        sd[name + ".running_mean"] = torch.zeros(c)
        sd[name + ".running_var"] = torch.ones(c)
        sd[name + ".num_batches_tracked"] = torch.tensor(0)

    conv("conv1", 64, 3, 7)
    bn("bn1", 64)
    widths, blocks, cin = (64, 128, 256, 512), (3, 8, 36, 3), 64
    for li, (w, n) in enumerate(zip(widths, blocks), 1):
        for b in range(n):
            base = f"layer{li}.{b}"
            c_in = cin if b == 0 else w * 4
            conv(base + ".conv1", w, c_in, 1)
            bn(base + ".bn1", w)
            conv(base + ".conv2", w, w, 3)
            bn(base + ".bn2", w)
            conv(base + ".conv3", w * 4, w, 1)
            bn(base + ".bn3", w * 4)
            if b == 0:
                conv(base + ".downsample.0", w * 4, c_in, 1)
                bn(base + ".downsample.1", w * 4)
        cin = w * 4
    sd["fc.weight"] = torch.randn(1000, 2048, generator=g) * 0.01
    sd["fc.bias"] = torch.zeros(1000)
    return sd


def make_weights(wdir):
    import torch

    # 1. BERT-base (HF format, random weights — ~440 MB, full-size so the
    #    converter exercises the real shapes)
    from transformers import BertConfig, BertModel

    os.makedirs(os.path.join(wdir, "bert-base-uncased"), exist_ok=True)
    bert = BertModel(BertConfig())
    torch.save(bert.state_dict(),
               os.path.join(wdir, "bert-base-uncased", "pytorch_model.bin"))
    del bert

    # 2. ResNet-152 state dict in the torchvision key/shape contract
    #    (torchvision itself is not in this image; the fabricator mirrors
    #    resnet152's exact structure — bottleneck x(3,8,36,3), expansion 4)
    torch.save(_fabricate_resnet152_sd(),
               os.path.join(wdir, "resnet152_imagenet.pt"))

    # 3. ViLT b32 mlm-style checkpoint (HF format, random)
    from transformers import ViltConfig, ViltForMaskedLM

    os.makedirs(os.path.join(wdir, "vilt-b32-mlm"), exist_ok=True)
    vilt = ViltForMaskedLM(ViltConfig())
    torch.save(vilt.state_dict(),
               os.path.join(wdir, "vilt-b32-mlm", "pytorch_model.bin"))
    del vilt

    # 4. FLAVA: full HF directory (model + processor) so
    #    from_pretrained(local_files_only=True) works exactly like the
    #    runbook's weights/flava-full download. Reduced layer counts keep
    #    the rehearsal fast; hidden sizes stay 768 (format-true embeddings).
    from transformers import (BertTokenizerFast, FlavaConfig,
                              FlavaImageProcessor, FlavaModel,
                              FlavaProcessor)

    fdir = os.path.join(wdir, "flava-full")
    os.makedirs(fdir, exist_ok=True)
    cfg = FlavaConfig(
        image_config={"num_hidden_layers": 2},
        text_config={"num_hidden_layers": 2},
        multimodal_config={"num_hidden_layers": 1},
    )
    FlavaModel(cfg).save_pretrained(fdir, safe_serialization=False)
    vocab_path = os.path.join(fdir, "vocab.txt")
    make_bert_vocab(vocab_path)
    tok = BertTokenizerFast(vocab_file=vocab_path)
    FlavaProcessor(image_processor=FlavaImageProcessor(),
                   tokenizer=tok).save_pretrained(fdir)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default=None,
                    help="rehearsal root (default: a temp dir)")
    ap.add_argument("--epochs", type=int, default=1)
    ap.add_argument("--sample_size", type=int, default=8)
    ap.add_argument("--skip_vilt", action="store_true")
    ap.add_argument("--skip_fabricate", action="store_true",
                    help="reuse an existing --root from a previous run")
    args = ap.parse_args()

    import tempfile

    root = args.root or tempfile.mkdtemp(prefix="day_zero_")
    data_dir = os.path.join(root, "data")
    wdir = os.path.join(root, "weights")
    os.makedirs(data_dir, exist_ok=True)
    os.makedirs(wdir, exist_ok=True)
    env = {"DATA_DIR": data_dir, "MMU_REHEARSAL": "1",
           "BERT_WEIGHTS": os.path.join(wdir, "bert-base-uncased",
                                        "pytorch_model.bin"),
           "RESNET_WEIGHTS": os.path.join(wdir, "resnet152_imagenet.pt")}

    if not args.skip_fabricate:
        log(f"fabricating reference-format artifacts under {root}")
        make_upmc_tree(os.path.join(data_dir, "food101"))
        make_hm_tree(os.path.join(data_dir, "hateful-meme-dataset"))
        make_fmnist_idx(data_dir)
        make_weights(wdir)
        # MMBT's tokenizer vocab: day zero uses the BERT vocab
        make_bert_vocab(os.path.join(data_dir, "food101", "vocab.txt"))

    # --- runbook step 1 (verbatim command shape): sha256 pinning ---------
    sh(["bash", "-c",
        f"cd {wdir} && find . -type f \\( -name '*.bin' -o -name '*.pt' "
        "-o -name '*.safetensors' \\) -exec sha256sum {} \\; "
        "| tee SHA256SUMS"])

    # --- runbook step 2: offline formatter + FLAVA encoding --------------
    sh([sys.executable, "-c",
        "from multimodal_uncertainty_tpu.data.food101 import "
        "format_food101_dataset; "
        f"print(format_food101_dataset('{data_dir}/food101'))"], env=env)
    sh([sys.executable, "-m",
        "multimodal_uncertainty_tpu.data.encode_flava",
        "--dataset", "hateful-meme-dataset",
        "--model", os.path.join(wdir, "flava-full")], env=env)

    # --- runbook step 3: the parity matrix (REAL-format rows) ------------
    sh([sys.executable, "tools/parity_matrix.py",
        "--epochs", str(args.epochs), "--sample_size",
        str(args.sample_size),
        "--out", os.path.join(root, "PARITY_rehearsal.md")],
       env=env, timeout=7200)

    # --- step 4: ViLT leg (real import path, fabricated mlm checkpoint) --
    if not args.skip_vilt:
        save = os.path.join(root, "vilt_run")
        sh([sys.executable, "train.py", "--framework", "vilt",
            "--dataset", "hateful-meme-dataset", "--save_path", save,
            "--n_epochs", "1", "--batch_size", "2", "--lr", "1e-4",
            "--sample_size", "4",
            "--vilt_weights", os.path.join(wdir, "vilt-b32-mlm",
                                           "pytorch_model.bin"),
            "--vocab_file", os.path.join(data_dir, "food101", "vocab.txt")],
           env=env, timeout=7200)
        assert os.path.exists(os.path.join(save, "history.csv"))
        log("vilt leg OK (history.csv written)")

    out = open(os.path.join(root, "PARITY_rehearsal.md")).read()
    n_real = out.count("REAL-FORMAT/FAKE-WEIGHTS")
    log(f"parity rows marked REAL-FORMAT/FAKE-WEIGHTS: {n_real}")
    print(out)
    log(f"rehearsal root kept at {root}")
    if n_real == 0:
        raise SystemExit("no REAL-FORMAT rows — rehearsal failed")


if __name__ == "__main__":
    main()
