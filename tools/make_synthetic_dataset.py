#!/usr/bin/env python3
"""Generate synthetic stand-in datasets for hermetic smoke tests.

Creates the on-disk layouts the data layer expects (no network in this
environment):

* ``$DATA_DIR/hateful-meme-dataset``: {train,dev,test}.jsonl, img/*.png,
  flava_embeds/{phase}_error_cases.txt + packed FLAVA embedding shards
  (flava_packed/) with label-correlated random embeddings.
* ``$DATA_DIR/food101``: {train,dev,test}.jsonl, images/*.png, vocab.txt
  (WordPiece vocab over the generated texts).
"""
from __future__ import annotations

import argparse
import json
import os

import numpy as np

WORDS = (
    "spicy sweet fried baked grilled noodle rice burger pizza salad cheese "
    "sauce meme text funny angry happy caption photo person dog cat street"
).split()


def _write_png(path, rng, label, size=64):
    from PIL import Image

    yy, xx = np.meshgrid(np.arange(size), np.arange(size), indexing="ij")
    base = (np.sin(xx / 5.0 + label) + np.cos(yy / 7.0 + 2 * label)) * 60 + 128
    img = np.stack([base, np.roll(base, label, 0), np.roll(base, label, 1)], -1)
    img = np.clip(img + rng.normal(0, 10, img.shape), 0, 255).astype(np.uint8)
    Image.fromarray(img).save(path)


def _fake_text(rng, label, n=8):
    words = [WORDS[(int(rng.integers(0, len(WORDS))) + label) % len(WORDS)]
             for _ in range(n)]
    return " ".join(words)


def make_hateful_meme(root: str, n_train=64, n_eval=16, seed=0, d=768):
    rng = np.random.default_rng(seed)
    base = os.path.join(root, "hateful-meme-dataset")
    os.makedirs(os.path.join(base, "img"), exist_ok=True)
    emb_dir = os.path.join(base, "flava_embeds")
    packed = os.path.join(base, "flava_packed")
    os.makedirs(emb_dir, exist_ok=True)
    os.makedirs(packed, exist_ok=True)

    for phase, n in (("train", n_train), ("dev", n_eval), ("test", n_eval)):
        rows = []
        img_parts, txt_parts, labels = [], [], []
        img_off, txt_off = [0], [0]
        for i in range(n):
            label = int(rng.integers(0, 2))
            name = f"{phase}{i:05d}"
            img_rel = f"img/{name}.png"
            _write_png(os.path.join(base, img_rel), rng, label)
            rows.append({"id": i, "img": img_rel,
                         "text": _fake_text(rng, label), "label": label})
            li = int(rng.integers(5, 12))
            lt = int(rng.integers(4, 9))
            img_e = rng.normal(size=(li, d)).astype(np.float32) + label * 0.5
            txt_e = rng.normal(size=(lt, d)).astype(np.float32) - label * 0.5
            img_parts.append(img_e)
            txt_parts.append(txt_e)
            labels.append(label)
            img_off.append(img_off[-1] + li)
            txt_off.append(txt_off[-1] + lt)
        with open(os.path.join(base, f"{phase}.jsonl"), "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        with open(os.path.join(emb_dir, f"{phase}_error_cases.txt"), "w") as f:
            f.write("")  # no error cases in the synthetic set
        np.save(os.path.join(packed, f"{phase}_img.npy"),
                np.concatenate(img_parts))
        np.save(os.path.join(packed, f"{phase}_txt.npy"),
                np.concatenate(txt_parts))
        np.save(os.path.join(packed, f"{phase}_img_offsets.npy"),
                np.asarray(img_off))
        np.save(os.path.join(packed, f"{phase}_txt_offsets.npy"),
                np.asarray(txt_off))
        np.save(os.path.join(packed, f"{phase}_labels.npy"),
                np.asarray(labels, np.int64))
    print(f"hateful-meme-dataset written to {base}")


def make_food101(root: str, n_train=64, n_eval=16, n_classes=5, seed=1, d=768):
    rng = np.random.default_rng(seed)
    base = os.path.join(root, "food101")
    os.makedirs(os.path.join(base, "images"), exist_ok=True)
    packed = os.path.join(base, "flava_packed")
    os.makedirs(packed, exist_ok=True)
    class_names = [f"dish_{c}" for c in range(n_classes)]

    for phase, n in (("train", n_train), ("dev", n_eval), ("test", n_eval)):
        rows = []
        img_parts, txt_parts, labels = [], [], []
        img_off, txt_off = [0], [0]
        for i in range(n):
            label = int(rng.integers(0, n_classes))
            img_rel = f"images/{phase}{i:05d}.png"
            _write_png(os.path.join(base, img_rel), rng, label)
            rows.append({"img": img_rel, "text": _fake_text(rng, label),
                         "label": class_names[label]})
            li = int(rng.integers(5, 12))
            lt = int(rng.integers(4, 9))
            img_parts.append(
                rng.normal(size=(li, d)).astype(np.float32) + label * 0.3
            )
            txt_parts.append(
                rng.normal(size=(lt, d)).astype(np.float32) - label * 0.3
            )
            labels.append(label)
            img_off.append(img_off[-1] + li)
            txt_off.append(txt_off[-1] + lt)
        with open(os.path.join(base, f"{phase}.jsonl"), "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        np.save(os.path.join(packed, f"{phase}_img.npy"),
                np.concatenate(img_parts))
        np.save(os.path.join(packed, f"{phase}_txt.npy"),
                np.concatenate(txt_parts))
        np.save(os.path.join(packed, f"{phase}_img_offsets.npy"),
                np.asarray(img_off))
        np.save(os.path.join(packed, f"{phase}_txt_offsets.npy"),
                np.asarray(txt_off))
        np.save(os.path.join(packed, f"{phase}_labels.npy"),
                np.asarray(labels, np.int64))

    with open(os.path.join(base, "vocab.txt"), "w") as f:
        for tok in ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + sorted(set(WORDS)):
            f.write(tok + "\n")
    print(f"food101 written to {base}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--root", default=os.environ.get("DATA_DIR", "data_dir"))
    parser.add_argument("--n_train", type=int, default=64)
    parser.add_argument("--n_eval", type=int, default=16)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()
    os.makedirs(args.root, exist_ok=True)
    make_hateful_meme(args.root, args.n_train, args.n_eval, args.seed)
    make_food101(args.root, args.n_train, args.n_eval, seed=args.seed + 1)
