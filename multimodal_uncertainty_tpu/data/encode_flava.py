"""Offline FLAVA encoding of (image, text) pairs.

Reference ``data/encoding_with_flava.py:14-99``: run ``facebook/flava-full``
over each sample, saving per-sample image embeddings (~197 x 768) and text
embeddings (<=max_len x 768) plus error-case lists.

TPU re-design: encodes straight into the packed memory-mapped shard layout
that the training path consumes (see data/flava_encoded.py) instead of one
file pair per sample. Model calls are per-sample like the reference (each
sample's error must be attributable for the ``{phase}_error_cases.txt``
contract); the win is on the *consumer* side. Requires the ``transformers``
FLAVA weights locally (``local_files_only`` — no network here).
"""
from __future__ import annotations

import os
from typing import Callable, List, Optional

import numpy as np

from multimodal_uncertainty_tpu.data.flava_encoded import read_jsonl


def _load_flava(model_name_or_path: str):
    """Load (processor, model). Split out so tests can inject a stub
    (the transformers lazy module resists monkeypatching in this env)."""
    from transformers import FlavaModel, FlavaProcessor

    processor = FlavaProcessor.from_pretrained(
        model_name_or_path, local_files_only=True
    )
    model = FlavaModel.from_pretrained(model_name_or_path, local_files_only=True)
    return processor, model.eval()


def encoding_with_flava(
    datapath: str,
    phase: str,
    *,
    model_name_or_path: str = "facebook/flava-full",
    label_dict: Optional[list] = None,
    batch_size: int = 8,
    max_text_length: int = 512,
    out_dir: Optional[str] = None,
    per_file: bool = False,
    name_extractor: Optional[Callable] = None,
) -> List[int]:
    """Encode one split; returns the error-case row indices.

    Writes packed shards to ``{datapath}/flava_packed`` (default) or
    per-sample ``.img``/``.text`` npy files to ``{datapath}/flava_embeds``
    when ``per_file=True`` (legacy layout parity).
    """
    import torch
    from PIL import Image

    processor, model = _load_flava(model_name_or_path)

    rows = read_jsonl(os.path.join(datapath, f"{phase}.jsonl"))
    emb_dir = os.path.join(datapath, "flava_embeds")
    os.makedirs(emb_dir, exist_ok=True)
    out_dir = out_dir or os.path.join(datapath, "flava_packed")
    os.makedirs(out_dir, exist_ok=True)

    img_parts, txt_parts, labels = [], [], []
    img_off, txt_off = [0], [0]
    error_cases: List[int] = []

    for start in range(0, len(rows), batch_size):
        chunk = rows[start : start + batch_size]
        for offset, row in enumerate(chunk):
            idx = start + offset
            try:
                image = Image.open(
                    os.path.join(datapath, row["img"])
                ).convert("RGB")
                inputs = processor(
                    text=[row["text"]],
                    images=[image],
                    return_tensors="pt",
                    padding=True,
                    truncation=True,
                    max_length=max_text_length,
                )
                with torch.no_grad():
                    out = model(**inputs)
                img_e = out.image_embeddings[0].numpy().astype(np.float32)
                txt_e = out.text_embeddings[0].numpy().astype(np.float32)
            except Exception as e:  # noqa: BLE001 — per-sample error contract
                print(f"error case {idx}: {e}")
                error_cases.append(idx)
                continue

            if per_file:
                assert name_extractor is not None
                save_name = name_extractor(row["img"])
                np.save(os.path.join(emb_dir, save_name + ".img.npy"), img_e)
                os.replace(
                    os.path.join(emb_dir, save_name + ".img.npy"),
                    os.path.join(emb_dir, save_name + ".img"),
                )
                np.save(os.path.join(emb_dir, save_name + ".text.npy"), txt_e)
                os.replace(
                    os.path.join(emb_dir, save_name + ".text.npy"),
                    os.path.join(emb_dir, save_name + ".text"),
                )
            img_parts.append(img_e)
            txt_parts.append(txt_e)
            label = row["label"]
            labels.append(label_dict.index(label) if label_dict else label)
            img_off.append(img_off[-1] + img_e.shape[0])
            txt_off.append(txt_off[-1] + txt_e.shape[0])

    d = img_parts[0].shape[-1] if img_parts else 768
    np.save(
        os.path.join(out_dir, f"{phase}_img.npy"),
        np.concatenate(img_parts) if img_parts else np.zeros((0, d), np.float32),
    )
    np.save(
        os.path.join(out_dir, f"{phase}_txt.npy"),
        np.concatenate(txt_parts) if txt_parts else np.zeros((0, d), np.float32),
    )
    np.save(os.path.join(out_dir, f"{phase}_img_offsets.npy"), np.asarray(img_off))
    np.save(os.path.join(out_dir, f"{phase}_txt_offsets.npy"), np.asarray(txt_off))
    np.save(
        os.path.join(out_dir, f"{phase}_labels.npy"), np.asarray(labels, np.int64)
    )
    with open(os.path.join(emb_dir, f"{phase}_error_cases.txt"), "w") as f:
        for i in error_cases:
            f.write(f"{i}\n")
    # provenance marker: distinguishes genuinely model-encoded shards from
    # the synthetic stand-ins tools/make_synthetic_dataset.py fabricates
    # (tools/parity_matrix.py keys its REAL check on this file)
    import json as _json

    with open(os.path.join(out_dir, "PROVENANCE.json"), "w") as f:
        _json.dump({"encoder": "encode_flava",
                    "model": model_name_or_path,
                    "max_text_length": max_text_length}, f)
    return error_cases


def generation_for_hatefulmeme(datapath: str, **kwargs):
    """Reference ``generation_for_hatefulmeme`` (``:44-61``)."""
    for phase in ("train", "dev", "test"):
        encoding_with_flava(datapath, phase, label_dict=list(range(2)), **kwargs)


def generation_for_food101(datapath: str, **kwargs):
    """Reference ``generation_for_food101`` (``:63-81``)."""
    from multimodal_uncertainty_tpu.data.food101 import get_labels_and_frequencies

    labels, _ = get_labels_and_frequencies(os.path.join(datapath, "train.jsonl"))
    for phase in ("train", "dev", "test"):
        encoding_with_flava(datapath, phase, label_dict=labels, **kwargs)


def main(argv=None):
    """The DEPLOYMENT.md §5 provisioning CLI:

    ``python -m multimodal_uncertainty_tpu.data.encode_flava
      --dataset hateful-meme-dataset --model weights/flava-full``

    ``--dataset`` is a directory name under ``$DATA_DIR`` (or an absolute
    path) holding ``{train,dev,test}.jsonl`` + images; datasets whose name
    contains 'food101' use the Food-101 label vocabulary, everything else
    the binary hateful-memes labels (reference encoding_with_flava:83-99).
    """
    import argparse

    from multimodal_uncertainty_tpu import DATA_DIR

    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--dataset", required=True,
                    help="dataset dir name under $DATA_DIR, or a path")
    ap.add_argument("--model", default="facebook/flava-full",
                    help="HF name (cache hit only: local_files_only) or a "
                         "local weights directory")
    ap.add_argument("--max_text_length", type=int, default=512)
    ap.add_argument("--batch_size", type=int, default=8)
    args = ap.parse_args(argv)
    datapath = (args.dataset if os.path.isdir(args.dataset)
                else os.path.join(DATA_DIR, args.dataset))
    # normpath first: basename('food101/') is '' and would silently route
    # Food-101 through the hateful-memes (binary-label) encoder
    dirname = os.path.basename(os.path.normpath(datapath))
    gen = (generation_for_food101 if "food101" in dirname
           else generation_for_hatefulmeme)
    gen(datapath, model_name_or_path=args.model,
        max_text_length=args.max_text_length, batch_size=args.batch_size)


if __name__ == "__main__":
    main()
