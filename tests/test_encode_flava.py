"""Offline FLAVA encoder contract tests (stubbed model — no weights in env).

Validates ``data/encode_flava.py`` against the reference contract
(``/root/reference/data/encoding_with_flava.py:14-81``): per-sample
encoding, error-case list, per-file legacy layout — plus the TPU-native
packed-shard output the training path consumes.
"""
import json
import os
import types

import numpy as np
import pytest
import torch

from multimodal_uncertainty_tpu.data.encode_flava import encoding_with_flava
from multimodal_uncertainty_tpu.data.flava_encoded import (
    PackedFlavaDataset,
    load_error_cases,
)

pytestmark = pytest.mark.quick  # <=2-min smoke tier (make check)

D = 8


class _StubProcessor:
    def __call__(self, *, text, images, **kw):
        # text length drives the stub's embedding length (offsets check)
        return {"n_tok": torch.tensor([len(text[0].split()) + 2])}

    @classmethod
    def from_pretrained(cls, *a, **kw):
        return cls()


class _StubModel:
    def eval(self):
        return self

    def __call__(self, *, n_tok):
        n = int(n_tok[0])
        g = torch.Generator().manual_seed(n)
        return types.SimpleNamespace(
            image_embeddings=torch.randn(1, 5, D, generator=g),
            text_embeddings=torch.randn(1, n, D, generator=g),
        )

    @classmethod
    def from_pretrained(cls, *a, **kw):
        return cls()


@pytest.fixture()
def stubbed(monkeypatch):
    # Inject via our module's loader hook: the transformers lazy module
    # swaps its own sys.modules entry on attribute access in this env, so
    # patching transformers directly does not stick.
    from multimodal_uncertainty_tpu.data import encode_flava

    monkeypatch.setattr(
        encode_flava, "_load_flava",
        lambda name: (_StubProcessor(), _StubModel()),
    )


def _make_dataset(root, rows):
    from PIL import Image

    os.makedirs(os.path.join(root, "img"), exist_ok=True)
    with open(os.path.join(root, "dev.jsonl"), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    for r in rows:
        if r.get("_write_img", True):
            Image.new("RGB", (16, 16), (128, 10, 10)).save(
                os.path.join(root, r["img"])
            )


def test_packed_shards_offsets_labels_and_error_cases(tmp_path, stubbed):
    root = str(tmp_path)
    rows = [
        {"img": "img/a.png", "text": "one two three", "label": "x"},
        # missing image file -> per-sample error case (reference :33-36)
        {"img": "img/missing.png", "text": "boom", "label": "y",
         "_write_img": False},
        {"img": "img/c.png", "text": "five six seven eight nine", "label": "y"},
    ]
    _make_dataset(root, rows)

    errors = encoding_with_flava(root, "dev", label_dict=["x", "y"])
    assert errors == [1]
    assert load_error_cases(root, "dev") == [1]

    ds = PackedFlavaDataset(os.path.join(root, "flava_packed"), "dev")
    assert len(ds) == 2  # error case skipped
    img0, txt0, y0 = ds[0]
    img1, txt1, y1 = ds[1]
    assert img0.shape == (5, D) and img1.shape == (5, D)
    # stub text length = n_words + 2
    assert txt0.shape == (5, D) and txt1.shape == (7, D)
    assert (y0, y1) == (0, 1)  # label_dict.index mapping


def test_per_file_legacy_layout(tmp_path, stubbed):
    root = str(tmp_path)
    rows = [{"img": "img/a.png", "text": "hello world", "label": 1}]
    _make_dataset(root, rows)

    encoding_with_flava(
        root, "dev", per_file=True,
        name_extractor=lambda p: os.path.splitext(os.path.basename(p))[0],
    )
    emb = os.path.join(root, "flava_embeds")
    img = np.load(os.path.join(emb, "a.img"), allow_pickle=False)
    txt = np.load(os.path.join(emb, "a.text"), allow_pickle=False)
    assert img.shape == (5, D) and txt.shape == (4, D)
    # packed shards are written too (the training fast path)
    assert os.path.exists(os.path.join(root, "flava_packed", "dev_labels.npy"))


def test_empty_split_writes_valid_shards(tmp_path, stubbed):
    root = str(tmp_path)
    _make_dataset(root, [])
    errors = encoding_with_flava(root, "dev", label_dict=[])
    assert errors == []
    ds = PackedFlavaDataset(os.path.join(root, "flava_packed"), "dev")
    assert len(ds) == 0
