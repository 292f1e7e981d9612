"""FashionMNIST 4-view ("quarter") dataset.

Reference: ``QuarterCrop`` + ``get_fmnist`` (``src/dataset.py:104-175``) —
each 28x28 image is split into four 14x14 quarters stacked as views:
0 upper-left, 1 upper-right, 2 lower-left, 3 lower-right; pixel values scaled
to [0, 1]. Here the crop is one vectorized reshape over the whole split
(no per-image Python), producing (N, 4, 1, 14, 14) float32 arrays.

Data source: idx-ubyte files under ``$DATA_DIR/FashionMNIST/raw`` (the
torchvision layout). If image files are absent, ``synthetic=True`` generates
a deterministic class-structured stand-in so tests/benches run hermetically.
"""
from __future__ import annotations

import gzip
import os
import struct
from typing import Optional, Tuple

import numpy as np

from multimodal_uncertainty_tpu.data.loaders import ArrayLoader


def _read_idx(path: str) -> np.ndarray:
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rb") as f:
        magic = struct.unpack(">I", f.read(4))[0]
        ndim = magic & 0xFF
        dims = struct.unpack(">" + "I" * ndim, f.read(4 * ndim))
        data = np.frombuffer(f.read(), dtype=np.uint8)
    return data.reshape(dims)


def quarter_crop(images: np.ndarray) -> np.ndarray:
    """(N, 28, 28) uint8/float -> (N, 4, 1, 14, 14) float32 in [0, 1]."""
    n, h, w = images.shape
    assert h == 28 and w == 28, (h, w)
    x = images.reshape(n, 2, 14, 2, 14).transpose(0, 1, 3, 2, 4)
    # order rows-major: (0,0) UL, (0,1) UR, (1,0) LL, (1,1) LR
    x = x.reshape(n, 4, 1, 14, 14).astype(np.float32)
    if images.dtype == np.uint8:
        x /= 255.0
    return x


def _synthetic_split(n: int, seed: int) -> Tuple[np.ndarray, np.ndarray]:
    """Class-structured synthetic images: each class has a distinct smooth
    template + noise, so models can actually fit it in smoke tests."""
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, 10, size=n).astype(np.int64)
    yy, xx = np.meshgrid(np.arange(28), np.arange(28), indexing="ij")
    templates = np.stack(
        [
            (np.sin(xx / 3.0 + c) + np.cos(yy / 2.0 + 2 * c)) * 0.25 + 0.5
            for c in range(10)
        ]
    )
    imgs = templates[labels] + rng.normal(0, 0.08, size=(n, 28, 28))
    return np.clip(imgs, 0, 1).astype(np.float32), labels


def load_fmnist_arrays(
    datapath: str, train: bool, *, synthetic: bool = False, synthetic_n: int = 512,
    seed: int = 777,
) -> Tuple[np.ndarray, np.ndarray]:
    prefix = "train" if train else "t10k"
    raw = os.path.join(datapath, "FashionMNIST", "raw")
    img_path = os.path.join(raw, f"{prefix}-images-idx3-ubyte")
    lbl_path = os.path.join(raw, f"{prefix}-labels-idx1-ubyte")
    if not synthetic and os.path.exists(lbl_path) and os.path.exists(img_path):
        images = _read_idx(img_path)
        labels = _read_idx(lbl_path).astype(np.int64)
        return images, labels
    if (
        not synthetic
        and os.path.exists(img_path + ".gz")
        and os.path.exists(lbl_path + ".gz")
    ):
        images = _read_idx(img_path + ".gz")
        labels = _read_idx(lbl_path + ".gz").astype(np.int64)
        return images, labels
    return _synthetic_split(synthetic_n if train else synthetic_n // 4, seed + train)


def get_fmnist(
    datapath: Optional[str] = None,
    batch_size: int = 128,
    download: bool = False,  # kept for API parity; no network in this env
    shuffle: bool = True,
    sample_size: Optional[int] = None,
    seed: int = 777,
    synthetic: bool = False,
    synthetic_n: int = 512,
):
    """Returns (train_loader, test_loader, None) of (B, 4, 1, 14, 14) batches,
    mirroring the reference ``get_fmnist`` signature/return."""
    del download
    datapath = datapath or os.environ.get("DATA_DIR", ".")
    tr_imgs, tr_lbls = load_fmnist_arrays(
        datapath, True, synthetic=synthetic, synthetic_n=synthetic_n, seed=seed
    )
    te_imgs, te_lbls = load_fmnist_arrays(
        datapath, False, synthetic=synthetic, synthetic_n=synthetic_n, seed=seed
    )
    tr_x = quarter_crop(tr_imgs)
    te_x = quarter_crop(te_imgs)
    if sample_size is not None:
        tr_x, tr_lbls = tr_x[:sample_size], tr_lbls[:sample_size]
    train_loader = ArrayLoader(
        (tr_x, tr_lbls), batch_size, shuffle=shuffle, seed=seed
    )
    test_loader = ArrayLoader((te_x, te_lbls), batch_size, shuffle=False)
    return train_loader, test_loader, None
