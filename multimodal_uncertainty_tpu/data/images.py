"""Image preprocessing: decode/resize/center-crop on host, normalize on device.

Reference transform chain (``src/dataset.py:488-498``): Resize(256) (shorter
side, bilinear) -> CenterCrop(224) -> ToTensor -> Normalize(mean, std). The
resize/crop run in loader workers (PIL-SIMD-style); the cheap per-pixel
normalize is fused on-device into the model's first conv by XLA (we ship
uint8 to the device and normalize there — 4x less host->device bandwidth
than fp32, part of the end-to-end throughput budget).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np

FOOD101_MEAN = (0.46777044, 0.44531429, 0.40661017)
FOOD101_STD = (0.12221994, 0.12145835, 0.14380469)
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def resize_center_crop(img, resize: int = 256, crop: int = 224) -> np.ndarray:
    """PIL image -> (crop, crop, 3) uint8 with torchvision semantics."""
    from PIL import Image

    w, h = img.size
    if w <= h:
        nw, nh = resize, max(1, int(round(h * resize / w)))
    else:
        nh, nw = resize, max(1, int(round(w * resize / h)))
    img = img.resize((nw, nh), Image.BILINEAR)
    left = int(round((nw - crop) / 2.0))
    top = int(round((nh - crop) / 2.0))
    img = img.crop((left, top, left + crop, top + crop))
    return np.asarray(img, dtype=np.uint8)


def decode_rgb(path_or_file, *, fast: bool = False, target: int = 256):
    """Open an image file as RGB.

    ``fast=True`` enables JPEG DCT-domain scaled decoding (PIL ``draft``):
    the decoder emits pixels at the 1/2, 1/4 or 1/8 scale that still covers
    ``target``, skipping most of the IDCT work — measured ~2x host
    throughput on ~512px JPEGs. The result then goes through the same
    resize(256)/crop(224) path. Numerics differ slightly from full-res
    bilinear (DCT downscale is a box filter), so the default stays ``False``
    for bit-parity with the reference's torchvision chain; flip it on with
    ``--fast_decode`` when throughput matters more (training quality is
    unaffected on natural images).
    """
    from PIL import Image

    img = Image.open(path_or_file)
    if fast:
        img.draft("RGB", (target, target))
    return img.convert("RGB")


def normalize_on_device(x_uint8, mean: Sequence[float], std: Sequence[float]):
    """(B, H, W, 3) uint8 device array -> normalized float. Runs inside jit;
    XLA fuses it into the consumer."""
    import jax.numpy as jnp

    x = x_uint8.astype(jnp.float32) / 255.0
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    return (x - mean) / std


def gray_image(size: Tuple[int, int] = (256, 256)) -> np.ndarray:
    """The reference's drop-img substitute: constant 128 RGB
    (``src/dataset.py:396``)."""
    return np.full(size + (3,), 128, dtype=np.uint8)
