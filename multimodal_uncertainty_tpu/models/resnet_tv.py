"""torchvision-style ResNet (NHWC, flax) — the MMBT image backbone.

Matches torchvision ``resnet152`` truncated at ``children()[:-2]``
(reference ``src/mmbt.py:19-21``): conv7x7/2 -> maxpool3x3/2 ->
layer1..4 (Bottleneck [3, 8, 36, 3]) -> (B, 7, 7, 2048) features, followed by
the reference's adaptive pool to N image embeddings (grid table
``src/mmbt.py:29-38``). Pretrained import via models/torch_import.py.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from multimodal_uncertainty_tpu.models.layers import BatchNorm, Conv


class TVBottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    expansion: int = 4
    dtype: any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        dt = self.dtype
        out = Conv(self.planes, (1, 1), dtype=dt, name="conv1")(x)
        out = BatchNorm(use_running_average=not train, dtype=dt, name="bn1")(out)
        out = nn.relu(out)
        out = Conv(self.planes, (3, 3), (self.stride, self.stride), dtype=dt,
                   name="conv2")(out)
        out = BatchNorm(use_running_average=not train, dtype=dt, name="bn2")(out)
        out = nn.relu(out)
        out = Conv(self.planes * self.expansion, (1, 1), dtype=dt, name="conv3")(out)
        out = BatchNorm(use_running_average=not train, dtype=dt, name="bn3")(out)
        if self.downsample:
            residual = Conv(
                self.planes * self.expansion,
                (1, 1),
                (self.stride, self.stride),
                dtype=dt,
                name="downsample_conv",
            )(x)
            residual = BatchNorm(
                use_running_average=not train, dtype=dt, name="downsample_bn"
            )(residual)
        return nn.relu(out + residual)


class ResNetTrunkTV(nn.Module):
    """Headless torchvision ResNet; layers=(3,8,36,3) == ResNet-152."""

    layers: Sequence[int] = (3, 8, 36, 3)
    dtype: any = None
    remat: bool = False  # rematerialize each bottleneck in the backward pass

    @nn.compact
    def __call__(self, x, *, train: bool):
        # x: (B, H, W, 3)
        x = Conv(64, (7, 7), (2, 2), padding=[(3, 3), (3, 3)], dtype=self.dtype,
                 name="conv1")(x)
        x = BatchNorm(use_running_average=not train, dtype=self.dtype,
                      name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        inplanes = 64
        block_cls = TVBottleneck
        if self.remat:
            # trade ~30% more FLOPs for O(depth) less activation memory —
            # the lever for batch > 64 on 224px ResNet-152 (BASELINE.md
            # batch sweep); argnums count the module as arg 0
            block_cls = nn.remat(TVBottleneck, static_argnums=(2,),
                                 prevent_cse=False)
        for stage, (planes, blocks) in enumerate(
            zip((64, 128, 256, 512), self.layers)
        ):
            stride = 1 if stage == 0 else 2
            for j in range(blocks):
                s = stride if j == 0 else 1
                downsample = j == 0 and (s != 1 or inplanes != planes * 4)
                x = block_cls(
                    planes, s, downsample, dtype=self.dtype,
                    name=f"layer{stage + 1}_{j}",
                )(x, train)
                inplanes = planes * 4
        return x  # (B, 7, 7, 2048) for 224 input


def adaptive_pool_nhwc(
    x: jax.Array, out_hw: Tuple[int, int], mode: str = "avg"
) -> jax.Array:
    """torch AdaptiveAvg/MaxPool2d semantics on NHWC input."""
    b, h, w, c = x.shape
    oh, ow = out_hw
    rows = []
    for i in range(oh):
        h0, h1 = (i * h) // oh, -(-((i + 1) * h) // oh)
        cols = []
        for j in range(ow):
            w0, w1 = (j * w) // ow, -(-((j + 1) * w) // ow)
            patch = x[:, h0:h1, w0:w1, :]
            red = (
                patch.mean(axis=(1, 2)) if mode == "avg" else patch.max(axis=(1, 2))
            )
            cols.append(red)
        rows.append(jnp.stack(cols, axis=1))
    return jnp.stack(rows, axis=1)  # (B, oh, ow, C)


POOL_GRID = {1: (1, 1), 2: (2, 1), 3: (3, 1), 4: (2, 2), 5: (5, 1),
             6: (3, 2), 7: (7, 1), 8: (4, 2), 9: (3, 3)}


class ImageEncoder(nn.Module):
    """ResNet trunk + adaptive pool to N image embeddings
    (reference ``src/mmbt.py:15-45``): (B, 224, 224, 3) -> (B, N, 2048)."""

    num_image_embeds: int = 3
    pool_mode: str = "avg"
    layers: Sequence[int] = (3, 8, 36, 3)
    dtype: any = None
    remat: bool = False

    @nn.compact
    def __call__(self, x, *, train: bool):
        feats = ResNetTrunkTV(self.layers, dtype=self.dtype, remat=self.remat,
                              name="model")(
            x.astype(self.dtype) if self.dtype is not None else x, train=train
        )
        n = self.num_image_embeds
        if n in (1, 2, 3, 5, 7):
            out_hw = (n, 1)
        else:
            out_hw = POOL_GRID[n]
        pooled = adaptive_pool_nhwc(feats, out_hw, self.pool_mode)
        return pooled.reshape(x.shape[0], n, feats.shape[-1])
