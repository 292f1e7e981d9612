"""MIMO ResNet for the FashionMNIST 4-view toy setup.

Re-design of the reference truncated ResNet + MIMO wrapper
(``src/model.py:17-112``): conv1 -> layer1(64 x2) -> layer2(128 x2, stride 2)
-> AvgPool(4) -> fused multi-head FC. The ensemble dimension is folded into
the input channels exactly as the reference does ((B, E, C, H, W) ->
channels E*C), which keeps all members in one convolution — already the
MXU-friendly layout. Internally NHWC (TPU-native); the public API keeps the
reference's NCHW-style 5-D batches.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from multimodal_uncertainty_tpu.models.layers import (
    BasicBlock,
    BatchNorm,
    Conv,
    MultiHeadFC,
)
from multimodal_uncertainty_tpu.ops.losses import mimo_cross_entropy


class ResNetTrunk(nn.Module):
    """Two-stage truncated ResNet (reference ``src/model.py:17-56``)."""

    layers: tuple = (2, 2)

    @nn.compact
    def __call__(self, x, *, train: bool):
        # x: (B, H, W, C_in)
        x = Conv(64, (3, 3), (1, 1), name="conv1")(x)
        x = BatchNorm(use_running_average=not train, name="bn1")(x)
        x = nn.relu(x)
        inplanes = 64
        for i, (planes, stride) in enumerate(
            [(64, 1), (128, 2)][: len(self.layers)]
        ):
            blocks = self.layers[i]
            for j in range(blocks):
                s = stride if j == 0 else 1
                downsample = j == 0 and (s != 1 or inplanes != planes)
                x = BasicBlock(
                    planes, s, downsample, name=f"layer{i + 1}_{j}"
                )(x, train=train)
            inplanes = planes
        # torch AvgPool2d(4): kernel 4, stride 4, floor mode.
        x = nn.avg_pool(x, (4, 4), strides=(4, 4), padding="VALID")
        return x.reshape(x.shape[0], -1)


class MIMOResNet(nn.Module):
    """MIMO image classifier (reference ``src/model.py:72-112``)."""

    num_channels: int = 1
    emb_dim: int = 4
    out_dim: int = 1
    num_classes: int = 10
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        if x.ndim == 5:
            # (B, E, C, H, W) -> fold ensemble into channels -> NHWC
            b, e, c, h, w = x.shape
            x = x.reshape(b, e * c, h, w)
        # (B, C', H, W) -> (B, H, W, C')
        x = jnp.transpose(x, (0, 2, 3, 1)).astype(self.dtype)
        feats = ResNetTrunk(name="trunk")(x, train=train)
        return MultiHeadFC(self.num_classes, self.out_dim, name="output_layer")(
            feats
        )

    @staticmethod
    def compute_loss(y_hat, y, *, eval: bool = False):
        return mimo_cross_entropy(y_hat, y, eval=eval)
