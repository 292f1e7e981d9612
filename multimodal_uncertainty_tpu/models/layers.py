"""Shared NN layers (flax.linen): inits, norms, heads, ResNet blocks.

TPU-first conventions: NHWC conv layout, fp32 LayerNorm internals, fused
multi-head output projection. Torch-style initializers are provided so
training dynamics match the reference (torch Linear/Conv defaults are
Kaiming-uniform; the reference ResNet uses He-normal fan-out,
``src/model.py:33-39``).
"""
from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from multimodal_uncertainty_tpu.ops.norms import layer_norm

Dtype = Any


def torch_linear_kernel_init(key, shape, dtype=jnp.float32):
    """torch.nn.Linear default: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    fan_in = shape[0]
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_linear_bias_init(fan_in: int) -> Callable:
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


he_normal_fan_out = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


class Linear(nn.Module):
    """Dense layer with torch-default initialization.

    When traced inside :func:`multimodal_uncertainty_tpu.ops.quant.quantized`
    the matmul runs int8-quantized (serving feature; see ops/quant.py) —
    zero-cost otherwise (the mode is consulted at trace time only).
    """

    features: int
    use_bias: bool = True
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from multimodal_uncertainty_tpu.ops.dw import dot_general_dw, use_pallas_dw
        from multimodal_uncertainty_tpu.ops.quant import current_mode, quant_dot

        fan_in = x.shape[-1]
        kernel = self.param(
            "kernel", torch_linear_kernel_init, (fan_in, self.features), self.param_dtype
        )
        xc = x.astype(self.dtype or x.dtype)
        dw_mode = use_pallas_dw()
        if current_mode() is not None:
            y = quant_dot(xc, kernel)
        elif dw_mode and fan_in % 128 == 0 and self.features % 128 == 0:
            # opt-in (--fast_dw): same forward, dW via the Pallas K-chunked
            # kernel. OFF by default — measured slower in-step (ops/dw.py)
            y = dot_general_dw(
                xc, kernel.astype(self.dtype or x.dtype),
                dw_mode == "interpret",
            )
        else:
            y = jnp.dot(xc, kernel.astype(self.dtype or x.dtype))
        if self.use_bias:
            bias = self.param(
                "bias", torch_linear_bias_init(fan_in), (self.features,), self.param_dtype
            )
            y = y + bias.astype(y.dtype)
        return y


class LayerNormFP32(nn.Module):
    """LayerNorm computed in fp32 regardless of activation dtype.

    Parity with the reference's fp16-safe LayerNorm (``src/model.py:174-180``).
    """

    eps: float = 1e-5
    impl: str = "xla"

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        weight = self.param("weight", nn.initializers.ones, (d,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (d,), jnp.float32)
        return layer_norm(x, weight, bias, self.eps, impl=self.impl)


def quick_gelu(x: jax.Array) -> jax.Array:
    """x * sigmoid(1.702 x) (reference ``src/model.py:183-185``)."""
    return x * jax.nn.sigmoid(1.702 * x)


class MultiHeadFC(nn.Module):
    """One fused Linear producing ``num_classes * out_dim`` logits, reshaped to
    (B, E, C). Reference ``src/model.py:58-70`` (split+stack == reshape)."""

    num_classes: int
    out_dim: int

    @nn.compact
    def __call__(self, x):
        out = Linear(self.num_classes * self.out_dim, name="fc")(x)
        return out.reshape(out.shape[0], self.out_dim, self.num_classes)


class EnsembleHeads(nn.Module):
    """out_dim independent Linear heads applied to out_dim token vectors.

    Equivalent to the reference's ``nn.ModuleList`` of per-head Linears
    (``src/model.py:254``) but batched into a single einsum so all ensemble
    members run in one MXU call. Input: (B, E, D) -> (B, E, C).
    """

    num_classes: int
    out_dim: int

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        kernel = self.param(
            "kernel",
            lambda key, shape, dtype=jnp.float32: jnp.stack(
                [
                    torch_linear_kernel_init(k, shape[1:], dtype)
                    for k in jax.random.split(key, shape[0])
                ]
            ),
            (self.out_dim, d, self.num_classes),
            jnp.float32,
        )
        bias = self.param(
            "bias",
            lambda key, shape, dtype=jnp.float32: jnp.stack(
                [
                    torch_linear_bias_init(d)(k, shape[1:], dtype)
                    for k in jax.random.split(key, shape[0])
                ]
            ),
            (self.out_dim, self.num_classes),
            jnp.float32,
        )
        return jnp.einsum("bed,edc->bec", x, kernel.astype(x.dtype)) + bias.astype(
            x.dtype
        )


class Conv(nn.Module):
    """NHWC conv with He-normal fan-out init (reference ResNet init).

    Default padding follows torch Conv2d's symmetric k//2 per spatial dim
    (conv3x3 pad 1, conv1x1 pad 0, conv7x7 pad 3 — what every reference
    ResNet conv uses). NOTE this is NOT XLA "SAME" at stride > 1: SAME pads
    asymmetrically (low 0, high 1 for k=3,s=2 on even inputs), shifting the
    conv windows by one pixel vs torch — same output shape, different
    numerics. torch-style is required for pretrained torchvision weights to
    reproduce torch activations at the stride-2 stages.
    """

    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int] = (1, 1)
    padding: Any = None  # None -> torch-style symmetric k//2
    use_bias: bool = False
    dtype: Optional[Dtype] = None  # compute dtype (params stay fp32)

    @nn.compact
    def __call__(self, x):
        padding = self.padding
        if padding is None:
            padding = [(k // 2, k // 2) for k in self.kernel_size]
        return nn.Conv(
            features=self.features,
            kernel_size=tuple(self.kernel_size),
            strides=tuple(self.strides),
            padding=padding,
            use_bias=self.use_bias,
            kernel_init=he_normal_fan_out,
            dtype=self.dtype,
            name="conv",
        )(x)


class BatchNorm(nn.Module):
    """BatchNorm2d with torch defaults (momentum 0.1, eps 1e-5), NHWC."""

    use_running_average: bool
    dtype: Optional[Dtype] = None  # compute dtype (stats/params fp32)

    @nn.compact
    def __call__(self, x):
        return nn.BatchNorm(
            use_running_average=self.use_running_average,
            momentum=0.9,
            epsilon=1e-5,
            scale_init=nn.initializers.ones,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="bn",
        )(x)


class BasicBlock(nn.Module):
    """ResNet BasicBlock (reference ``src/layers.py:7-38``), NHWC."""

    planes: int
    stride: int = 1
    downsample: bool = False
    expansion: int = 1

    @nn.compact
    def __call__(self, x, *, train: bool):
        residual = x
        out = Conv(self.planes, (3, 3), (self.stride, self.stride))(x)
        out = BatchNorm(use_running_average=not train)(out)
        out = nn.relu(out)
        out = Conv(self.planes, (3, 3))(out)
        out = BatchNorm(use_running_average=not train)(out)
        if self.downsample:
            residual = Conv(
                self.planes * self.expansion, (1, 1), (self.stride, self.stride)
            )(x)
            residual = BatchNorm(use_running_average=not train)(residual)
        return nn.relu(out + residual)


class Bottleneck(nn.Module):
    """ResNet Bottleneck (reference ``src/layers.py:41-77``), NHWC.

    Also the building block of the MMBT ResNet-152 encoder.
    """

    planes: int
    stride: int = 1
    downsample: bool = False
    expansion: int = 4

    @nn.compact
    def __call__(self, x, *, train: bool):
        residual = x
        out = Conv(self.planes, (1, 1))(x)
        out = BatchNorm(use_running_average=not train)(out)
        out = nn.relu(out)
        out = Conv(self.planes, (3, 3), (self.stride, self.stride))(out)
        out = BatchNorm(use_running_average=not train)(out)
        out = nn.relu(out)
        out = Conv(self.planes * self.expansion, (1, 1))(out)
        out = BatchNorm(use_running_average=not train)(out)
        if self.downsample:
            residual = Conv(
                self.planes * self.expansion, (1, 1), (self.stride, self.stride)
            )(x)
            residual = BatchNorm(use_running_average=not train)(residual)
        return nn.relu(out + residual)


class OutputLayer(nn.Module):
    """Log-softmax classification head (live part of reference
    ``src/layers.py:80-107``; the orphaned dead code at :109-161 is not
    ported). Flattens input and applies FC + log_softmax."""

    num_classes: int

    @nn.compact
    def __call__(self, x):
        x = x.reshape(x.shape[0], -1)
        x = Linear(self.num_classes, name="fc")(x)
        return jax.nn.log_softmax(x, axis=-1)
