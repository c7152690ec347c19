"""ResNet-18/50 trunks (conv1..layer3) with first-conv extra input channels.

Behavioral parity target: reference cutie/model/utils/resnet.py. Only the
trunk used by the encoders is built (conv1/bn1/maxpool/layer1-3 — layer4 is
never referenced by the reference encoders, big_modules.py:34-41,108-115).
BatchNorm statistics are permanently frozen (FrozenBatchNorm).

NHWC. The extra_dim channels of conv1 take the mask/others planes
(resnet.py:128-131 surgery in the reference; here they're just part of the
declared input width — weight import appends the orthogonally-initialized
columns the same way).
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from cutie_tpu.models.layers import FrozenBatchNorm, conv2d, max_pool_3x3_s2

Dtype = Any


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    has_downsample: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        residual = x
        out = conv2d(self.planes, 3, stride=self.stride, padding=1, use_bias=False,
                     dtype=self.dtype, name="conv1")(x)
        out = FrozenBatchNorm(self.planes, dtype=self.dtype, name="bn1")(out)
        out = nn.relu(out)
        out = conv2d(self.planes, 3, padding=1, use_bias=False, dtype=self.dtype,
                     name="conv2")(out)
        out = FrozenBatchNorm(self.planes, dtype=self.dtype, name="bn2")(out)
        if self.has_downsample:
            residual = conv2d(self.planes, 1, stride=self.stride, use_bias=False,
                              dtype=self.dtype, name="downsample_conv")(x)
            residual = FrozenBatchNorm(self.planes, dtype=self.dtype,
                                       name="downsample_bn")(residual)
        return nn.relu(out + residual)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    has_downsample: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        residual = x
        out = conv2d(self.planes, 1, use_bias=False, dtype=self.dtype, name="conv1")(x)
        out = FrozenBatchNorm(self.planes, dtype=self.dtype, name="bn1")(out)
        out = nn.relu(out)
        out = conv2d(self.planes, 3, stride=self.stride, padding=1, use_bias=False,
                     dtype=self.dtype, name="conv2")(out)
        out = FrozenBatchNorm(self.planes, dtype=self.dtype, name="bn2")(out)
        out = nn.relu(out)
        out = conv2d(self.planes * 4, 1, use_bias=False, dtype=self.dtype, name="conv3")(out)
        out = FrozenBatchNorm(self.planes * 4, dtype=self.dtype, name="bn3")(out)
        if self.has_downsample:
            residual = conv2d(self.planes * 4, 1, stride=self.stride, use_bias=False,
                              dtype=self.dtype, name="downsample_conv")(x)
            residual = FrozenBatchNorm(self.planes * 4, dtype=self.dtype,
                                       name="downsample_bn")(residual)
        return nn.relu(out + residual)


class ResNetTrunk(nn.Module):
    """conv1..layer3. variant: 'resnet18' | 'resnet50'. Input [B,H,W,3+extra_dim].
    Returns (f4, f8, f16) at strides 4/8/16."""
    variant: str = "resnet50"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        if self.variant == "resnet18":
            block, layers, expansion = BasicBlock, (2, 2, 2), 1
        elif self.variant == "resnet50":
            block, layers, expansion = Bottleneck, (3, 4, 6), 4
        else:
            raise NotImplementedError(self.variant)

        x = conv2d(64, 7, stride=2, padding=3, use_bias=False, dtype=self.dtype,
                   name="conv1")(x)
        x = FrozenBatchNorm(64, dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = max_pool_3x3_s2(x)

        inplanes = 64
        feats = []
        for li, (planes, blocks) in enumerate(zip((64, 128, 256), layers)):
            stride = 1 if li == 0 else 2
            for bi in range(blocks):
                s = stride if bi == 0 else 1
                has_ds = bi == 0 and (s != 1 or inplanes != planes * expansion)
                x = block(planes, stride=s, has_downsample=has_ds, dtype=self.dtype,
                          name=f"layer{li + 1}_{bi}")(x)
                inplanes = planes * expansion
            feats.append(x)
        f4, f8, f16 = feats
        return f4, f8, f16


def trunk_dims(variant: str) -> Sequence[int]:
    """Output channel dims (f16, f8, f4)."""
    if variant == "resnet18":
        return (256, 128, 64)
    return (1024, 512, 256)
