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

from jax import lax

from cutie_tpu.models.layers import FrozenBatchNorm, conv2d, max_pool_3x3_s2

Dtype = Any


class FirstConv(nn.Module):
    """The stem 7x7/stride-2/pad-3 conv, computed as fold-by-2 + 4x4 patch
    im2col + ONE matmul instead of a strided conv.

    Why: XLA lowers the strided 5-channel 480p conv (and especially its
    transposed-conv input gradient, needed because the mask/others planes
    carry gradients from earlier frames) as spatial-major data movement —
    ~60 ms/step of the round-4 train trace, on an op worth <1 ms of FLOPs.
    Folding H,W by 2 turns stride 2 into stride 1; concatenating the 16
    shifted 4x4-window slices turns the conv into a dense [B,h,w,64*C] x
    [64*C,64] matmul whose forward AND backward are MXU matmuls.

    Exact reformulation of the reference stem (resnet.py:29-33 conv1):
    out[i,j] = sum_{di,dj} x[2i+di-3, 2j+dj-3] K[di,dj]; with x folded as
    xf[p,q,(a,b,c)] = x[2p+a, 2q+b], the window becomes dp=p-i in [-2,1]
    (4 taps), and K regrouped as K4[dp,dq,a,b] = K7[2dp+a-1, 2dq+b-1]
    (zero where the index falls outside [0,6]).

    Param tree matches nn.Conv exactly ('kernel' [7,7,C,64], no bias) so
    weight import and the golden fixtures are unchanged.
    """
    features: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c_in = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (7, 7, c_in, self.features), jnp.float32)
        b, h, w, _ = x.shape
        if h % 2 or w % 2:  # odd sizes: plain conv (all encode paths pad
            # to a multiple of 16 upstream — ops/tensor_utils.py)
            return lax.conv_general_dilated(
                x.astype(self.dtype), kernel.astype(self.dtype),
                window_strides=(2, 2), padding=((3, 3), (3, 3)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        # K7 [7,7,C,O] -> zero-pad one leading row/col (di = 2dp+a-1 hits -1
        # at dp=a=0) -> [8,8,C,O] -> [dp,a,dq,b,C,O] -> [dp,dq,a,b,C,O]
        k4 = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))
        k4 = k4.reshape(4, 2, 4, 2, c_in, self.features)
        k4 = k4.transpose(0, 2, 1, 3, 4, 5).reshape(64 * c_in, self.features)

        xf = x.reshape(b, h // 2, 2, w // 2, 2, c_in)
        xf = xf.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2,
                                                    4 * c_in)
        # 16 shifted slices of the folded map, offsets dp,dq in [-2,1]
        xfp = jnp.pad(xf, ((0, 0), (2, 1), (2, 1), (0, 0)))
        patches = jnp.concatenate(
            [lax.slice(xfp, (0, dp, dq, 0),
                       (b, dp + h // 2, dq + w // 2, 4 * c_in))
             for dp in range(4) for dq in range(4)], axis=-1)
        out = jnp.einsum("bhwk,ko->bhwo", patches.astype(self.dtype),
                         k4.astype(self.dtype),
                         preferred_element_type=jnp.float32)
        return out.astype(self.dtype)


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

        x = FirstConv(64, dtype=self.dtype, name="conv1")(x)
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
