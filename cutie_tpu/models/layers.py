"""Primitive network modules (NHWC / channels-last).

Behavioral parity targets (reference files):
  - cutie/model/group_modules.py (GConv2d, GroupResBlock, MainToGroupDistributor,
    GroupFeatureFusionBlock, up/downsample_groups)
  - cutie/model/channel_attn.py (CAResBlock)
  - cutie/model/modules.py (sensory GRUs, MaskUpsampleBlock, DecoderFeatureProcessor)

"Group" tensors carry an extra num_objects axis: [B, N, H, W, C]; convs flatten
B*N (the object axis is a pure batch axis on TPU — no chunking needed, padded
slots are masked by a selector upstream).
"""
from __future__ import annotations

import math
from typing import Any, List, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp
from jax import lax

from cutie_tpu.ops.resize import area_downsample, upsample_2x

Dtype = Any


def conv2d(features: int, kernel: int, stride: int = 1, padding: int = 0,
           use_bias: bool = True, dtype: Dtype = jnp.float32, name: Optional[str] = None):
    """Explicit symmetric padding to match torch Conv2d semantics exactly."""
    return nn.Conv(features, kernel_size=(kernel, kernel), strides=(stride, stride),
                   padding=[(padding, padding), (padding, padding)],
                   use_bias=use_bias, dtype=dtype, param_dtype=jnp.float32, name=name)


def flatten_group(g: jnp.ndarray):
    b, n = g.shape[:2]
    return g.reshape(b * n, *g.shape[2:]), (b, n)


def unflatten_group(g: jnp.ndarray, bn):
    b, n = bn
    return g.reshape(b, n, *g.shape[1:])


def upsample_groups(g: jnp.ndarray, ratio: int = 2) -> jnp.ndarray:
    """Bilinear (align_corners=False) upsample on [B,N,H,W,C]
    (parity: group_modules.py:19-23)."""
    assert ratio == 2
    return upsample_2x(g)


def downsample_groups(g: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Area downsample on [B,N,H,W,C] (parity: group_modules.py:26-30)."""
    return area_downsample(g, factor)


class FrozenBatchNorm(nn.Module):
    """BatchNorm with permanently frozen running statistics.

    The reference freezes BN statistics in both encoders even during training
    (big_modules.py:57-61,185-189) — so this is always an affine transform
    with stored mean/var. scale/bias remain trainable params; mean/var live
    in the 'batch_stats' collection and are never updated.
    """
    features: int
    eps: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        mean = self.variable("batch_stats", "mean",
                             lambda: jnp.zeros((self.features,), jnp.float32)).value
        var = self.variable("batch_stats", "var",
                            lambda: jnp.ones((self.features,), jnp.float32)).value
        # fold into a single multiply-add (XLA fuses this into the preceding conv)
        inv = (scale / jnp.sqrt(var + self.eps)).astype(self.dtype)
        b = (bias - mean * scale / jnp.sqrt(var + self.eps)).astype(self.dtype)
        return x.astype(self.dtype) * inv + b


def max_pool_3x3_s2(x: jnp.ndarray) -> jnp.ndarray:
    """MaxPool2d(kernel=3, stride=2, padding=1) parity.

    Deliberately reduce_window: a max-of-9-shifted-slices variant was
    tried (round 4) to avoid the select-and-scatter backward, but its
    backward lowers to nine interior-dilated pads at the UNPOOLED
    resolution (~4 ms each at 480p trunk scale) — 6x worse than
    select-and-scatter. Measured, not guessed: train step 322 -> 554
    ms/step."""
    return lax.reduce_window(x, -jnp.inf, lax.max,
                             window_dimensions=(1, 3, 3, 1),
                             window_strides=(1, 2, 2, 1),
                             padding=((0, 0), (1, 1), (1, 1), (0, 0)))


class CAResBlock(nn.Module):
    """Residual block + ECA-style channel attention (channel_attn.py:7-39).
    Operates on flat [B', H, W, C]."""
    in_dim: int
    out_dim: int
    residual: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        r = x
        x = conv2d(self.out_dim, 3, padding=1, dtype=self.dtype, name="conv1")(nn.relu(x))
        x = conv2d(self.out_dim, 3, padding=1, dtype=self.dtype, name="conv2")(nn.relu(x))

        # ECA: global-avg-pool -> 1D conv over the channel axis -> sigmoid gate
        t = int((abs(math.log2(self.out_dim)) + 1) // 2)
        k = t if t % 2 else t + 1
        pooled = x.mean(axis=(1, 2))  # [B', C]
        # Conv1d(1, 1, k, padding=(k-1)//2, bias=False) over channels
        w = self.param("conv", nn.initializers.lecun_normal(), (k, 1, 1), jnp.float32)
        gate = lax.conv_general_dilated(
            pooled[:, :, None].astype(jnp.float32), w,
            window_strides=(1,), padding=[((k - 1) // 2, (k - 1) // 2)],
            dimension_numbers=("NHC", "HIO", "NHC"))
        gate = nn.sigmoid(gate[:, :, 0]).astype(x.dtype)  # [B', C]
        gate = gate[:, None, None, :]  # -> [B', 1, 1, C]

        if self.residual:
            if self.in_dim == self.out_dim:
                down = r
            else:
                down = conv2d(self.out_dim, 1, dtype=self.dtype, name="downsample")(r)
            return x * gate + down
        return x * gate


class GConv2d(nn.Module):
    """Conv over a group tensor [B, N, H, W, C] (group_modules.py:33-37)."""
    features: int
    kernel: int
    padding: int = 0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, g: jnp.ndarray) -> jnp.ndarray:
        flat, bn = flatten_group(g)
        out = conv2d(self.features, self.kernel, padding=self.padding,
                     dtype=self.dtype, name="conv")(flat)
        return unflatten_group(out, bn)


class GroupResBlock(nn.Module):
    """(group_modules.py:40-58)"""
    in_dim: int
    out_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, g: jnp.ndarray) -> jnp.ndarray:
        flat, bn = flatten_group(g)
        out = conv2d(self.out_dim, 3, padding=1, dtype=self.dtype, name="conv1")(nn.relu(flat))
        out = conv2d(self.out_dim, 3, padding=1, dtype=self.dtype, name="conv2")(nn.relu(out))
        if self.in_dim != self.out_dim:
            flat = conv2d(self.out_dim, 1, dtype=self.dtype, name="downsample")(flat)
        return unflatten_group(out + flat, bn)


def distribute(x: jnp.ndarray, g: jnp.ndarray, method: str = "cat") -> jnp.ndarray:
    """MainToGroupDistributor core (group_modules.py:74-99): broadcast the shared
    feature x [B,H,W,C] against every object of g [B,N,H,W,Cg]."""
    x = jnp.broadcast_to(x[:, None], (g.shape[0], g.shape[1], *x.shape[1:]))
    if method == "cat":
        return jnp.concatenate([x, g.astype(x.dtype)], axis=-1)
    if method == "add":
        return x + g
    if method == "mulcat":
        return jnp.concatenate([x * g, g], axis=-1)
    if method == "muladd":
        return x * g + g
    raise NotImplementedError(method)


class GroupFeatureFusionBlock(nn.Module):
    """(group_modules.py:102-126)"""
    x_in_dim: int
    g_in_dim: int
    out_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, g: jnp.ndarray) -> jnp.ndarray:
        x = conv2d(self.out_dim, 1, dtype=self.dtype, name="x_transform")(x)
        gt = GConv2d(self.out_dim, 1, dtype=self.dtype, name="g_transform")(g)
        g = distribute(x, gt, method="add")
        flat, bn = flatten_group(g)
        flat = CAResBlock(self.out_dim, self.out_dim, dtype=self.dtype, name="block1")(flat)
        flat = CAResBlock(self.out_dim, self.out_dim, dtype=self.dtype, name="block2")(flat)
        return unflatten_group(flat, bn)


def _recurrent_update(h: jnp.ndarray, values: jnp.ndarray) -> jnp.ndarray:
    """GRU-style update (modules.py:35-43). h: [B,N,H,W,D]; values: [B,N,H,W,3D].
    Always fp32 (modules.py:62-67,79-84)."""
    dim = values.shape[-1] // 3
    forget_gate = nn.sigmoid(values[..., :dim])
    update_gate = nn.sigmoid(values[..., dim:dim * 2])
    new_value = jnp.tanh(values[..., dim * 2:])
    return forget_gate * h * (1 - update_gate) + update_gate * new_value


class SensoryUpdater(nn.Module):
    """Decoder-side multi-scale sensory GRU (modules.py:46-68)."""
    g_dims: Sequence[int]
    mid_dim: int
    sensory_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, g: List[jnp.ndarray], h: jnp.ndarray) -> jnp.ndarray:
        fused = (GConv2d(self.mid_dim, 1, dtype=self.dtype, name="g16_conv")(g[0]) +
                 GConv2d(self.mid_dim, 1, dtype=self.dtype,
                         name="g8_conv")(downsample_groups(g[1], 2)) +
                 GConv2d(self.mid_dim, 1, dtype=self.dtype,
                         name="g4_conv")(downsample_groups(g[2], 4)))
        fused = fused.astype(jnp.float32)
        h = h.astype(jnp.float32)
        values = GConv2d(self.sensory_dim * 3, 3, padding=1, dtype=jnp.float32,
                         name="transform")(jnp.concatenate([fused, h], axis=-1))
        return _recurrent_update(h, values)


class SensoryDeepUpdater(nn.Module):
    """Mask-encoder-side sensory GRU (modules.py:71-85)."""
    f_dim: int
    sensory_dim: int

    @nn.compact
    def __call__(self, g: jnp.ndarray, h: jnp.ndarray) -> jnp.ndarray:
        g = g.astype(jnp.float32)
        h = h.astype(jnp.float32)
        values = GConv2d(self.sensory_dim * 3, 3, padding=1, dtype=jnp.float32,
                         name="transform")(jnp.concatenate([g, h], axis=-1))
        return _recurrent_update(h, values)


class MaskUpsampleBlock(nn.Module):
    """2x bilinear upsample + skip-add + GroupResBlock (modules.py:8-19)."""
    in_dim: int
    out_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, in_g: jnp.ndarray, skip_f: jnp.ndarray) -> jnp.ndarray:
        g = upsample_groups(in_g, ratio=2)
        g = distribute(skip_f, g, method="add")
        return GroupResBlock(self.in_dim, self.out_dim, dtype=self.dtype, name="out_conv")(g)
