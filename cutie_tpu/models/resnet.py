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
import jax
import jax.numpy as jnp

from jax import lax

from cutie_tpu.models.layers import FrozenBatchNorm, conv2d, max_pool_3x3_s2

Dtype = Any


def _stem_conv_plain(x: jnp.ndarray, kernel: jnp.ndarray,
                     dtype: Dtype) -> jnp.ndarray:
    """The reference stem: 7x7 / stride 2 / pad 3 (resnet.py:29-33)."""
    return lax.conv_general_dilated(
        x.astype(dtype), kernel.astype(dtype),
        window_strides=(2, 2), padding=((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _stem_conv_planes(planes: jnp.ndarray, kernel: jnp.ndarray,
                      dtype: Dtype) -> jnp.ndarray:
    """The gradient-carrying (mask/others) slice of the stem conv, as
    fold-by-4 + 3x3 block patches + ONE matmul + phase unfold.

    Why not just lax.conv: XLA lowers the strided few-channel 480p conv —
    and especially its transposed-conv input gradient, which exists
    because the mask planes carry gradients from earlier frames (BPTT
    through predicted masks) — as spatial-major data movement: ~60
    ms/step of the round-4 train trace on an op worth <1 ms of FLOPs.
    Every [*, C<=8] tensor at 480p also pays a 16-64x lane-padding tax in
    native (8,128) tiling. Folding H,W by 4 packs 16 pixels into the lane
    dim (C=16P), shrinks the spatial extent to 120^2, and turns the
    whole op (fwd, input grad, kernel grad) into dense MXU matmuls.

    Derivation (exact): out[2t+r, 2s+c2] for r,c2 in {0,1} reads input
    u = 2i+di-3 which spans folded blocks t-1..t+1; with xf4[t,q,(a,b)] =
    x[4t+a, 4q+b], di = 4dp+a-2r-1 for block offset dp in {0,1,2}, so
    K'[dp,dq,a,b,(r,s,o)] = K7[4dp+a-2r-1, 4dq+b-2s-1] (0 outside [0,6]).

    planes [B, H, W, P] (P small), kernel [7,7,P,O] -> [B, H/2, W/2, O].
    """
    b, h, w, p = planes.shape
    o = kernel.shape[-1]
    ht, wt = h // 4, w // 4
    xf = planes.reshape(b, ht, 4, wt, 4, p)
    xf = xf.transpose(0, 1, 3, 2, 4, 5).reshape(b, ht, wt, 16 * p)
    xfp = jnp.pad(xf, ((0, 0), (1, 1), (1, 1), (0, 0)))
    patches = jnp.concatenate(
        [lax.slice(xfp, (0, dp, dq, 0), (b, dp + ht, dq + wt, 16 * p))
         for dp in range(3) for dq in range(3)], axis=-1)

    # kernel regroup: K7 padded so index 4d+a-2r-1 in [-3,10] maps into
    # [0,13]; for fixed r the 12 needed taps are one contiguous slice.
    k = jnp.pad(kernel, ((3, 4), (3, 4), (0, 0), (0, 0)))  # [14,14,P,O]
    rows = jnp.stack([k[2:14], k[0:12]], axis=0)           # [r,12,14,P,O]
    cols = jnp.stack([rows[:, :, 2:14], rows[:, :, 0:12]], axis=0)
    # cols: [s, r, 12, 12, P, O] with 12 = (dp,a) resp. (dq,b) flattened
    kp = cols.reshape(2, 2, 3, 4, 3, 4, p, o)              # [s,r,dp,a,dq,b,P,O]
    kp = kp.transpose(2, 4, 3, 5, 6, 1, 0, 7)              # [dp,dq,a,b,P,r,s,O]
    kp = kp.reshape(9 * 16 * p, 4 * o)

    blocks = jnp.einsum("bhwk,ko->bhwo", patches.astype(dtype),
                        kp.astype(dtype),
                        preferred_element_type=jnp.float32).astype(dtype)
    blocks = blocks.reshape(b, ht, wt, 2, 2, o)             # [b,t,q,r,s,o]
    blocks = blocks.transpose(0, 1, 3, 2, 4, 5)             # [b,t,r,q,s,o]
    return blocks.reshape(b, h // 2, w // 2, o)


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


class StemConv(nn.Module):
    """The stem conv with an optional channel-split path.

    Plain mode (planes=None): the reference 7x7/s2 conv on x.

    Split mode: x is the SHARED image [B,H,W,3] and planes are the
    per-object gradient-carrying maps [B,N,H,W,P] (mask / mask+others).
    By linearity conv1(concat) = conv_img(x) + conv_planes(planes); the
    image part is one plain conv on the small shared batch (its input is
    a data leaf, so no input gradient exists), the planes part runs
    through the matmul form (_stem_conv_planes), and the [B,N,H,W,3+P]
    broadcast+concat materialization disappears entirely.

    Param tree matches nn.Conv ('kernel' [7,7,3+P,O], no bias) so weight
    import and golden fixtures are unchanged.

    Off-TPU the split/matmul forms are bypassed (plain concat+conv):
    they reassociate the channel/tap sums, and that fp drift — harmless
    at stage level — amplifies through 20+ frames of memory feedback
    enough to flip ~0.5% of random-weight golden-stream pixels. Same
    convention as ops/memory._pick_read_backend: bit-stable forms where
    the golden fixtures run (CPU), fast forms on the hardware."""
    in_channels: int
    features: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 planes: jnp.ndarray = None) -> jnp.ndarray:
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (7, 7, self.in_channels, self.features),
                            jnp.float32)
        import os
        fast = (jax.default_backend() == "tpu"
                and os.environ.get("CUTIE_TPU_FAST_STEM", "1") != "0")

        def stem(inp, kern):
            # the matmul form also beats lax.conv for the image stems:
            # their KERNEL gradient otherwise lowers at ~3.5 TF/s
            # (~9 ms/step across the pixel + per-frame image branches)
            if not fast or inp.shape[1] % 4 or inp.shape[2] % 4:
                return _stem_conv_plain(inp, kern, self.dtype)
            return _stem_conv_planes(inp.astype(self.dtype), kern,
                                     self.dtype)

        if planes is None:
            return stem(x, kernel)
        b, n, h, w, p = planes.shape
        c_img = x.shape[-1]
        if not fast or h % 4 or w % 4:  # encode paths pad to /16 upstream
            xb = jnp.broadcast_to(x[:, None], (b, n, h, w, c_img))
            full = jnp.concatenate([xb, planes.astype(x.dtype)], axis=-1)
            return stem(full.reshape(b * n, h, w, -1), kernel)
        img_part = stem(x, kernel[:, :, :c_img])
        pl_part = stem(planes.reshape(b * n, h, w, p),
                       kernel[:, :, c_img:])
        out = img_part[:, None] + pl_part.reshape(b, n, *pl_part.shape[1:])
        return out.reshape(b * n, *out.shape[2:])


class ResNetTrunk(nn.Module):
    """conv1..layer3. variant: 'resnet18' | 'resnet50'. Input [B,H,W,3+extra_dim]
    (or image [B,H,W,3] + planes [B,N,H,W,extra] for the split stem — the
    output batch is then B*N). Returns (f4, f8, f16) at strides 4/8/16."""
    variant: str = "resnet50"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, planes: jnp.ndarray = None):
        if self.variant == "resnet18":
            block, layers, expansion = BasicBlock, (2, 2, 2), 1
        elif self.variant == "resnet50":
            block, layers, expansion = Bottleneck, (3, 4, 6), 4
        else:
            raise NotImplementedError(self.variant)

        in_ch = x.shape[-1] + (planes.shape[-1] if planes is not None else 0)
        x = StemConv(in_ch, 64, dtype=self.dtype, name="conv1")(x, planes)
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
