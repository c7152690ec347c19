"""DeepLabV3+ backbone variant for RITM interactive segmentation (flax, NHWC).

Behavioral parity targets: reference gui/ritm/model/modeling/deeplab_v3.py
(DeepLabV3Plus / _ASPP / _SkipProject / _DeepLabHead), resnetv1b.py
(dilated ResNet-v1s with deep stem), basic_blocks.py (SeparableConv2d /
SepConvHead), is_deeplab_model.py (DeeplabModel). Used when loading RITM
checkpoints trained with the DeepLab flavor; the shipped GUI checkpoint is
HRNet (cutie_tpu/ritm/model.py).
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from cutie_tpu.models.layers import FrozenBatchNorm
from cutie_tpu.ops.resize import bilinear_resize_align_corners
from cutie_tpu.ritm.dist_maps import encode_clicks

Dtype = Any


def conv2d_d(features, kernel, stride=1, padding=0, dilation=1, use_bias=True,
             dtype=jnp.float32, name=None, groups=1):
    return nn.Conv(features, kernel_size=(kernel, kernel),
                   strides=(stride, stride),
                   padding=[(padding, padding), (padding, padding)],
                   kernel_dilation=(dilation, dilation),
                   feature_group_count=groups,
                   use_bias=use_bias, dtype=dtype, param_dtype=jnp.float32,
                   name=name)


class BottleneckV1bDil(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    has_downsample: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        residual = x
        out = conv2d_d(self.planes, 1, use_bias=False, dtype=self.dtype,
                       name="conv1")(x)
        out = nn.relu(FrozenBatchNorm(self.planes, dtype=self.dtype,
                                      name="bn1")(out))
        out = conv2d_d(self.planes, 3, stride=self.stride,
                       padding=self.dilation, dilation=self.dilation,
                       use_bias=False, dtype=self.dtype, name="conv2")(out)
        out = nn.relu(FrozenBatchNorm(self.planes, dtype=self.dtype,
                                      name="bn2")(out))
        out = conv2d_d(self.planes * 4, 1, use_bias=False, dtype=self.dtype,
                       name="conv3")(out)
        out = FrozenBatchNorm(self.planes * 4, dtype=self.dtype, name="bn3")(out)
        if self.has_downsample:
            residual = conv2d_d(self.planes * 4, 1, stride=self.stride,
                                use_bias=False, dtype=self.dtype,
                                name="downsample_conv")(x)
            residual = FrozenBatchNorm(self.planes * 4, dtype=self.dtype,
                                       name="downsample_bn")(residual)
        return nn.relu(out + residual)


class ResNetV1sBackbone(nn.Module):
    """Dilated resnet50_v1s: deep stem + layer3/4 at stride 1 with dilation
    2/4 (resnetv1b.py:114-190). Returns (c1, c2, c3, c4); additional_features
    are zero-padded on channels and added after the stem conv1 block
    (modeling/resnet.py:29-41)."""
    layers: tuple = (3, 4, 6, 3)
    stem_width: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, additional_features: Optional[jnp.ndarray] = None):
        dt = self.dtype
        sw = self.stem_width
        # deep stem: conv1 is a Sequential of 3 convs (+bn/relu between)
        x = conv2d_d(sw, 3, stride=2, padding=1, use_bias=False, dtype=dt,
                     name="conv1_0")(x)
        x = nn.relu(FrozenBatchNorm(sw, dtype=dt, name="conv1_1")(x))
        x = conv2d_d(sw, 3, padding=1, use_bias=False, dtype=dt,
                     name="conv1_3")(x)
        x = nn.relu(FrozenBatchNorm(sw, dtype=dt, name="conv1_4")(x))
        x = conv2d_d(2 * sw, 3, padding=1, use_bias=False, dtype=dt,
                     name="conv1_6")(x)
        x = nn.relu(FrozenBatchNorm(2 * sw, dtype=dt, name="bn1")(x))
        if additional_features is not None:
            c = x.shape[-1] - additional_features.shape[-1]
            af = jnp.pad(additional_features, ((0, 0), (0, 0), (0, 0), (0, c)))
            x = x + af
        from cutie_tpu.models.layers import max_pool_3x3_s2
        x = max_pool_3x3_s2(x)

        feats = []
        inplanes = 2 * sw
        specs = [(64, self.layers[0], 1, 1), (128, self.layers[1], 2, 1),
                 (256, self.layers[2], 1, 2), (512, self.layers[3], 1, 4)]
        for li, (planes, blocks, stride, dilation) in enumerate(specs):
            for bi in range(blocks):
                if bi == 0:
                    has_ds = stride != 1 or inplanes != planes * 4
                    first_dil = 1 if dilation in (1, 2) else 2
                    x = BottleneckV1bDil(planes, stride=stride,
                                         dilation=first_dil,
                                         has_downsample=has_ds, dtype=dt,
                                         name=f"layer{li + 1}_0")(x)
                    inplanes = planes * 4
                else:
                    x = BottleneckV1bDil(planes, dilation=dilation, dtype=dt,
                                         name=f"layer{li + 1}_{bi}")(x)
            feats.append(x)
        return tuple(feats)


def _conv_bn_relu(x, feats, kernel, name, dt, padding=0, dilation=1,
                  use_bias=False):
    x = conv2d_d(feats, kernel, padding=padding, dilation=dilation,
                 use_bias=use_bias, dtype=dt, name=f"{name}_conv")(x)
    x = FrozenBatchNorm(feats, dtype=dt, name=f"{name}_bn")(x)
    return nn.relu(x)


class SeparableConv2d(nn.Module):
    """depthwise 3x3 + pointwise 1x1 + norm + act (basic_blocks.py:68-92)."""
    in_channels: int
    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = conv2d_d(self.in_channels, 3, padding=1, use_bias=False,
                     groups=self.in_channels, dtype=self.dtype, name="dw")(x)
        x = conv2d_d(self.out_channels, 1, use_bias=False, dtype=self.dtype,
                     name="pw")(x)
        x = FrozenBatchNorm(self.out_channels, dtype=self.dtype, name="bn")(x)
        return nn.relu(x)


class ASPP(nn.Module):
    """(deeplab_v3.py:_ASPP). Dropout inactive at inference."""
    in_channels: int
    out_channels: int = 256
    atrous_rates: tuple = (12, 24, 36)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        dt = self.dtype
        outs = [_conv_bn_relu(x, self.out_channels, 1, "b0_0", dt)]
        for i, rate in enumerate(self.atrous_rates):
            outs.append(_conv_bn_relu(x, self.out_channels, 3, f"b{i + 1}_0",
                                      dt, padding=rate, dilation=rate))
        pooled = x.mean(axis=(1, 2), keepdims=True)
        pooled = _conv_bn_relu(pooled, self.out_channels, 1, "b4_gap", dt)
        pooled = jnp.broadcast_to(pooled, (*x.shape[:3], self.out_channels))
        outs.append(pooled)
        x = jnp.concatenate(outs, axis=-1)
        return _conv_bn_relu(x, self.out_channels, 1, "project_0", dt)


class DeepLabV3Plus(nn.Module):
    """(deeplab_v3.py:12-91)"""
    ch: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, additional_features=None):
        dt = self.dtype
        c1, _c2, _c3, c4 = ResNetV1sBackbone(dtype=dt, name="backbone")(
            x, additional_features)
        c1 = _conv_bn_relu(c1, 32, 1, "skip_project_0", dt)
        x = ASPP(2048, self.ch, dtype=dt, name="aspp")(c4)
        x = bilinear_resize_align_corners(x, c1.shape[1], c1.shape[2])
        x = jnp.concatenate([x, c1], axis=-1)
        # head: two separable convs + 1x1 (deeplab_v3.py:_DeepLabHead)
        x = SeparableConv2d(self.ch + 32, self.ch, dtype=dt, name="head_0")(x)
        x = SeparableConv2d(self.ch, self.ch, dtype=dt, name="head_1")(x)
        return conv2d_d(self.ch, 1, dtype=dt, name="head_2")(x)


class DeepLabISModel(nn.Module):
    """(is_deeplab_model.py): DeepLabV3Plus features + SepConvHead logits,
    with the same DistMaps click encoding as the HRNet flavor."""
    deeplab_ch: int = 256
    with_prev_mask: bool = True
    use_disks: bool = True
    norm_radius: float = 5.0
    use_leaky_relu: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, image: jnp.ndarray, points: jnp.ndarray):
        h, w = image.shape[1:3]
        prev_mask = None
        if self.with_prev_mask:
            prev_mask = image[..., 3:]
            image = image[..., :3]
        mean = jnp.asarray([0.485, 0.456, 0.406])
        std = jnp.asarray([0.229, 0.224, 0.225])
        image = ((image - mean) / std).astype(self.dtype)

        coord = encode_clicks(points, h, w, norm_radius=self.norm_radius,
                              use_disks=self.use_disks)
        coord = jnp.moveaxis(coord, 1, -1)
        if prev_mask is not None:
            coord = jnp.concatenate([prev_mask, coord], axis=-1)
        act = (lambda v: nn.leaky_relu(v, 0.2)) if self.use_leaky_relu else nn.relu
        mt = conv2d_d(16, 1, dtype=self.dtype, name="maps_transform_0")(coord)
        mt = act(mt)
        mt = conv2d_d(64, 3, stride=2, padding=1, dtype=self.dtype,
                      name="maps_transform_2")(mt)
        scale = self.param("maps_transform_3_scale",
                           lambda k, s: jnp.full(s, 0.05), (1,))
        mt = mt * jnp.abs(scale)

        feats = DeepLabV3Plus(self.deeplab_ch, dtype=self.dtype,
                              name="feature_extractor")(image, mt)
        # SepConvHead(1, deeplab_ch, deeplab_ch//2, num_layers=2)
        x = SeparableConv2d(self.deeplab_ch, self.deeplab_ch // 2,
                            dtype=self.dtype, name="sep_head_0")(feats)
        x = SeparableConv2d(self.deeplab_ch // 2, self.deeplab_ch // 2,
                            dtype=self.dtype, name="sep_head_1")(x)
        out = conv2d_d(1, 1, dtype=self.dtype, name="sep_head_2")(x)
        return {"instances": bilinear_resize_align_corners(
            out.astype(jnp.float32), h, w)}
