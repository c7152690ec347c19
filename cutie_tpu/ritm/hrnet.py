"""HRNet-W18/W48 + OCR backbone for interactive click segmentation (flax, NHWC).

Behavioral parity targets: reference gui/ritm/model/modeling/hrnet_ocr.py
(HighResolutionModule / HighResolutionNet), ocr.py (SpatialGather /
SpatialOCR / ObjectAttentionBlock2D), resnetv1b.py (BasicBlockV1b /
BottleneckV1b). BatchNorm runs in eval mode at inference -> FrozenBatchNorm.
HRNet's cross-resolution fusion uses align_corners=True bilinear upsampling.
"""
from __future__ import annotations

from typing import Any, List, Optional

import flax.linen as nn
import jax.numpy as jnp

from cutie_tpu.models.layers import FrozenBatchNorm, conv2d
from cutie_tpu.ops.resize import bilinear_resize_align_corners

Dtype = Any


class BasicBlockV1b(nn.Module):
    planes: int
    stride: int = 1
    has_downsample: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
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


class BottleneckV1b(nn.Module):
    planes: int
    stride: int = 1
    has_downsample: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        residual = x
        out = conv2d(self.planes, 1, use_bias=False, dtype=self.dtype,
                     name="conv1")(x)
        out = nn.relu(FrozenBatchNorm(self.planes, dtype=self.dtype, name="bn1")(out))
        out = conv2d(self.planes, 3, stride=self.stride, padding=1, use_bias=False,
                     dtype=self.dtype, name="conv2")(out)
        out = nn.relu(FrozenBatchNorm(self.planes, dtype=self.dtype, name="bn2")(out))
        out = conv2d(self.planes * 4, 1, use_bias=False, dtype=self.dtype,
                     name="conv3")(out)
        out = FrozenBatchNorm(self.planes * 4, dtype=self.dtype, name="bn3")(out)
        if self.has_downsample:
            residual = conv2d(self.planes * 4, 1, stride=self.stride,
                              use_bias=False, dtype=self.dtype,
                              name="downsample_conv")(x)
            residual = FrozenBatchNorm(self.planes * 4, dtype=self.dtype,
                                       name="downsample_bn")(residual)
        return nn.relu(out + residual)


def _conv_bn(x, feats, kernel, stride, name_prefix, dtype, relu=False,
             use_bias=False):
    x = conv2d(feats, kernel, stride=stride, padding=kernel // 2,
               use_bias=use_bias, dtype=dtype, name=f"{name_prefix}_conv")(x)
    x = FrozenBatchNorm(feats, dtype=dtype, name=f"{name_prefix}_bn")(x)
    return nn.relu(x) if relu else x


class HighResolutionModule(nn.Module):
    """(hrnet_ocr.py:13-152)"""
    num_branches: int
    num_blocks: int
    num_channels: List[int]  # per-branch widths (BasicBlock expansion 1)
    multi_scale_output: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: List[jnp.ndarray]) -> List[jnp.ndarray]:
        nb = self.num_branches
        for i in range(nb):
            for j in range(self.num_blocks):
                x[i] = BasicBlockV1b(self.num_channels[i], dtype=self.dtype,
                                     name=f"branches_{i}_{j}")(x[i])
        if nb == 1:
            return x

        x_fuse = []
        out_branches = nb if self.multi_scale_output else 1
        for i in range(out_branches):
            y = None
            for j in range(nb):
                if i == j:
                    t = x[j]
                elif j > i:
                    t = _conv_bn(x[j], self.num_channels[i], 1, 1,
                                 f"fuse_{i}_{j}", self.dtype)
                    t = bilinear_resize_align_corners(t, x[i].shape[-3],
                                                      x[i].shape[-2])
                else:
                    t = x[j]
                    for k in range(i - j):
                        last = k == i - j - 1
                        feats = (self.num_channels[i] if last
                                 else self.num_channels[j])
                        t = _conv_bn(t, feats, 3, 2, f"fuse_{i}_{j}_{k}",
                                     self.dtype, relu=not last)
                y = t if y is None else y + t
            x_fuse.append(nn.relu(y))
        return x_fuse


class SpatialGather(nn.Module):
    """Soft-weighted class-context pooling (ocr.py:7-27). NHWC:
    feats [B,H,W,C], probs [B,H,W,K] -> context [B,K,C]."""
    scale: float = 1.0

    @nn.compact
    def __call__(self, feats, probs):
        b, h, w, c = feats.shape
        k = probs.shape[-1]
        probs = nn.softmax(self.scale * probs.reshape(b, h * w, k), axis=1)
        return jnp.einsum("bnk,bnc->bkc", probs, feats.reshape(b, h * w, c))


class ObjectAttentionBlock2D(nn.Module):
    """(ocr.py:63-141). x [B,H,W,C]; proxy [B,K,C] -> [B,H,W,C]."""
    in_channels: int
    key_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, proxy):
        b, h, w, _ = x.shape
        kc = self.key_channels

        def double_1x1(inp, name):
            out = _conv_bn(inp, kc, 1, 1, f"{name}_0", self.dtype, relu=True)
            return _conv_bn(out, kc, 1, 1, f"{name}_1", self.dtype, relu=True)

        proxy_map = proxy[:, None]  # [B,1,K,C] as a 1xK "image" for 1x1 convs
        query = double_1x1(x, "f_pixel").reshape(b, h * w, kc)
        key = double_1x1(proxy_map, "f_object")[:, 0]     # [B,K,kc]
        value = _conv_bn(proxy_map, kc, 1, 1, "f_down_0", self.dtype,
                         relu=True)[:, 0]                  # [B,K,kc]

        sim = jnp.einsum("bnk,bmk->bnm", query, key) * (kc ** -0.5)
        sim = nn.softmax(sim, axis=-1)
        context = jnp.einsum("bnm,bmk->bnk", sim, value).reshape(b, h, w, kc)
        return _conv_bn(context, self.in_channels, 1, 1, "f_up_0", self.dtype,
                        relu=True)


class SpatialOCR(nn.Module):
    """(ocr.py:30-60); dropout inactive at inference."""
    in_channels: int
    key_channels: int
    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, proxy_feats):
        context = ObjectAttentionBlock2D(self.in_channels, self.key_channels,
                                         dtype=self.dtype,
                                         name="object_context_block")(feats,
                                                                      proxy_feats)
        x = jnp.concatenate([context, feats], axis=-1)
        return _conv_bn(x, self.out_channels, 1, 1, "conv_bn_dropout_0",
                        self.dtype, relu=True)


class HighResolutionNet(nn.Module):
    """(hrnet_ocr.py:155-398). Input NHWC image + optional stride-2 additional
    features added after conv1/bn1/relu. Returns (instances, instances_aux).

    Split into backbone ('bb': stem..multi-resolution aggregation) and head
    ('hd': aux/OCR/cls) submodules so f-BRS can cache backbone features and
    rerun only the head under its scale/bias optimization
    (gui/ritm/inference/predictors/brs.py:157-227). The RITM weight converter
    strips the 'bb'/'hd' path segments."""
    width: int = 18
    num_classes: int = 1
    ocr_width: int = 64
    small: bool = False
    dtype: Dtype = jnp.float32

    def setup(self):
        self.bb = _HRNetBackbone(self.width, self.small, dtype=self.dtype)
        self.hd = _HRNetHead(self.width, self.num_classes, self.ocr_width,
                             dtype=self.dtype)

    def __call__(self, x: jnp.ndarray,
                 additional_features: Optional[jnp.ndarray] = None):
        return self.hd(self.bb(x, additional_features))

    def backbone(self, x, additional_features=None):
        return self.bb(x, additional_features)

    def head(self, feats):
        return self.hd(feats)

    def head_ocr(self, feats):
        """Backbone feats -> OCR-refined features (pre-cls); the f-BRS
        insertion point 'C' (gui/ritm/inference/predictors/brs.py:244-252)."""
        return self.hd(feats, mode="ocr")

    def cls_from_ocr(self, ocr_feats):
        """cls_head conv only, on (possibly scale/bias-modified) OCR feats."""
        return self.hd(ocr_feats, mode="cls")


class _HRNetBackbone(nn.Module):
    width: int = 18
    small: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 additional_features: Optional[jnp.ndarray] = None):
        dt = self.dtype
        num_blocks = 2 if self.small else 4
        w = self.width

        # stem
        x = conv2d(64, 3, stride=2, padding=1, use_bias=False, dtype=dt,
                   name="conv1")(x)
        x = nn.relu(FrozenBatchNorm(64, dtype=dt, name="bn1")(x))
        if additional_features is not None:
            x = x + additional_features
        x = conv2d(64, 3, stride=2, padding=1, use_bias=False, dtype=dt,
                   name="conv2")(x)
        x = nn.relu(FrozenBatchNorm(64, dtype=dt, name="bn2")(x))

        # stage 1: bottleneck stack (64 -> 256)
        for j in range(num_blocks):
            x = BottleneckV1b(64, has_downsample=(j == 0), dtype=dt,
                              name=f"layer1_{j}")(x)

        # transitions create lower-resolution branches
        def transition(x_list, pre_channels, cur_channels, name):
            out = []
            for i, cc in enumerate(cur_channels):
                if i < len(pre_channels):
                    if cc != pre_channels[i]:
                        out.append(_conv_bn(x_list[i], cc, 3, 1, f"{name}_{i}_0",
                                            dt, relu=True))
                    else:
                        out.append(x_list[i])
                else:
                    t = x_list[-1]
                    for j in range(i + 1 - len(pre_channels)):
                        feats = cc if j == i - len(pre_channels) else \
                            pre_channels[-1]
                        t = _conv_bn(t, feats, 3, 2, f"{name}_{i}_{j}", dt,
                                     relu=True)
                    out.append(t)
            return out

        chans2 = [w, 2 * w]
        x_list = transition([x], [256], chans2, "transition1")
        for m in range(1):
            x_list = HighResolutionModule(2, num_blocks, chans2, dtype=dt,
                                          name=f"stage2_{m}")(x_list)

        chans3 = [w, 2 * w, 4 * w]
        x_list = transition(x_list, chans2, chans3, "transition2")
        for m in range(3 if self.small else 4):
            x_list = HighResolutionModule(3, num_blocks, chans3, dtype=dt,
                                          name=f"stage3_{m}")(x_list)

        chans4 = [w, 2 * w, 4 * w, 8 * w]
        x_list = transition(x_list, chans3, chans4, "transition3")
        for m in range(2 if self.small else 3):
            x_list = HighResolutionModule(4, num_blocks, chans4, dtype=dt,
                                          name=f"stage4_{m}")(x_list)

        # aggregate to the highest resolution
        h, wd = x_list[0].shape[-3], x_list[0].shape[-2]
        ups = [x_list[0]] + [bilinear_resize_align_corners(t, h, wd)
                             for t in x_list[1:]]
        return jnp.concatenate(ups, axis=-1)


class _HRNetHead(nn.Module):
    width: int = 18
    num_classes: int = 1
    ocr_width: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: jnp.ndarray, mode: str = "full"):
        """mode: 'full' -> (logits, aux); 'ocr' -> (ocr_feats, aux) — the
        f-BRS 'C' insertion features; 'cls' -> feats are ocr_feats, apply
        cls_head only. Parameter names are mode-independent, so every mode
        shares the one set of weights created at init (mode='full')."""
        dt = self.dtype
        last_inp = sum(k * self.width for k in (1, 2, 4, 8))

        if self.ocr_width > 0:
            if mode == "cls":
                out = conv2d(self.num_classes, 1, dtype=dt,
                             name="cls_head")(feats)
                return out, None
            ocr_mid = 2 * self.ocr_width
            # these two torch convs keep their default bias (hrnet_ocr.py:250-266)
            aux = _conv_bn(feats, last_inp, 1, 1, "aux_head_0", dt, relu=True,
                           use_bias=True)
            out_aux = conv2d(self.num_classes, 1, dtype=dt, name="aux_head_3")(aux)
            ocr_feats = _conv_bn(feats, ocr_mid, 3, 1, "conv3x3_ocr_0", dt,
                                 relu=True, use_bias=True)
            context = SpatialGather(name="ocr_gather_head")(ocr_feats, out_aux)
            ocr_feats = SpatialOCR(ocr_mid, self.ocr_width, ocr_mid, dtype=dt,
                                   name="ocr_distri_head")(ocr_feats, context)
            if mode == "ocr":
                return ocr_feats, out_aux
            out = conv2d(self.num_classes, 1, dtype=dt, name="cls_head")(ocr_feats)
            return out, out_aux
        out = _conv_bn(feats, last_inp, 3, 1, "cls_head_0", dt, relu=True,
                       use_bias=True)
        out = conv2d(self.num_classes, 1, dtype=dt, name="cls_head_3")(out)
        return out, None
