"""Interactive segmentation model (RITM HRNet flavor).

Behavioral parity targets: reference gui/ritm/model/is_model.py:9-168 +
is_hrnet_model.py (HRNetModel): DistMaps click encoding (+ optional previous
mask channel), maps_transform fusion into the HRNet stem, align_corners=True
upsampling of the logits back to input resolution. Exposes the
backbone-features / head split that f-BRS needs
(gui/ritm/inference/predictors/brs.py:229-246).

The shipped GUI checkpoint (coco_lvis_h18_itermask.pth) configuration:
width=18, ocr_width=64, with_prev_mask=True, use_disks=True, norm_radius=5,
use_rgb_conv=False (maps_transform + ScaleLayer path).
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from cutie_tpu.models.layers import FrozenBatchNorm, conv2d
from cutie_tpu.ops.resize import bilinear_resize_align_corners
from cutie_tpu.ritm.dist_maps import encode_clicks
from cutie_tpu.ritm.hrnet import HighResolutionNet

Dtype = Any


class HRNetISModel(nn.Module):
    width: int = 18
    ocr_width: int = 64
    small: bool = False
    with_aux_output: bool = False
    with_prev_mask: bool = True
    binary_prev_mask: bool = False
    use_disks: bool = True
    norm_radius: float = 5.0
    use_rgb_conv: bool = False
    use_leaky_relu: bool = False
    dtype: Dtype = jnp.float32

    def setup(self):
        self.feature_extractor = HighResolutionNet(
            self.width, 1, self.ocr_width, self.small, dtype=self.dtype)
        if self.use_rgb_conv:
            cch = 2 + (1 if self.with_prev_mask else 0)
            self.rgb_conv_0 = conv2d(6 + cch, 1, dtype=self.dtype)
            self.rgb_conv_1 = FrozenBatchNorm(6 + cch, dtype=self.dtype)
            self.rgb_conv_3 = conv2d(3, 1, dtype=self.dtype)
        else:
            self.maps_transform_0 = conv2d(16, 1, dtype=self.dtype)
            self.maps_transform_2 = conv2d(64, 3, stride=2, padding=1,
                                           dtype=self.dtype)
            self.maps_transform_3_scale = self.param(
                "maps_transform_3_scale", lambda k, s: jnp.full(s, 0.05), (1,))

    # ------------------------------------------------------------- internals

    def _act(self, x):
        return nn.leaky_relu(x, 0.2) if self.use_leaky_relu else nn.relu(x)

    def _prepare_input(self, image):
        """(is_model.py:102-111)"""
        prev_mask = None
        if self.with_prev_mask:
            prev_mask = image[..., 3:]
            image = image[..., :3]
            if self.binary_prev_mask:
                prev_mask = (prev_mask > 0.5).astype(jnp.float32)
        mean = jnp.asarray([0.485, 0.456, 0.406])
        std = jnp.asarray([0.229, 0.224, 0.225])
        return ((image - mean) / std).astype(self.dtype), prev_mask

    def _coord_features(self, prev_mask, points, h, w):
        coord = encode_clicks(points, h, w, norm_radius=self.norm_radius,
                              use_disks=self.use_disks)  # [B,2,H,W]
        coord = jnp.moveaxis(coord, 1, -1)
        if prev_mask is not None:
            coord = jnp.concatenate([prev_mask, coord], axis=-1)
        return coord

    def _stem_inputs(self, image, points):
        """-> (backbone input x, additional_features) per is_model.py:82-88."""
        h, w = image.shape[1:3]
        image, prev_mask = self._prepare_input(image)
        coord = self._coord_features(prev_mask, points, h, w)
        if self.use_rgb_conv:
            x = jnp.concatenate([image, coord], axis=-1)
            x = self._act(self.rgb_conv_1(self.rgb_conv_0(x)))
            x = self.rgb_conv_3(x)
            return x, None
        mt = self._act(self.maps_transform_0(coord))
        mt = self.maps_transform_2(mt)
        mt = mt * jnp.abs(self.maps_transform_3_scale)
        return image, mt

    # ----------------------------------------------------------------- public

    def __call__(self, image: jnp.ndarray, points: jnp.ndarray):
        """image: [B, H, W, 3(+1 prev-mask)]; points: [B, 2K, 3].
        Returns {'instances': [B, H, W, 1] logits (input resolution)}."""
        h, w = image.shape[1:3]
        x, addf = self._stem_inputs(image, points)
        out, out_aux = self.feature_extractor(x, addf)
        result = {"instances": bilinear_resize_align_corners(
            out.astype(jnp.float32), h, w)}
        if self.with_aux_output and out_aux is not None:
            result["instances_aux"] = bilinear_resize_align_corners(
                out_aux.astype(jnp.float32), h, w)
        return result

    def low_res_instances(self, image: jnp.ndarray, points: jnp.ndarray):
        """Pre-upsample logits [B, H/4, W/4, 1]. The predictor fetches these
        and runs the (bit-identical) align-corners upsample on HOST — the
        full-resolution fetch costs ~16x more D2H bandwidth, which dominates
        click latency over a TPU tunnel."""
        x, addf = self._stem_inputs(image, points)
        out, _out_aux = self.feature_extractor(x, addf)
        return out.astype(jnp.float32)

    def get_head_input(self, image: jnp.ndarray, points: jnp.ndarray,
                       insertion_mode: str = "A"):
        """f-BRS feature cache (brs.py:229-252): 'A' = multi-resolution
        aggregation output (pre-OCR); 'C' = OCR-refined features (pre-cls)."""
        x, addf = self._stem_inputs(image, points)
        feats = self.feature_extractor.backbone(x, addf)
        if insertion_mode == "C":
            feats, _aux = self.feature_extractor.head_ocr(feats)
        return feats

    def head_from_feats_low(self, feats: jnp.ndarray, insertion_mode: str = "A"):
        """Pre-upsample head logits [B, H/4, W/4, 1] from (possibly
        scale/bias-modified) features (brs.py:182-210): 'A' reruns the OCR
        heads, 'C' only cls_head. The f-BRS predictor fetches these and
        upsamples on host (bit-identical; 16x less D2H)."""
        if insertion_mode == "C":
            out, _aux = self.feature_extractor.cls_from_ocr(feats)
        else:
            out, _aux = self.feature_extractor.head(feats)
        return out.astype(jnp.float32)

    def head_from_feats(self, feats: jnp.ndarray, out_h: int, out_w: int,
                        insertion_mode: str = "A"):
        """Head + upsample from (possibly scale/bias-modified) features
        (brs.py:182-210)."""
        return bilinear_resize_align_corners(
            self.head_from_feats_low(feats, insertion_mode), out_h, out_w)

    def low_res_instances_with_input_bias(self, image: jnp.ndarray,
                                          points: jnp.ndarray,
                                          bias: jnp.ndarray,
                                          target: str = "rgb"):
        """Full forward with an additive bias on the (normalized) input image
        or the click dist-map channels — the Input-BRS path
        (gui/ritm/inference/predictors/brs.py:257-304, optimize_target
        rgb|dmaps). bias: [B, H, W, C_opt]."""
        if self.use_rgb_conv:
            raise NotImplementedError("Input-BRS targets the maps_transform "
                                      "configuration (the shipped checkpoint)")
        h, w = image.shape[1:3]
        img, prev_mask = self._prepare_input(image)
        coord = self._coord_features(prev_mask, points, h, w)
        if target == "rgb":
            img = img + bias
        elif target == "dmaps":
            if self.with_prev_mask:
                # click channels only — prev-mask channel stays untouched
                # (reference brs.py:284-285 dmaps[:, 1:] += bias)
                coord = jnp.concatenate([coord[..., :1],
                                         coord[..., 1:] + bias], axis=-1)
            else:
                coord = coord + bias
        else:
            raise NotImplementedError(target)
        mt = self._act(self.maps_transform_0(coord))
        mt = self.maps_transform_2(mt)
        mt = mt * jnp.abs(self.maps_transform_3_scale)
        out, _aux = self.feature_extractor(img, mt)
        return out.astype(jnp.float32)
