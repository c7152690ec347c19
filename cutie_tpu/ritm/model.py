"""Interactive segmentation model (RITM HRNet flavor).

Behavioral parity targets: reference gui/ritm/model/is_model.py:9-168 +
is_hrnet_model.py (HRNetModel): DistMaps click encoding (+ optional previous
mask channel), maps_transform fusion into the HRNet stem, align_corners=True
upsampling of the logits back to input resolution.

The shipped GUI checkpoint (coco_lvis_h18_itermask.pth) configuration:
width=18, ocr_width=64, with_prev_mask=True, use_disks=True, norm_radius=5,
use_rgb_conv=False (maps_transform + ScaleLayer path).
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from cutie_tpu.models.layers import conv2d
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

    @nn.compact
    def __call__(self, image: jnp.ndarray, points: jnp.ndarray):
        """
        image: [B, H, W, 3(+1 prev-mask)] float (raw 0..1, normalized here)
        points: [B, 2K, 3] click rows (row, col, index); -1 padded
        returns dict {'instances': [B, H, W, 1] logits, 'instances_aux': ...}
        """
        b, h, w = image.shape[:3]
        prev_mask = None
        if self.with_prev_mask:
            prev_mask = image[..., 3:]
            image = image[..., :3]
            if self.binary_prev_mask:
                prev_mask = (prev_mask > 0.5).astype(jnp.float32)
        mean = jnp.asarray([0.485, 0.456, 0.406])
        std = jnp.asarray([0.229, 0.224, 0.225])
        image = ((image - mean) / std).astype(self.dtype)

        coord = encode_clicks(points, h, w, norm_radius=self.norm_radius,
                              use_disks=self.use_disks)  # [B,2,H,W]
        coord = jnp.moveaxis(coord, 1, -1)  # NHWC
        if prev_mask is not None:
            coord = jnp.concatenate([prev_mask, coord], axis=-1)

        act = (lambda x: nn.leaky_relu(x, 0.2)) if self.use_leaky_relu else nn.relu
        if self.use_rgb_conv:
            cch = coord.shape[-1]
            x = jnp.concatenate([image, coord], axis=-1)
            x = conv2d(6 + cch, 1, dtype=self.dtype, name="rgb_conv_0")(x)
            from cutie_tpu.models.layers import FrozenBatchNorm
            x = FrozenBatchNorm(6 + cch, dtype=self.dtype, name="rgb_conv_1")(x)
            x = act(x)
            x = conv2d(3, 1, dtype=self.dtype, name="rgb_conv_3")(x)
            out, out_aux = HighResolutionNet(
                self.width, 1, self.ocr_width, self.small, dtype=self.dtype,
                name="feature_extractor")(x, None)
        else:
            # maps_transform: 1x1 conv -> relu -> 3x3 s2 conv -> ScaleLayer
            # (is_model.py:57-64)
            mt = conv2d(16, 1, dtype=self.dtype, name="maps_transform_0")(coord)
            mt = act(mt)
            mt = conv2d(64, 3, stride=2, padding=1, dtype=self.dtype,
                        name="maps_transform_2")(mt)
            scale = self.param("maps_transform_3_scale",
                               lambda k, s: jnp.full(s, 0.05), (1,))
            mt = mt * jnp.abs(scale)
            out, out_aux = HighResolutionNet(
                self.width, 1, self.ocr_width, self.small, dtype=self.dtype,
                name="feature_extractor")(image, mt)

        instances = bilinear_resize_align_corners(out.astype(jnp.float32), h, w)
        result = {"instances": instances}
        if self.with_aux_output and out_aux is not None:
            result["instances_aux"] = bilinear_resize_align_corners(
                out_aux.astype(jnp.float32), h, w)
        return result
