"""Higher-level network blocks.

Behavioral parity target: reference cutie/model/big_modules.py
(PixelEncoder, KeyProjection, MaskEncoder, PixelFeatureFuser, MaskDecoder).

Layout: shared features x are [B, H, W, C]; per-object group features g are
[B, N, H, W, C]. The reference's `chunk_size` object-chunking loops are
dropped — the object axis is a static padded batch axis on TPU.
"""
from __future__ import annotations

from typing import Any, List, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from cutie_tpu.config import Config
from cutie_tpu.models.layers import (GroupFeatureFusionBlock, MaskUpsampleBlock,
                                     SensoryDeepUpdater, SensoryUpdater, conv2d,
                                     flatten_group, unflatten_group)
from cutie_tpu.models.resnet import ResNetTrunk

Dtype = Any


class PixelEncoder(nn.Module):
    """Query encoder: ResNet trunk -> (f16, f8, f4) (big_modules.py:21-61)."""
    model_cfg: Config
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, image: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        f4, f8, f16 = ResNetTrunk(self.model_cfg.pixel_encoder.type, dtype=self.dtype,
                                  name="trunk")(image)
        return f16, f8, f4


class KeyProjection(nn.Module):
    """f16 -> key (CK) + shrinkage + selection (big_modules.py:64-87)."""
    model_cfg: Config
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, need_s: bool, need_e: bool):
        mid_dim = self.model_cfg.pixel_dim
        key_dim = self.model_cfg.key_dim
        x = conv2d(mid_dim, 1, dtype=self.dtype, name="pix_feat_proj")(x)
        shrinkage = None
        selection = None
        if need_s:
            d = conv2d(1, 3, padding=1, dtype=self.dtype, name="d_proj")(x)
            shrinkage = d * d + 1
        if need_e:
            selection = nn.sigmoid(conv2d(key_dim, 3, padding=1, dtype=self.dtype,
                                          name="e_proj")(x))
        key = conv2d(key_dim, 3, padding=1, dtype=self.dtype, name="key_proj")(x)
        return key, shrinkage, selection


class MaskEncoder(nn.Module):
    """Value encoder: ResNet-18 over [image, mask, others] + fusion with pix_feat +
    optional sensory deep update (big_modules.py:90-189)."""
    model_cfg: Config
    single_object: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, image: jnp.ndarray, pix_feat: jnp.ndarray, sensory: jnp.ndarray,
                 masks: jnp.ndarray, others: Optional[jnp.ndarray], *,
                 deep_update=True) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """
        image:   [B, H0, W0, 3] (normalized upstream)
        pix_feat:[B, h, w, pixel_dim]
        sensory: [B, N, h, w, sensory_dim]
        masks:   [B, N, H0, W0]; others: [B, N, H0, W0] or None
        deep_update: python bool OR traced bool array (selects via where)
        returns (value [B, N, h, w, value_dim], new_sensory)
        """
        cfg = self.model_cfg
        if self.single_object:
            planes = masks[..., None]
        else:
            planes = jnp.stack([masks, others], axis=-1)
        # channel-split stem: the trunk conv1 consumes the shared image and
        # the per-object planes separately (StemConv) — the reference's
        # [B, N, H0, W0, 3+extra] broadcast+concat (big_modules.py:128-131
        # via the distributor) is never materialized.
        bn = (planes.shape[0], planes.shape[1])
        f4, f8, f16 = ResNetTrunk(cfg.mask_encoder.type, dtype=self.dtype,
                                  name="trunk")(image, planes)
        del f4, f8
        g16 = unflatten_group(f16, bn)
        g16 = GroupFeatureFusionBlock(cfg.pixel_dim, cfg.mask_encoder.final_dim,
                                      cfg.value_dim, dtype=self.dtype,
                                      name="fuser")(pix_feat, g16)

        updated = SensoryDeepUpdater(cfg.value_dim, cfg.sensory_dim,
                                     name="sensory_update")(g16, sensory)
        if isinstance(deep_update, bool):
            new_sensory = updated if deep_update else sensory
        else:
            new_sensory = jnp.where(deep_update, updated, sensory.astype(updated.dtype))
        return g16, new_sensory


class PixelFeatureFuser(nn.Module):
    """Fuses pixel memory readout with sensory + last mask (big_modules.py:192-235)."""
    model_cfg: Config
    single_object: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, pix_feat: jnp.ndarray, pixel_memory: jnp.ndarray,
                 sensory_memory: jnp.ndarray, last_mask: jnp.ndarray,
                 last_others: Optional[jnp.ndarray]) -> jnp.ndarray:
        """
        pix_feat:      [B, h, w, pixel_dim]
        pixel_memory:  [B, N, h, w, value_dim]
        sensory_memory:[B, N, h, w, sensory_dim]
        last_mask:     [B, N, h, w] (already area-downsampled to stride 16)
        """
        cfg = self.model_cfg
        if self.single_object:
            mask_feat = last_mask[..., None]
        else:
            mask_feat = jnp.stack([last_mask, last_others], axis=-1)
        from cutie_tpu.models.layers import GConv2d
        sensory_readout = GConv2d(cfg.value_dim, 1, dtype=self.dtype,
                                  name="sensory_compress")(
                                      jnp.concatenate([sensory_memory.astype(self.dtype),
                                                       mask_feat.astype(self.dtype)], axis=-1))
        p16 = pixel_memory.astype(self.dtype) + sensory_readout
        return GroupFeatureFusionBlock(cfg.pixel_dim, cfg.value_dim, cfg.embed_dim,
                                       dtype=self.dtype, name="fuser")(pix_feat, p16)


class MaskDecoder(nn.Module):
    """FPN decoder 16->8->4 + fp32 logits head + sensory GRU (big_modules.py:238-306)."""
    model_cfg: Config
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, ms_image_feat: List[jnp.ndarray], memory_readout: jnp.ndarray,
                 sensory: jnp.ndarray, *, update_sensory=True):
        """
        ms_image_feat: [f16, f8, f4] shared features
        memory_readout: [B, N, h, w, embed_dim]
        sensory: [B, N, h, w, sensory_dim]
        returns (new_sensory, logits [B, N, H0/4, W0/4])
        """
        cfg = self.model_cfg
        up_dims = cfg.mask_decoder.up_dims
        sensory_dim = cfg.sensory_dim

        f8 = conv2d(up_dims[0], 1, dtype=self.dtype, name="decoder_feat_proc_0")(
            ms_image_feat[1])
        f4 = conv2d(up_dims[1], 1, dtype=self.dtype, name="decoder_feat_proc_1")(
            ms_image_feat[2])

        p16 = memory_readout
        p8 = MaskUpsampleBlock(up_dims[0], up_dims[1], dtype=self.dtype,
                               name="up_16_8")(p16, f8)
        p4 = MaskUpsampleBlock(up_dims[1], up_dims[2], dtype=self.dtype,
                               name="up_8_4")(p8, f4)

        # fp32 prediction head (big_modules.py:289-290)
        flat, bn = flatten_group(p4)
        logits = conv2d(1, 3, padding=1, dtype=jnp.float32,
                        name="pred")(nn.relu(flat.astype(jnp.float32)))
        logits_g = unflatten_group(logits, bn)  # [B, N, H4, W4, 1]

        p4_with_logits = jnp.concatenate([p4.astype(jnp.float32), logits_g], axis=-1)
        updated = SensoryUpdater([up_dims[0], up_dims[1], up_dims[2] + 1], sensory_dim,
                                 sensory_dim, dtype=self.dtype,
                                 name="sensory_update")([p16, p8, p4_with_logits], sensory)
        if isinstance(update_sensory, bool):
            new_sensory = updated if update_sensory else sensory
        else:
            new_sensory = jnp.where(update_sensory, updated, sensory.astype(updated.dtype))
        return new_sensory, logits_g[..., 0]
