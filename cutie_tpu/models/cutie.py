"""CUTIE model facade — stateless stage methods over the network blocks.

Behavioral parity target: reference cutie/model/cutie.py:18-260. The facade is
a flax module whose methods mirror the reference's stage methods
(encode_image / transform_key / encode_mask / pixel_fusion / readout_query /
segment / read_memory / compute_aux); the stateful memory logic lives in
cutie_tpu.inference (inference) and cutie_tpu.training (training).

Layouts: images [B, H, W, 3]; group tensors [B, N, H, W, C]; masks [B, N, H, W].
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from cutie_tpu.config import Config
from cutie_tpu.models.aux_modules import AuxComputer
from cutie_tpu.models.big_modules import (KeyProjection, MaskDecoder, MaskEncoder,
                                          PixelEncoder, PixelFeatureFuser)
from cutie_tpu.models.layers import conv2d
from cutie_tpu.models.object_summarizer import ObjectSummarizer
from cutie_tpu.models.object_transformer import QueryTransformer
from cutie_tpu.ops.memory import get_similarity, readout, softmax_affinity
from cutie_tpu.ops.resize import area_downsample, upsample_4x
from cutie_tpu.ops.tensor_utils import aggregate

Dtype = Any


class CUTIE(nn.Module):
    cfg: Config
    single_object: bool = False
    dtype: Dtype = jnp.float32

    def setup(self):
        model_cfg = self.cfg.model
        self.model_cfg = model_cfg
        self.object_transformer_enabled = model_cfg.object_transformer.num_blocks > 0

        self.pixel_encoder = PixelEncoder(model_cfg, dtype=self.dtype)
        self.pix_feat_proj = conv2d(model_cfg.pixel_dim, 1, dtype=self.dtype,
                                    name="pix_feat_proj")
        self.key_proj = KeyProjection(model_cfg, dtype=self.dtype)
        self.mask_encoder = MaskEncoder(model_cfg, single_object=self.single_object,
                                        dtype=self.dtype)
        self.mask_decoder = MaskDecoder(model_cfg, dtype=self.dtype)
        self.pixel_fuser = PixelFeatureFuser(model_cfg, single_object=self.single_object,
                                             dtype=self.dtype)
        if self.object_transformer_enabled:
            self.object_transformer = QueryTransformer(model_cfg, dtype=self.dtype)
            self.object_summarizer = ObjectSummarizer(model_cfg, dtype=self.dtype)
        self.aux_computer = AuxComputer(self.cfg, dtype=self.dtype)

        self._pixel_mean = jnp.asarray(model_cfg.pixel_mean, dtype=jnp.float32)
        self._pixel_std = jnp.asarray(model_cfg.pixel_std, dtype=jnp.float32)

    # ---------------------------------------------------------------- helpers

    def _normalize(self, image: jnp.ndarray) -> jnp.ndarray:
        return ((image - self._pixel_mean) / self._pixel_std).astype(self.dtype)

    def _get_others(self, masks: jnp.ndarray) -> Optional[jnp.ndarray]:
        """Per-object sum of all other objects' masks (cutie.py:49-59)."""
        if self.single_object:
            return None
        return jnp.clip(masks.sum(axis=1, keepdims=True) - masks, 0, 1)

    # ----------------------------------------------------------------- stages

    def encode_image(self, image: jnp.ndarray):
        """image [B,H,W,3] -> ((f16,f8,f4), pix_feat) (cutie.py:61-64)."""
        image = self._normalize(image)
        ms_image_feat = self.pixel_encoder(image)
        return ms_image_feat, self.pix_feat_proj(ms_image_feat[0])

    def transform_key(self, final_pix_feat: jnp.ndarray, *, need_sk: bool = True,
                      need_ek: bool = True):
        """f16 -> (key, shrinkage, selection) (cutie.py:92-98)."""
        return self.key_proj(final_pix_feat, need_s=need_sk, need_e=need_ek)

    def encode_mask(self, image: jnp.ndarray, pix_feat: jnp.ndarray,
                    sensory: jnp.ndarray, masks: jnp.ndarray, *,
                    deep_update=True, need_weights: bool = False):
        """-> (msk_value, new_sensory, object_summaries, object_logits)
        (cutie.py:66-90)."""
        image = self._normalize(image)
        others = self._get_others(masks)
        mask_value, new_sensory = self.mask_encoder(image, pix_feat, sensory, masks,
                                                    others, deep_update=deep_update)
        if self.object_transformer_enabled:
            object_summaries, object_logits = self.object_summarizer(
                masks, mask_value, need_weights)
        else:
            object_summaries, object_logits = None, None
        return mask_value, new_sensory, object_summaries, object_logits

    def pixel_fusion(self, pix_feat: jnp.ndarray, pixel: jnp.ndarray,
                     sensory: jnp.ndarray, last_mask: jnp.ndarray) -> jnp.ndarray:
        """(cutie.py:142-157). last_mask at full padded res [B, N, H0, W0]."""
        h = sensory.shape[-3]
        factor = last_mask.shape[-2] // h
        last_mask_ds = area_downsample(last_mask[..., None], factor)[..., 0]
        last_others = self._get_others(last_mask_ds)
        return self.pixel_fuser(pix_feat, pixel, sensory, last_mask_ds, last_others)

    def readout_query(self, pixel_readout: jnp.ndarray, obj_memory: Optional[jnp.ndarray],
                      *, selector: Optional[jnp.ndarray] = None):
        """(cutie.py:159-170)."""
        if not self.object_transformer_enabled:
            return pixel_readout, None
        return self.object_transformer(pixel_readout, obj_memory, selector=selector)

    def segment(self, ms_image_feat: List[jnp.ndarray], memory_readout: jnp.ndarray,
                sensory: jnp.ndarray, *, selector: Optional[jnp.ndarray] = None,
                update_sensory=True, return_low_logits: bool = False):
        """-> (new_sensory, logits_fullres, prob_with_bg_fullres) (cutie.py:172-203).
        return_low_logits additionally returns the PRE-upsample stride-4
        aggregate logits — the training loss samples the virtual upsample
        directly from them (ops/point_features.py:point_sample_upsampled)."""
        sensory, logits = self.mask_decoder(ms_image_feat, memory_readout, sensory,
                                            update_sensory=update_sensory)
        prob = nn.sigmoid(logits.astype(jnp.float32))
        if selector is not None:
            prob = prob * selector[..., None, None]
        agg_low = aggregate(prob, axis=1)  # [B, N+1, H4, W4]
        agg_logits = self._upsample_logits(agg_low)
        prob = nn.softmax(agg_logits, axis=1)
        if return_low_logits:
            return sensory, agg_logits, prob, agg_low
        return sensory, agg_logits, prob

    @staticmethod
    def _upsample_logits(logits: jnp.ndarray) -> jnp.ndarray:
        """4x bilinear upsample of [B, C, H, W] (channel axis 1, like the
        reference's aggregate output)."""
        # move channel last for the resize helper, then back
        x = jnp.moveaxis(logits, 1, -1)
        x = upsample_4x(x)
        return jnp.moveaxis(x, -1, 1)

    def compute_aux(self, pix_feat: jnp.ndarray, aux_inputs: Dict[str, jnp.ndarray],
                    selector: Optional[jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        return self.aux_computer(pix_feat, aux_inputs, selector)

    # ------------------------------------------------------ training read path

    def read_memory(self, query_key: jnp.ndarray, query_selection: jnp.ndarray,
                    memory_key: jnp.ndarray, memory_shrinkage: jnp.ndarray,
                    msk_value: jnp.ndarray, obj_memory: Optional[jnp.ndarray],
                    pix_feat: jnp.ndarray, sensory: jnp.ndarray,
                    last_mask: jnp.ndarray, selector: Optional[jnp.ndarray]):
        """Training-only full-softmax memory read (cutie.py:102-140).

        query_key/selection: [B, h, w, CK]
        memory_key:          [B, T, h, w, CK]; shrinkage [B, T, h, w, 1]
        msk_value:           [B, N, T, h, w, CV]
        obj_memory:          [B, N, T, Q, C+1]
        last_mask:           [B, N, H0, W0] (full padded res)
        """
        b, t, h, w, ck = memory_key.shape
        n = msk_value.shape[1]
        cv = msk_value.shape[-1]

        mk = memory_key.reshape(b, t * h * w, ck)
        ms = memory_shrinkage.reshape(b, t * h * w)
        qk = query_key.reshape(b, h * w, ck)
        qe = query_selection.reshape(b, h * w, ck)

        similarity = get_similarity(mk, ms, qk, qe)
        affinity = softmax_affinity(similarity)  # [B, HW, THW]
        mv = msk_value.reshape(b, n, t * h * w, cv)
        pixel_readout = readout(affinity, mv)  # [B, N, HW, CV]
        pixel_readout = pixel_readout.reshape(b, n, h, w, cv)

        pixel_readout = self.pixel_fusion(pix_feat, pixel_readout, sensory, last_mask)
        mem_readout, aux_features = self.readout_query(pixel_readout, obj_memory,
                                                       selector=selector)
        aux_output = {
            "sensory": sensory,
            "q_logits": aux_features["logits"] if aux_features else None,
            "attn_mask": aux_features["attn_mask"] if aux_features else None,
        }
        return mem_readout, aux_output

    # -------------------------------------------------------------- param init

    def __call__(self, image: jnp.ndarray, masks: jnp.ndarray):
        """Dummy full pass touching every submodule — used only for param init.
        image: [B, H0, W0, 3]; masks: [B, N, H0, W0]."""
        b, h0, w0, _ = image.shape
        n = masks.shape[1]
        ms_feat, pix_feat = self.encode_image(image)
        key, shrinkage, selection = self.transform_key(ms_feat[0])
        h, w = key.shape[1:3]
        sensory = jnp.zeros((b, n, h, w, self.model_cfg.sensory_dim), self.dtype)
        msk_value, sensory2, obj_summaries, _ = self.encode_mask(
            image, pix_feat, sensory, masks, deep_update=True)
        pixel_readout = self.pixel_fusion(pix_feat, msk_value, sensory, masks)
        obj_mem = obj_summaries[:, :, None] if obj_summaries is not None else None
        mem_readout, aux_features = self.readout_query(pixel_readout, obj_mem)
        aux_input = {
            "sensory": sensory,
            "q_logits": aux_features["logits"] if aux_features else None,
            "attn_mask": aux_features["attn_mask"] if aux_features else None,
        }
        aux = self.compute_aux(pix_feat, aux_input, jnp.ones((b, n)))
        new_sensory, logits, prob = self.segment(ms_feat, mem_readout, sensory)
        return logits, prob, aux
