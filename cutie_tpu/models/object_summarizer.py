"""Object summarizer: pools mask-encoder values into per-object summary tokens.

Behavioral parity target: reference
cutie/model/transformer/object_summarizer.py:10-89. Output is
cat(sums, area): [B, N, num_summaries, embed_dim+1] so downstream can keep a
streaming average (the +1 channel accumulates pooling weight mass).
Pooling math is fp32-forced like the reference (:78-82).
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from cutie_tpu.config import Config
from cutie_tpu.models.positional_encoding import positional_encoding
from cutie_tpu.ops.resize import area_downsample

Dtype = Any


class ObjectSummarizer(nn.Module):
    model_cfg: Config
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, masks: jnp.ndarray, value: jnp.ndarray,
                 need_weights: bool = False) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        """
        masks: [B, N, H0, W0] (full padded resolution, prob in [0,1])
        value: [B, N, h, w, value_dim] (stride 16)
        returns (summaries [B, N, Q, embed_dim+1], logits or None)
        """
        cfg = self.model_cfg.object_summarizer
        embed_dim = cfg.embed_dim
        num_summaries = cfg.num_summaries

        h, w = value.shape[-3], value.shape[-2]
        factor = masks.shape[-2] // h
        masks = area_downsample(masks[..., None], factor)  # [B,N,h,w,1]
        inv_masks = 1 - masks
        repeated_masks = jnp.concatenate([
            jnp.broadcast_to(masks, (*masks.shape[:-1], num_summaries // 2)),
            jnp.broadcast_to(inv_masks, (*masks.shape[:-1], num_summaries // 2)),
        ], axis=-1)

        value = nn.Dense(embed_dim, dtype=self.dtype, param_dtype=jnp.float32,
                         name="input_proj")(value)
        if cfg.add_pe:
            pe = positional_encoding(h, w, embed_dim,
                                     scale=self.model_cfg.pixel_pe_scale,
                                     temperature=self.model_cfg.pixel_pe_temperature)
            value = value + pe[None, None]

        # fp32-forced pooling
        value = value.astype(jnp.float32)
        dense32 = lambda feats, name: nn.Dense(feats, dtype=jnp.float32,
                                               param_dtype=jnp.float32, name=name)
        feature = dense32(embed_dim, "feature_pred_2")(
            nn.relu(dense32(embed_dim, "feature_pred_0")(value)))
        logits = dense32(num_summaries, "weights_pred_2")(
            nn.relu(dense32(embed_dim, "weights_pred_0")(value)))

        # weighted pooling (object_summarizer.py:10-23)
        weights = nn.sigmoid(logits) * repeated_masks.astype(jnp.float32)
        sums = jnp.einsum("bkhwq,bkhwc->bkqc", weights, feature)
        area = weights.sum(axis=(2, 3))[..., None]  # [B,N,Q,1]
        summaries = jnp.concatenate([sums, area], axis=-1)

        if need_weights:
            return summaries, logits
        return summaries, None
