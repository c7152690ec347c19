"""Auxiliary output heads for training losses.

Behavioral parity target: reference cutie/model/aux_modules.py:13-79.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax.numpy as jnp

from cutie_tpu.config import Config
from cutie_tpu.models.layers import GConv2d
from cutie_tpu.ops.tensor_utils import aggregate

Dtype = Any


class LinearPredictor(nn.Module):
    """sensory -> per-pixel linear classifier against pix_feat (aux_modules.py:13-26)."""
    x_dim: int
    pix_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, pix_feat: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        # pix_feat: [B, h, w, pix_dim]; x: [B, N, h, w, x_dim]
        x = GConv2d(self.pix_dim + 1, 1, dtype=self.dtype, name="projection")(x)
        logits = (pix_feat[:, None] * x[..., :-1]).sum(axis=-1) + x[..., -1]
        return logits  # [B, N, h, w]


class AuxComputer(nn.Module):
    """(aux_modules.py:40-79)"""
    cfg: Config
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, pix_feat: jnp.ndarray, aux_input: Dict[str, jnp.ndarray],
                 selector: Optional[jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        model_cfg = self.cfg.model
        aux_output: Dict[str, jnp.ndarray] = {}
        if "attn_mask" in aux_input:
            aux_output["attn_mask"] = aux_input["attn_mask"]

        if model_cfg.aux_loss.sensory.enabled:
            logits = LinearPredictor(model_cfg.sensory_dim, model_cfg.embed_dim,
                                     dtype=self.dtype,
                                     name="sensory_aux")(pix_feat, aux_input["sensory"])
            aux_output["sensory_logits"] = self._aggregate_with_selector(
                logits, selector)
        if model_cfg.aux_loss.query.enabled and aux_input.get("q_logits") is not None:
            # q_logits: [B, N, L, h, w]
            sel = selector[:, :, None] if selector is not None else None
            aux_output["q_logits"] = self._aggregate_with_selector(
                aux_input["q_logits"], sel)
        return aux_output

    @staticmethod
    def _aggregate_with_selector(logits, selector):
        prob = nn.sigmoid(logits.astype(jnp.float32))
        if selector is not None:
            sel = selector
            while sel.ndim < prob.ndim:
                sel = sel[..., None]
            prob = prob * sel
        return aggregate(prob, axis=1)
