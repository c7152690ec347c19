"""Object (query) transformer — reads memory at the object level.

Behavioral parity target: reference
cutie/model/transformer/object_transformer.py:12-205 (QueryTransformerBlock /
QueryTransformer with the fg/bg masked attention between blocks).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from cutie_tpu.config import Config
from cutie_tpu.models.attention import CrossAttention, FFN, PixelFFN, SelfAttention
from cutie_tpu.models.layers import GConv2d
from cutie_tpu.models.positional_encoding import positional_encoding
from cutie_tpu.ops.tensor_utils import aggregate

Dtype = Any


class QueryTransformerBlock(nn.Module):
    model_cfg: Config
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pixel, query_pe, pixel_pe, attn_mask):
        """
        x:        [B*N, Q, E] object queries
        pixel:    [B, N, H, W, E]
        query_pe: [B*N, Q, E]
        pixel_pe: [B*N, H*W, E]
        attn_mask: bool [B*N, heads, Q, H*W], True = blocked
        """
        cfg = self.model_cfg.object_transformer
        embed_dim, num_heads = cfg.embed_dim, cfg.num_heads

        bs, num_objects, h, w, _ = pixel.shape
        pixel_flat = pixel.reshape(bs * num_objects, h * w, embed_dim)

        x = CrossAttention(embed_dim, num_heads,
                           add_pe_to_qkv=cfg.read_from_pixel.add_pe_to_qkv,
                           dtype=self.dtype, name="read_from_pixel")(
                               x, pixel_flat, query_pe, pixel_pe, attn_mask=attn_mask)
        x = SelfAttention(embed_dim, num_heads,
                          add_pe_to_qkv=cfg.query_self_attention.add_pe_to_qkv,
                          dtype=self.dtype, name="self_attn")(x, query_pe)
        x = FFN(embed_dim, cfg.ff_dim, dtype=self.dtype, name="ffn")(x)

        pixel_flat = CrossAttention(embed_dim, num_heads,
                                    add_pe_to_qkv=cfg.read_from_query.add_pe_to_qkv,
                                    norm=cfg.read_from_query.output_norm,
                                    dtype=self.dtype, name="read_from_query")(
                                        pixel_flat, x, pixel_pe, query_pe)
        pixel = PixelFFN(embed_dim, dtype=self.dtype, name="pixel_ffn")(pixel, pixel_flat)
        return x, pixel


class QueryTransformer(nn.Module):
    model_cfg: Config
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, pixel: jnp.ndarray, obj_summaries: jnp.ndarray,
                 selector: Optional[jnp.ndarray] = None
                 ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        """
        pixel: [B, N, H, W, embed_dim]
        obj_summaries: [B, N, T, Q, embed_dim+1] (T=1 at inference — streaming avg upstream)
        selector: [B, N] in {0,1} or None (masks padded object slots)
        returns (pixel [B, N, H, W, E], aux {'logits': [B, N, L, H, W]})
        """
        cfg = self.model_cfg.object_transformer
        embed_dim, num_heads = cfg.embed_dim, cfg.num_heads
        num_queries, num_blocks = cfg.num_queries, cfg.num_blocks
        bs, num_objects, _, H, W = (*pixel.shape[:2], obj_summaries.shape[2],
                                    *pixel.shape[2:4])

        # normalize object summaries by accumulated area (object_transformer.py:126-132)
        summ = obj_summaries.reshape(bs * num_objects, -1, num_queries, embed_dim + 1)
        obj_sums = summ[..., :-1].sum(axis=1)   # [B*N, Q, E]
        obj_area = summ[..., -1:].sum(axis=1)   # [B*N, Q, 1]
        obj_values = obj_sums / (obj_area + 1e-4)

        dense = lambda name: nn.Dense(embed_dim, dtype=self.dtype, param_dtype=jnp.float32,
                                      name=name)
        obj_init = dense("summary_to_query_init")(obj_values)
        obj_emb = dense("summary_to_query_emb")(obj_values)

        query_init_w = self.param("query_init", nn.initializers.normal(1.0),
                                  (num_queries, embed_dim), jnp.float32)
        query_emb_w = self.param("query_emb", nn.initializers.normal(1.0),
                                 (num_queries, embed_dim), jnp.float32)
        query = query_init_w[None] + obj_init
        query_emb = query_emb_w[None] + obj_emb

        # pixel positional embeddings (object_transformer.py:141-147)
        pixel_init = GConv2d(embed_dim, 1, dtype=self.dtype, name="pixel_init_proj")(pixel)
        pixel_emb = GConv2d(embed_dim, 1, dtype=self.dtype, name="pixel_emb_proj")(pixel)
        spatial_pe = positional_encoding(H, W, embed_dim,
                                         scale=self.model_cfg.pixel_pe_scale,
                                         temperature=self.model_cfg.pixel_pe_temperature)
        pixel_emb = pixel_emb.reshape(bs * num_objects, H * W, embed_dim)
        pixel_pe = spatial_pe.reshape(1, H * W, embed_dim) + pixel_emb

        pixel = pixel_init

        aux_logits_list = []
        aux_logits = self._mask_pred(pixel, 0)
        attn_mask = self._get_aux_mask(aux_logits, selector, num_heads, num_queries)
        aux_logits_list.append(aux_logits)

        for i in range(num_blocks):
            query, pixel = QueryTransformerBlock(self.model_cfg, dtype=self.dtype,
                                                 name=f"block_{i}")(
                                                     query, pixel, query_emb, pixel_pe, attn_mask)
            aux_logits = self._mask_pred(pixel, i + 1)
            attn_mask = self._get_aux_mask(aux_logits, selector, num_heads, num_queries)
            aux_logits_list.append(aux_logits)

        aux = {"logits": jnp.stack(aux_logits_list, axis=2),  # [B, N, L, H, W]
               "attn_mask": attn_mask}
        return pixel, aux

    def _mask_pred(self, pixel: jnp.ndarray, level: int) -> jnp.ndarray:
        """mask_pred[level]: ReLU -> 1x1 GConv -> [B, N, H, W] logits."""
        out = GConv2d(1, 1, dtype=self.dtype, name=f"mask_pred_{level}")(nn.relu(pixel))
        return out[..., 0]

    @staticmethod
    def _get_aux_mask(logits: jnp.ndarray, selector: Optional[jnp.ndarray],
                      num_heads: int, num_queries: int) -> jnp.ndarray:
        """fg/bg attention mask (object_transformer.py:179-205).

        logits: [B, N, H, W]. Returns bool [B*N, heads, Q, H*W], True = blocked.
        First Q/2 queries attend only foreground pixels of their object, last
        Q/2 only background; fully-blocked rows are unblocked (torch-MHA NaN
        guard parity).
        """
        prob = nn.sigmoid(logits.astype(jnp.float32))
        if selector is not None:
            prob = prob * selector[..., None, None]
        agg = aggregate(prob, axis=1)  # [B, N+1, H, W]
        is_foreground = agg[:, 1:] >= agg.max(axis=1, keepdims=True)  # [B, N, H, W]
        b, n = is_foreground.shape[:2]
        foreground_mask = is_foreground.reshape(b, n, -1)  # [B,N,HW]

        inv_fg = ~foreground_mask
        inv_bg = foreground_mask
        hw = foreground_mask.shape[-1]
        # [B, N, heads, Q/2, HW] each
        fg_blk = jnp.broadcast_to(inv_fg[:, :, None, None, :],
                                  (b, n, num_heads, num_queries // 2, hw))
        bg_blk = jnp.broadcast_to(inv_bg[:, :, None, None, :],
                                  (b, n, num_heads, num_queries // 2, hw))
        aux_mask = jnp.concatenate([fg_blk, bg_blk], axis=3)  # [B,N,heads,Q,HW]
        aux_mask = aux_mask.reshape(b * n, num_heads, num_queries, hw)
        # unblock rows that are fully blocked
        all_blocked = aux_mask.all(axis=-1, keepdims=True)
        return aux_mask & ~all_blocked
