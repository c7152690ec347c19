"""Transformer attention layers for the object transformer.

Behavioral parity target: reference
cutie/model/transformer/transformer_layers.py:12-161 (pre-norm residual
Self/CrossAttention wrapping nn.MultiheadAttention, FFN, PixelFFN).

The multi-head attention is hand-rolled (q/k/v/out projections + additive
boolean masking + fp32 softmax) — matches torch nn.MultiheadAttention with
batch_first=True and dropout=0.
"""
from __future__ import annotations

from typing import Any, List, Optional

import flax.linen as nn
import jax.numpy as jnp

from cutie_tpu.models.layers import CAResBlock

Dtype = Any
NEG_INF = -1e30


class MultiheadAttention(nn.Module):
    """q: [B, Lq, E], k/v: [B, Lk, E], mask: bool [B, H, Lq, Lk] (True = blocked)."""
    dim: int
    num_heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, q, k, v, mask: Optional[jnp.ndarray] = None):
        e, h = self.dim, self.num_heads
        head_dim = e // h
        dense = lambda name: nn.Dense(e, dtype=self.dtype, param_dtype=jnp.float32, name=name)
        q = dense("q")(q)
        k = dense("k")(k)
        v = dense("v")(v)

        def split(x):
            return x.reshape(*x.shape[:-1], h, head_dim).swapaxes(-3, -2)  # [B,H,L,hd]

        q, k, v = split(q), split(k), split(v)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) / jnp.sqrt(
            jnp.float32(head_dim))
        if mask is not None:
            logits = jnp.where(mask, NEG_INF, logits)
        attn = nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.swapaxes(-3, -2).reshape(*out.shape[:-3], q.shape[-2], e)
        return dense("out_proj")(out)


class SelfAttention(nn.Module):
    """Pre-norm residual self-attention (transformer_layers.py:12-41)."""
    dim: int
    num_heads: int
    add_pe_to_qkv: List[bool]
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pe):
        x = nn.LayerNorm(dtype=jnp.float32, param_dtype=jnp.float32, name="norm")(x)
        if any(self.add_pe_to_qkv):
            x_pe = x + pe
            q = x_pe if self.add_pe_to_qkv[0] else x
            k = x_pe if self.add_pe_to_qkv[1] else x
            v = x_pe if self.add_pe_to_qkv[2] else x
        else:
            q = k = v = x
        r = x
        out = MultiheadAttention(self.dim, self.num_heads, dtype=self.dtype,
                                 name="self_attn")(q, k, v)
        return r + out


class CrossAttention(nn.Module):
    """Pre-norm residual cross-attention (transformer_layers.py:45-98)."""
    dim: int
    num_heads: int
    add_pe_to_qkv: List[bool]
    norm: bool = True
    residual: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mem, x_pe, mem_pe, attn_mask: Optional[jnp.ndarray] = None):
        if self.norm:
            x = nn.LayerNorm(dtype=jnp.float32, param_dtype=jnp.float32, name="norm")(x)
        q = x + x_pe if self.add_pe_to_qkv[0] else x
        if any(self.add_pe_to_qkv[1:]):
            mem_pe_added = mem + mem_pe
            k = mem_pe_added if self.add_pe_to_qkv[1] else mem
            v = mem_pe_added if self.add_pe_to_qkv[2] else mem
        else:
            k = v = mem
        r = x
        out = MultiheadAttention(self.dim, self.num_heads, dtype=self.dtype,
                                 name="cross_attn")(q, k, v, mask=attn_mask)
        if self.residual:
            return r + out
        return out


class FFN(nn.Module):
    """Pre-norm residual MLP (transformer_layers.py:101-118)."""
    dim_in: int
    dim_ff: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        r = x
        x = nn.LayerNorm(dtype=jnp.float32, param_dtype=jnp.float32, name="norm")(x)
        x = nn.Dense(self.dim_ff, dtype=self.dtype, param_dtype=jnp.float32, name="linear1")(x)
        x = nn.relu(x)
        x = nn.Dense(self.dim_in, dtype=self.dtype, param_dtype=jnp.float32, name="linear2")(x)
        return r + x


class PixelFFN(nn.Module):
    """CAResBlock over the pixel map (transformer_layers.py:121-136).
    pixel: [B, N, H, W, C]; pixel_flat: [B*N, H*W, C] (post cross-attention)."""
    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, pixel, pixel_flat):
        bs, num_objects, h, w, _ = pixel.shape
        pixel_flat = pixel_flat.reshape(bs * num_objects, h, w, self.dim)
        x = CAResBlock(self.dim, self.dim, dtype=self.dtype, name="conv")(pixel_flat)
        return x.reshape(bs, num_objects, h, w, self.dim)
