"""Memory attention math — the hot kernel chain.

Behavioral parity targets: reference cutie/model/utils/memory_utils.py:7-95
(get_similarity / do_softmax / readout), re-laid-out for TPU:

  - tokens are ROWS: memory keys [B, N, Ck], query keys [B, P, Ck]
    (the reference uses channels-first [B, Ck, N]); similarity is
    [B, P, N] (query rows, memory-token cols) so the readout
    `affinity @ values` is a single MXU-friendly matmul.
  - fixed-shape buffers: an optional validity mask [B, N] replaces the
    reference's dynamically-growing token axis. Invalid tokens get
    -inf similarity and never enter the top-k.

All math is fp32 (the reference forces fp32 for this chain:
cutie/model/cutie.py:119-128).
"""
from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def get_similarity(mk: jnp.ndarray,
                   ms: Optional[jnp.ndarray],
                   qk: jnp.ndarray,
                   qe: Optional[jnp.ndarray],
                   valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Anisotropic negative-squared-L2 similarity (XMem appendix formula).

    mk: [B, N, Ck] memory keys
    ms: [B, N] memory shrinkage (or None)
    qk: [B, P, Ck] query keys
    qe: [B, P, Ck] query selection (or None)
    valid: [B, N] bool validity of memory tokens (or None)
    returns [B, P, N] fp32, with invalid tokens at -inf.
    """
    mk = mk.astype(jnp.float32)
    qk = qk.astype(jnp.float32)
    ck = mk.shape[-1]

    # fp32 multiplies (precision HIGHEST): the top-k selection boundary is
    # sensitive to similarity noise, and the reference computes this in fp32
    prec = jax.lax.Precision.HIGHEST
    if qe is not None:
        qe = qe.astype(jnp.float32)
        # sim[p,n] = -sum_c qe[p,c] * (mk[n,c] - qk[p,c])^2
        a_sq = jnp.einsum("bpc,bnc->bpn", qe, mk * mk, precision=prec)
        two_ab = 2.0 * jnp.einsum("bpc,bnc->bpn", qk * qe, mk, precision=prec)
        b_sq = jnp.sum(qe * qk * qk, axis=-1, keepdims=True)
        similarity = -a_sq + two_ab - b_sq
    else:
        a_sq = jnp.sum(mk * mk, axis=-1)[:, None, :]
        two_ab = 2.0 * jnp.einsum("bpc,bnc->bpn", qk, mk, precision=prec)
        similarity = -a_sq + two_ab

    if ms is not None:
        ms = ms.astype(jnp.float32)
        similarity = similarity * ms[:, None, :] / math.sqrt(ck)
    else:
        similarity = similarity / math.sqrt(ck)

    if valid is not None:
        similarity = jnp.where(valid[:, None, :], similarity, NEG_INF)
    return similarity


def topk_softmax(similarity: jnp.ndarray,
                 top_k: int,
                 return_usage: bool = False
                 ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Top-k sparse softmax over the memory-token axis (last axis).

    Parity with reference do_softmax (memory_utils.py:49-77): select the k
    largest similarities per query, exponentiate WITHOUT max subtraction
    (valid because similarity <= 0 by construction), normalize over the k,
    scatter back to a dense-but-sparse affinity.

    similarity: [B, P, N]; returns (affinity [B, P, N], usage [B, N] or None).
    usage = sum of affinity over queries, used for LT consolidation ranking.
    """
    b, p, n = similarity.shape
    k = min(top_k, n)
    values, indices = jax.lax.top_k(similarity, k)  # [B, P, K]
    # exp without max-subtraction: similarities are <= 0 (exp <= 1);
    # masked (-inf) entries give exp 0 and drop out of the normalization.
    x_exp = jnp.exp(values)
    denom = jnp.sum(x_exp, axis=-1, keepdims=True)
    x_exp = x_exp / jnp.maximum(denom, 1e-30)

    affinity = jnp.zeros_like(similarity)
    b_idx = jnp.arange(b)[:, None, None]
    p_idx = jnp.arange(p)[None, :, None]
    affinity = affinity.at[b_idx, p_idx, indices].set(x_exp)

    if return_usage:
        return affinity, affinity.sum(axis=1)
    return affinity, None


def softmax_affinity(similarity: jnp.ndarray) -> jnp.ndarray:
    """Full (no top-k) max-subtracted softmax over the memory-token axis,
    used in training and in LT consolidation (memory_utils.py:67-71)."""
    maxes = jnp.max(similarity, axis=-1, keepdims=True)
    x_exp = jnp.exp(similarity - maxes)
    return x_exp / jnp.sum(x_exp, axis=-1, keepdims=True)


def readout(affinity: jnp.ndarray, values: jnp.ndarray) -> jnp.ndarray:
    """Weighted read of memory values.

    affinity: [B, P, N]
    values:   [B, N, Cv]        -> returns [B, P, Cv]
           or [B, O, N, Cv]     -> returns [B, O, P, Cv]
    (parity: memory_utils.py:88-95 / memory_manager.py:77-88)
    """
    prec = jax.lax.Precision.HIGHEST
    if values.ndim == 3:
        return jnp.einsum("bpn,bnc->bpc", affinity, values.astype(affinity.dtype),
                          precision=prec)
    return jnp.einsum("bpn,bonc->bopc", affinity, values.astype(affinity.dtype),
                      precision=prec)
