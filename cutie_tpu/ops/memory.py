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


def topk_readout_compact(similarity: jnp.ndarray,
                         values: jnp.ndarray,
                         top_k: int,
                         return_usage: bool = False
                         ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Top-k softmax + readout WITHOUT materializing the dense affinity.

    Mathematically identical to topk_softmax + readout (same top-k indices,
    same fp32 weights) but contracts only the k gathered value rows per
    query: at long-term-memory token counts (N ~ 28k) the dense route does
    O(P*N*Cv) matmul FLOPs + writes/reads a [P, N] affinity through HBM,
    while this does O(P*k*Cv) — a ~N/k reduction. Reduction order differs
    (k-ary sum vs sparse-dense matmul), so results agree to fp32 tolerance.

    similarity: [B, P, N]; values: [B, O, N, Cv].
    Returns (readout [B, O, P, Cv], usage [B, N] or None).
    """
    b, p, n = similarity.shape
    k = min(top_k, n)
    vals, idx = jax.lax.top_k(similarity, k)        # [B, P, K]
    w = _weights_from_topk(vals)
    rd = _gather_readout(w, idx, values)

    if return_usage:
        usage = jnp.zeros((b, n), jnp.float32).at[
            jnp.arange(b)[:, None, None], idx].add(w)
        return rd, usage
    return rd, None


def _weights_from_topk(vals: jnp.ndarray) -> jnp.ndarray:
    """Normalized softmax weights over per-query top-k similarities [B, P, K]
    (exp without max subtraction: sim <= 0 by construction, masked -> 0)."""
    x_exp = jnp.exp(vals)
    return x_exp / jnp.maximum(jnp.sum(x_exp, axis=-1, keepdims=True), 1e-30)


def _gather_readout(w: jnp.ndarray, idx: jnp.ndarray, values: jnp.ndarray
                    ) -> jnp.ndarray:
    """Contract top-k weights [B, P, K] against gathered value rows
    (values [B, O, N, Cv], idx [B, P, K]) -> [B, O, P, Cv]."""
    idxe = idx[:, None, :, :, None]                 # [B, 1, P, K, 1]
    ve = values.astype(jnp.float32)[:, :, None]     # [B, O, 1, N, Cv]
    g = jnp.take_along_axis(ve, idxe, axis=3)       # [B, O, P, K, Cv]
    return jnp.einsum("bpk,bopkc->bopc", w, g,
                      precision=jax.lax.Precision.HIGHEST)


def _float_order_key(x: jnp.ndarray) -> jnp.ndarray:
    """Map fp32 -> uint32 so that unsigned integer order == float order
    (standard radix-sort key transform; no NaNs expected here)."""
    b = jax.lax.bitcast_convert_type(x, jnp.uint32)
    return jnp.where((b >> 31) == 0, b | jnp.uint32(0x80000000), ~b)


import os
# Bits resolved per pass over the keys. Measured on one v5e (2026-08-20,
# tools/bisect_r4.py, 60-frame steady-state d17 stream, trained weights):
# g=1 (32 single-candidate passes) 8.0 ms/frame = 124.8 FPS; g=4 (8 passes
# x 15 fused candidate counts) 8.9 ms/frame = 112.1 FPS — the grouped form
# reads the keys fewer times but its 15-way fused compare+count lowers
# worse than four sequential single compares, so single-bit stays default.
# (The Pallas LT kernel takes its own group_bits parameter.)
RADIX_GROUP_BITS = int(os.environ.get("CUTIE_TPU_RADIX_GROUP_BITS", "1"))


def topk_threshold_radix(similarity: jnp.ndarray, top_k: int) -> jnp.ndarray:
    """EXACT per-query k-th-largest similarity via MSB-first radix select.

    Standalone, `jax.lax.top_k` on TPU is a full variadic bitonic sort —
    O(N log^2 N) HBM passes, ~27 ms at long-term-memory scale (N ~ 20k,
    P = 1792 @ 480p; inside the fused inference step XLA does far better —
    see inference/steps.py). Finding only the k-th value needs no sort:
    build the threshold's 32-bit pattern MSB-first, keeping a tentative
    bit iff >= k elements remain >= the candidate prefix.

    The select is bandwidth-bound on re-reading the keys, so bits are
    resolved in groups of RADIX_GROUP_BITS per pass: all 2^g - 1 candidate
    extensions are counted from ONE read of the keys (XLA fuses the
    compare+count reductions over the shared input), and since cnt is
    non-increasing in the extension value x — with cnt(prefix) >= k as
    the loop invariant — the resolved group value is simply
    #{x >= 1 : cnt_x >= k}. 8 passes instead of 32 for g=4; bit-exact
    same threshold.

    similarity: [B, P, N] fp32 -> tau [B, P, 1] fp32, the exact k-th
    largest per query (== lax.top_k(similarity, k)[0][..., -1:]).
    """
    keys = _float_order_key(similarity)
    k = jnp.int32(top_k)
    g = RADIX_GROUP_BITS
    assert 32 % g == 0

    def group_step(i, prefix):
        shift = (32 - g - i * g).astype(jnp.uint32)
        v = jnp.zeros(prefix.shape, jnp.uint32)
        for x in range(1, 1 << g):
            cand = prefix | (jnp.uint32(x) << shift)
            cnt = jnp.sum((keys >= cand[..., None]).astype(jnp.int32),
                          axis=-1)
            v = v + (cnt >= k).astype(jnp.uint32)
        return prefix | (v << shift)

    prefix = jax.lax.fori_loop(
        0, 32 // g, group_step, jnp.zeros(similarity.shape[:-1], jnp.uint32))
    # invert the order transform back to fp32
    b = jnp.where((prefix >> 31) != 0, prefix & jnp.uint32(0x7FFFFFFF),
                  ~prefix)
    return jax.lax.bitcast_convert_type(b, jnp.float32)[..., None]


def topk_softmax_radix(similarity: jnp.ndarray,
                       top_k: int,
                       return_usage: bool = False
                       ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Top-k sparse softmax via exact radix-select threshold (no sort).

    Matches topk_softmax except when several tokens tie EXACTLY (same fp32
    bits) with the k-th similarity: all ties are kept (the sort-based path
    keeps an arbitrary k of them) — the same tie caveat the dense path
    already carries vs torch.topk. Masked (-1e30) tokens stay excluded:
    exp(-1e30) == 0.
    """
    tau = topk_threshold_radix(similarity, min(top_k, similarity.shape[-1]))
    w = jnp.where(similarity >= tau, jnp.exp(similarity), 0.0)
    affinity = w / jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-30)
    if return_usage:
        return affinity, affinity.sum(axis=1)
    return affinity, None


def softmax_affinity(similarity: jnp.ndarray) -> jnp.ndarray:
    """Full (no top-k) max-subtracted softmax over the memory-token axis,
    used in training and in LT consolidation (memory_utils.py:67-71)."""
    maxes = jnp.max(similarity, axis=-1, keepdims=True)
    x_exp = jnp.exp(similarity - maxes)
    return x_exp / jnp.sum(x_exp, axis=-1, keepdims=True)


def readout(affinity: jnp.ndarray, values: jnp.ndarray,
            compute_dtype=None) -> jnp.ndarray:
    """Weighted read of memory values.

    affinity: [B, P, N]
    values:   [B, N, Cv]        -> returns [B, P, Cv]
           or [B, O, N, Cv]     -> returns [B, O, P, Cv]
    (parity: memory_utils.py:88-95 / memory_manager.py:77-88)

    compute_dtype=bf16 runs the contraction in bf16 (result fp32) — the amp
    analog: the reference's readout bmm sits OUTSIDE the fp32-forced
    similarity/softmax block (cutie.py:119-128) and runs half precision
    under inference autocast. None keeps true-fp32 multiplies.
    """
    if compute_dtype is not None:
        a = affinity.astype(compute_dtype)
        v = values.astype(compute_dtype)
        eq = "bpn,bnc->bpc" if values.ndim == 3 else "bpn,bonc->bopc"
        return jnp.einsum(eq, a, v,
                          preferred_element_type=jnp.float32)
    prec = jax.lax.Precision.HIGHEST
    if values.ndim == 3:
        return jnp.einsum("bpn,bnc->bpc", affinity, values.astype(affinity.dtype),
                          precision=prec)
    return jnp.einsum("bpn,bonc->bopc", affinity, values.astype(affinity.dtype),
                      precision=prec)
