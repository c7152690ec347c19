"""Fused Pallas TPU kernel for the memory-read hot loop.

Replaces the XLA chain get_similarity -> top-k softmax -> readout
(cutie_tpu/ops/memory.py; reference cutie/model/utils/memory_utils.py:7-95)
with a single kernel that never materializes the [P, N] affinity in HBM:

  pass 1 (per query block, streaming over token chunks): maintain the top-k
         similarity values per query with an iterative max-extract merge;
         tau = k-th largest value;
  pass 2 (streaming again): accumulate exp(sim) * [sim >= tau] @ values and
         the normalizer Z; a third streaming pass emits usage
         (sum over queries of affinity) with the final Z.

Keys/shrinkage/validity live in VMEM (N*Ck fp32 ~ 3MB at N=12k); the value
matrix [N, O*Cv] stays in HBM and is DMA'd chunk by chunk. Exact vs the
reference top-k softmax except at fp32 ties of the k-th value.

Status: verified bit-close against the XLA path on a real v5e chip
(max diff ~1e-6 at N=12k, P=2k), but NOT the default backend: at
production sizes XLA's sort-based top_k + dense readout measures ~4x
faster (0.021 vs 0.083 ms) — the 30-iteration max-extract merge plus the
3x HIGHEST-precision sim recomputation dominates. The kernel's
O(P*k + N*O*Cv/chunk) VMEM footprint (vs XLA's O(P*N) HBM affinity) becomes
the winning property only for much larger token counts than Cutie's memory
budgets allow; kept as an optional backend + reference implementation.
"""
from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _first_match_mask(eq, width):
    """One-hot of the FIRST True per row of eq [BP, W] (masked-iota argmin;
    Mosaic has no cumsum/argmin primitives)."""
    iota = jax.lax.broadcasted_iota(jnp.int32, eq.shape, 1)
    first = jnp.min(jnp.where(eq, iota, width), axis=1, keepdims=True)
    return iota == first


def _topk_merge(sim_blk, vals, k):
    """Merge a [BP, BN] similarity chunk into running top-k values [BP, k]."""
    bn = sim_blk.shape[1]
    kk = vals.shape[1]

    def body(j, carry):
        sim_blk, vals = carry
        m = jnp.max(sim_blk, axis=1, keepdims=True)            # [BP, 1]
        vmin = jnp.min(vals, axis=1, keepdims=True)            # [BP, 1]
        accept = m > vmin
        first_min = _first_match_mask(vals == vmin, kk)
        vals = jnp.where(first_min & accept, m, vals)
        first_max = _first_match_mask(sim_blk == m, bn)
        sim_blk = jnp.where(first_max & accept, NEG_INF, sim_blk)
        return sim_blk, vals

    _, vals = jax.lax.fori_loop(0, k, body, (sim_blk, vals))
    return vals


def _read_kernel(mk_ref, ms_ref, valid_ref, qk_ref, qe_ref, v_hbm,
                 out_ref, usage_ref, v_scratch, dma_sem, *,
                 top_k, bn, n_chunks, ck):
    qk = qk_ref[:].astype(jnp.float32)
    qe = qe_ref[:].astype(jnp.float32)
    bp = qk.shape[0]
    qkqe = qk * qe
    b_sq = jnp.sum(qe * qk * qk, axis=1, keepdims=True)
    inv_sqrt_ck = 1.0 / math.sqrt(ck)

    def sim_chunk(ci):
        mk = mk_ref[pl.ds(ci * bn, bn), :]
        ms = ms_ref[0, pl.ds(ci * bn, bn)]
        vd = valid_ref[0, pl.ds(ci * bn, bn)]
        # HIGHEST precision: fp32 similarity, matching ops/memory.py (the
        # top-k boundary is sensitive to MXU bf16 rounding)
        a_sq = jax.lax.dot_general(qe, mk * mk, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32,
                                   precision=jax.lax.Precision.HIGHEST)
        two_ab = 2.0 * jax.lax.dot_general(qkqe, mk, (((1,), (1,)), ((), ())),
                                           preferred_element_type=jnp.float32,
                                           precision=jax.lax.Precision.HIGHEST)
        sim = (-a_sq + two_ab - b_sq) * (ms[None, :] * inv_sqrt_ck)
        return jnp.where(vd[None, :] > 0.5, sim, NEG_INF)

    # ---- pass 1: per-query top-k threshold
    def p1(ci, vals):
        return _topk_merge(sim_chunk(ci), vals, top_k)

    vals = jnp.full((bp, top_k), NEG_INF, jnp.float32)
    vals = jax.lax.fori_loop(0, n_chunks, p1, vals)
    tau = jnp.min(vals, axis=1, keepdims=True)

    # ---- pass 2: masked-softmax readout (values DMA'd per chunk)
    ocv = out_ref.shape[1]

    def p2(ci, carry):
        acc, z = carry
        copy = pltpu.make_async_copy(v_hbm.at[pl.ds(ci * bn, bn), :],
                                     v_scratch, dma_sem)
        copy.start()
        sim = sim_chunk(ci)
        w = jnp.where(sim >= tau, jnp.exp(sim), 0.0)  # sim <= 0 -> exp <= 1
        z = z + jnp.sum(w, axis=1, keepdims=True)
        copy.wait()
        acc = acc + jax.lax.dot_general(w, v_scratch[:],
                                        (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32,
                                        precision=jax.lax.Precision.HIGHEST)
        return acc, z

    acc = jnp.zeros((bp, ocv), jnp.float32)
    z = jnp.zeros((bp, 1), jnp.float32)
    acc, z = jax.lax.fori_loop(0, n_chunks, p2, (acc, z))
    zsafe = jnp.maximum(z, 1e-30)
    out_ref[:] = acc / zsafe

    # ---- pass 3: usage = sum over queries of normalized affinity
    qi = pl.program_id(0)

    def p3(ci, _):
        sim = sim_chunk(ci)
        w = jnp.where(sim >= tau, jnp.exp(sim), 0.0) / zsafe
        usage_ref[qi, pl.ds(ci * bn, bn)] = jnp.sum(w, axis=0)
        return 0

    jax.lax.fori_loop(0, n_chunks, p3, 0)


def fused_topk_readout(mk: jnp.ndarray, ms: jnp.ndarray, valid: jnp.ndarray,
                       qk: jnp.ndarray, qe: jnp.ndarray, values: jnp.ndarray,
                       top_k: int, *, block_p: int = 512, block_n: int = 1024,
                       interpret: bool = False
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused memory read for ONE batch row.

    mk [N, Ck], ms [N], valid [N] bool, qk/qe [P, Ck], values [O, N, Cv].
    Returns (readout [O, P, Cv] fp32, usage [N] fp32).
    N must divide by block_n and P by block_p (pad + mask upstream).
    """
    n, ck = mk.shape
    p = qk.shape[0]
    o, _, cv = values.shape
    assert n % block_n == 0 and p % block_p == 0, (n, p, block_n, block_p)
    n_chunks = n // block_n
    grid = (p // block_p,)

    v2 = jnp.transpose(values, (1, 0, 2)).reshape(n, o * cv)

    kernel = functools.partial(_read_kernel, top_k=top_k, bn=block_n,
                               n_chunks=n_chunks, ck=ck)
    out, usage = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((n, ck), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_p, ck), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_p, ck), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),  # values stay in HBM
        ],
        out_specs=(
            pl.BlockSpec((block_p, o * cv), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            # full-array block: each grid step writes its own row
            pl.BlockSpec((grid[0], n), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((p, o * cv), jnp.float32),
            jax.ShapeDtypeStruct((grid[0], n), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_n, o * cv), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(mk.astype(jnp.float32), ms.astype(jnp.float32)[None],
      valid.astype(jnp.float32)[None], qk.astype(jnp.float32),
      qe.astype(jnp.float32), v2.astype(jnp.float32))

    readout = jnp.transpose(out.reshape(p, o, cv), (1, 0, 2))
    return readout, usage.sum(axis=0)
