"""Fused Pallas TPU kernels for the memory-read hot loop.

Both kernels replace the XLA chain get_similarity -> top-k softmax ->
readout (cutie_tpu/ops/memory.py; reference
cutie/model/utils/memory_utils.py:7-95) with a single dispatch that never
materializes the [P, N] affinity in HBM.

`radix_topk_readout` — radix-select variant. When the chain runs
STANDALONE, lax.top_k on TPU is a full bitonic sort (27 ms of a 31 ms
read at N=20k / P=1792, 480p queries); this kernel computes the
similarity block ONCE into a VMEM scratch, radix-selects the EXACT
per-query k-th value in 32 VMEM-speed compare+count passes (no sort), and
streams only the values through HBM: 8.1 ms at N=20480 on one v5e — 3.9x
the standalone XLA chain — exact to fp32 tolerance, compiling up to the
full 28k-token LT capacity (tools/bench_pallas.py).

`fused_topk_readout` — the earlier streaming design (iterative max-extract
merge over token chunks, similarity recomputed per pass, O(P*k) VMEM).
23 ms at the same size: the k-iteration merge is VPU-bound. Kept as a
reference implementation.

Status (honest sustained-throughput measurements,
tools/bench_read_backend.py): the 'auto' production backends are the
pure-XLA radix-select (ops/memory.py) below ~16k memory tokens and THIS
kernel above — at the 28k-token long-term capacity it takes the fused
480p frame from 52.7 ms (sort) / 19.3 ms (XLA radix) to 17.1 ms.
"""
from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cutie_tpu.ops.memory import _float_order_key

NEG_INF = -1e30


def _chunk_similarity(mk_ref, ms_ref, valid_ref, qcat, b_sq,
                      inv_sqrt_ck, ci, bn):
    """One [BP, BN] similarity chunk (HIGHEST precision: fp32, matching
    ops/memory.py — the top-k boundary is sensitive to MXU bf16 rounding);
    invalid tokens forced to NEG_INF.

    The two K=Ck contractions (-qe.(mk*mk) and 2(qk*qe).mk) are fused into
    ONE K=2Ck dot: qcat = [qe | 2 qk*qe] (hoisted per grid step) against
    [-(mk*mk) | mk] built per chunk. Same FLOPs, half the MXU passes —
    Ck=64 only half-fills the 128-deep systolic array, and the HIGHEST
    (6-pass) decomposition made the under-filled dots the kernel's largest
    term at LT sizes."""
    mk = mk_ref[pl.ds(ci * bn, bn), :]
    ms = ms_ref[0, pl.ds(ci * bn, bn)]
    vd = valid_ref[0, pl.ds(ci * bn, bn)]
    mcat = jnp.concatenate([-(mk * mk), mk], axis=1)      # [BN, 2Ck]
    s = jax.lax.dot_general(qcat, mcat, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
    sim = (s - b_sq) * (ms[None, :] * inv_sqrt_ck)
    return jnp.where(vd[None, :] > 0.5, sim, NEG_INF)


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
    qcat = jnp.concatenate([qe, 2.0 * qk * qe], axis=1)   # [BP, 2Ck]
    b_sq = jnp.sum(qe * qk * qk, axis=1, keepdims=True)
    inv_sqrt_ck = 1.0 / math.sqrt(ck)

    def sim_chunk(ci):
        return _chunk_similarity(mk_ref, ms_ref, valid_ref, qcat, b_sq,
                                 inv_sqrt_ck, ci, bn)

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


def _invert_order_key(k: jnp.ndarray) -> jnp.ndarray:
    """Inverse of ops.memory._float_order_key (exact bit-level round trip;
    no NaNs in this pipeline)."""
    b = jnp.where((k >> 31) == 1, k ^ jnp.uint32(0x80000000), ~k)
    return jax.lax.bitcast_convert_type(b, jnp.float32)


def _radix_read_kernel(mk_ref, ms_ref, valid_ref, qk_ref, qe_ref, *refs,
                       top_k, bn, n_chunks, ck, gbits, seg_info, mm_dtype):
    """Exact top-k softmax readout with the [BP, N] similarity VMEM-resident.

    pass 1: similarity -> order-preserving uint32 keys into VMEM scratch
            (computed once, never in HBM; keys stored instead of raw floats
            so the radix passes are pure compare+count — recomputing the
            key transform inside all 32 passes cost ~1 ms/frame at LT
            sizes, round-3 device trace);
    pass 2: EXACT k-th-largest threshold per query via 32-step radix select
            (no sort — each step is one vectorized compare+count over the
            resident keys);
    pass 3: masked exp -> streamed value-chunk matmul accumulation; the
            masked weights OVERWRITE the resident chunk (keys are dead
            after thresholding) so
    pass 4: usage (column sums of normalized affinity) is a pure scaled
            load instead of a second key-compare + exp sweep.

    Ties at the exact k-th bit pattern are ALL kept (the sort-based paths
    keep an arbitrary k of them) — same caveat as ops/memory.py radix.

    refs = (*v_hbm_segs, out_ref, usage_ref, key_ref, v_scratch, dma_sem):
    one HBM value ref per memory segment ([O, cap_s, Cv] each, perm|lt|work
    order matching the resident key layout), so the XLA caller never
    concatenates/pads the ~115 MB value store per frame. seg_info is the
    static tuple of (resident_offset, cap) per segment; caps need not be
    bn-multiples — the final chunk of a segment is CLAMPED to its tail and
    the re-read overlap columns are zero-weighted for the contraction
    (parked w stays unguarded: overlap tokens re-park identical values).
    mm_dtype: bfloat16 = amp (1-pass MXU dot, fp32 accumulate); float32 =
    exact-ish bf16x3 (see below). Values always stream in their storage
    dtype; the cast happens at the dot.
    """
    n_segs = len(seg_info)
    v_hbm_segs = refs[:n_segs]
    out_ref, usage_ref, key_ref, v_scratch, dma_sem = refs[n_segs:]
    qk = qk_ref[:].astype(jnp.float32)
    qe = qe_ref[:].astype(jnp.float32)
    bp = qk.shape[0]
    qcat = jnp.concatenate([qe, 2.0 * qk * qe], axis=1)   # [BP, 2Ck]
    b_sq = jnp.sum(qe * qk * qk, axis=1, keepdims=True)
    inv_sqrt_ck = 1.0 / math.sqrt(ck)

    # (_float_order_key: the same order-preserving uint32 transform the XLA
    # radix path uses — one implementation to keep in sync)
    def p1(ci, _):
        sim = _chunk_similarity(mk_ref, ms_ref, valid_ref, qcat, b_sq,
                                inv_sqrt_ck, ci, bn)
        key_ref[:, pl.ds(ci * bn, bn)] = _float_order_key(sim)
        return 0

    jax.lax.fori_loop(0, n_chunks, p1, 0)

    # ---- pass 2: radix-select the exact k-th largest per query.
    # Bits can resolve in groups of `gbits` per sweep over the resident
    # keys (counting all 2^g - 1 candidate extensions from one read; cnt
    # is non-increasing in the extension value x with cnt(prefix) >= k as
    # the loop invariant, so the resolved group value is
    # #{x >= 1 : cnt_x >= k} — bit-exact same threshold as bit-by-bit).
    # MEASURED on-chip (tools/probe_radix_variants.py, LT scale): g=4 is
    # ~1.7x SLOWER than g=1 (13.2 vs 7.8 ms bf16) — the keys are already
    # VMEM-resident, so the select is VPU-compare-bound, not load-bound,
    # and grouping multiplies compares 15/4x. Default stays g=1; the
    # parameter remains for the probe tool and exactness tests.
    kk = jnp.int32(top_k)
    n_cand = (1 << gbits) - 1

    def group_step(i, prefix):
        shift = (32 - gbits - i * gbits).astype(jnp.uint32)
        cands = [prefix | (jnp.uint32(x + 1) << shift)
                 for x in range(n_cand)]

        # chunked count keeps live VMEM-stack values at [BP, BN] — a full
        # [BP, N] keys array on the stack OOMs scoped VMEM at production
        # LT sizes (28.8 MB at N=28160, block_p=256)
        def count_chunk(ci, cnts):
            keys_c = key_ref[:, pl.ds(ci * bn, bn)]
            # int32 count: Mosaic has no unsigned reductions
            return tuple(
                cnts[x] + jnp.sum((keys_c >= cands[x]).astype(jnp.int32),
                                  axis=1, keepdims=True)
                for x in range(n_cand))

        cnts = jax.lax.fori_loop(
            0, n_chunks, count_chunk,
            tuple(jnp.zeros((bp, 1), jnp.int32) for _ in range(n_cand)))
        v = jnp.zeros((bp, 1), jnp.uint32)
        for x in range(n_cand):
            v = v + (cnts[x] >= kk).astype(jnp.uint32)
        return prefix | (v << shift)

    tau_key = jax.lax.fori_loop(0, 32 // gbits, group_step,
                                jnp.zeros((bp, 1), jnp.uint32))

    # ---- pass 3: masked-softmax readout. Per SEGMENT (perm|lt|work value
    # stores read in place — no XLA-side concat/pad/cast of the ~115 MB
    # store per frame), with the value chunks DMA'd DOUBLE-BUFFERED (start
    # the next chunk's copy before contracting the current one — the
    # original start->wait->dot order serialized every chunk's HBM read
    # with its matmul, ~1 ms/frame of exposed DMA at LT sizes).
    o_dim, _, cv = v_hbm_segs[0].shape
    ocv = out_ref.shape[1]

    def v_copy(v_hbm, start, slot):
        return pltpu.make_async_copy(v_hbm.at[:, pl.ds(start, bn), :],
                                     v_scratch.at[slot], dma_sem.at[slot])

    def w_chunk(res_start):
        """Masked softmax weights for resident tokens [res_start, +bn);
        parks w (bitcast) over the dead keys for the usage pass."""
        keys_c = key_ref[:, pl.ds(res_start, bn)]
        sim_c = _invert_order_key(keys_c)
        # sim <= 0 -> exp <= 1; masked NEG_INF -> exp == 0
        w = jnp.where(keys_c >= tau_key, jnp.exp(sim_c), 0.0)
        key_ref[:, pl.ds(res_start, bn)] = jax.lax.bitcast_convert_type(
            w, jnp.uint32)
        return w

    def dot_acc(accs, w, slot):
        # amp (mm_dtype=bf16): MXU-native 1-pass dot, fp32 accumulate — the
        # reference's autocast readout bmm. fp32: manual bf16x3 (split each
        # operand into bf16 hi + bf16 residual, 3 significant cross
        # products) — ~1e-6 relative on this convex combination, half the
        # MXU passes of a HIGHEST fp32 dot (6-pass), which dominated the
        # fp32 kernel at LT sizes (round-4 probe: 11.0 ms/read vs 7.8
        # bf16). Manual because Mosaic rejects lax.Precision.HIGH.
        if mm_dtype != jnp.bfloat16:
            w_hi = w.astype(jnp.bfloat16)
            w_lo = (w - w_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        out = []
        for oi in range(o_dim):
            acc = accs[oi]
            v32 = v_scratch[slot, oi]
            if mm_dtype == jnp.bfloat16:
                pairs = ((w.astype(jnp.bfloat16), v32.astype(jnp.bfloat16)),)
            else:
                v_hi = v32.astype(jnp.bfloat16)
                v_lo = (v32.astype(jnp.float32)
                        - v_hi.astype(jnp.float32)).astype(jnp.bfloat16)
                pairs = ((w_hi, v_hi), (w_hi, v_lo), (w_lo, v_hi))
            for a_op, b_op in pairs:
                # explicit DEFAULT precision: an ambient
                # jax.default_matmul_precision("highest") context (the
                # parity/xiou gates run under one) would otherwise request
                # a 6-pass decomposition of a bf16xbf16 dot, which Mosaic
                # rejects ("Bad lhs type")
                acc = acc + jax.lax.dot_general(
                    a_op, b_op, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT)
            out.append(acc)
        return tuple(out)

    # Segment layout contract (see radix_topk_readout): each segment's
    # RESIDENT keys occupy a block_n-ALIGNED region [seg_off, seg_off +
    # pad(cap)) with the pad tail valid=False (w == 0 there; Mosaic needs
    # 128-aligned VMEM slice starts, so tail chunks cannot be clamped on
    # the resident side). The VALUE store stays unpadded: a tail chunk
    # DMA's only its `rem` real rows — the stale scratch rows beyond rem
    # multiply the pad tail's zero weights and contribute nothing.
    # zero both scratch slots once: a tail chunk's stale rows beyond `rem`
    # are multiplied by zero weights, which only nullifies FINITE stale
    # data — uninitialized VMEM could hold NaN bit patterns (0*NaN = NaN)
    v_scratch[...] = jnp.zeros(v_scratch.shape, v_scratch.dtype)

    accs = tuple(jnp.zeros((bp, cv), jnp.float32) for _ in range(o_dim))
    z = jnp.zeros((bp, 1), jnp.float32)
    for si, (seg_off, cap) in enumerate(seg_info):
        v_hbm = v_hbm_segs[si]
        nch = -(-cap // bn)          # ceil
        rem = cap - (nch - 1) * bn   # rows in the final (tail) chunk

        def v_copy_tail(slot):
            return pltpu.make_async_copy(
                v_hbm.at[:, pl.ds((nch - 1) * bn, rem), :],
                v_scratch.at[slot, :, pl.ds(0, rem), :], dma_sem.at[slot])

        (v_copy(v_hbm, 0, 0) if nch > 1 else v_copy_tail(0)).start()

        def p3(ci, carry):
            accs, z = carry
            slot = jax.lax.rem(ci, 2)

            @pl.when(ci + 1 < nch - 1)
            def _():
                v_copy(v_hbm, (ci + 1) * bn, 1 - slot).start()

            @pl.when(ci + 1 == nch - 1)
            def _():
                v_copy_tail(1 - slot).start()

            w = w_chunk(seg_off + ci * bn)
            z = z + jnp.sum(w, axis=1, keepdims=True)
            v_copy(v_hbm, ci * bn, slot).wait()
            return dot_acc(accs, w, slot), z

        if nch > 1:
            accs, z = jax.lax.fori_loop(0, nch - 1, p3, (accs, z))
        # final (tail) chunk: rem real rows, zero-weight pad columns
        slot = (nch - 1) % 2
        w = w_chunk(seg_off + (nch - 1) * bn)
        z = z + jnp.sum(w, axis=1, keepdims=True)
        v_copy_tail(slot).wait()
        accs = dot_acc(accs, w, slot)
    acc = jnp.concatenate(accs, axis=1)
    zsafe = jnp.maximum(z, 1e-30)
    out_ref[:] = acc / zsafe

    # ---- pass 4: usage = per-token column sum of normalized affinity
    qi = pl.program_id(0)

    def p4(ci, _):
        w = jax.lax.bitcast_convert_type(key_ref[:, pl.ds(ci * bn, bn)],
                                         jnp.float32)
        usage_ref[qi, pl.ds(ci * bn, bn)] = jnp.sum(w / zsafe, axis=0)
        return 0

    jax.lax.fori_loop(0, n_chunks, p4, 0)


def radix_topk_readout(mk: jnp.ndarray, ms: jnp.ndarray, valid: jnp.ndarray,
                       qk: jnp.ndarray, qe: jnp.ndarray, values,
                       top_k: int, *, block_p: int = 256, block_n: int = 512,
                       vmem_limit_bytes: int = 100 * 1024 * 1024,
                       value_dtype=jnp.float32, group_bits: int = 1,
                       interpret: bool = None
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused exact memory read for ONE batch row, radix-select variant.

    The winning property vs both the XLA chain and `fused_topk_readout`:
    the [BP, N] similarity block lives in VMEM for all four passes, so the
    O(N log^2 N) HBM-bound sort of lax.top_k becomes 32 VMEM-speed
    compare+count passes, and similarity is computed exactly once.

    mk [N, Ck], ms [N], valid [N] bool, qk/qe [P, Ck].
    values: ONE [O, N, Cv] array (N == the key count; padded like the keys)
      — or a TUPLE of per-segment [O, cap_s, Cv] arrays (perm|lt|work)
      whose caps sum to the UNPADDED key count; segments are then streamed
      in place with clamped tail chunks (each cap_s must be >= block_n) —
      no concat/pad/transpose of the value store materializes in XLA.
    Returns (readout [O, P, Cv] fp32, usage [N] fp32).
    N must divide by block_n and P by block_p. Pad tokens with valid=False;
    pad queries with qk=1e6, qe=1 (their similarity saturates ~-1e12, the
    masked exp underflows to 0, and they contribute nothing to usage).

    value_dtype=bfloat16 is the amp mode: the readout matmul runs bf16
    with fp32 accumulate (the reference runs its readout bmm under
    autocast — cutie.py:119-128); similarity, radix threshold, and softmax
    stay exact fp32 in both modes.
    """
    if interpret is None:
        # test hook: CUTIE_TPU_PALLAS_INTERPRET=1 runs the kernels in
        # interpret mode so the steps.py pallas integration is exercisable
        # on CPU suites (the round-5 segment-layout bug class only
        # manifested through steps.py's resident layout, invisible to the
        # kernel-level unit tests alone)
        import os
        interpret = os.environ.get("CUTIE_TPU_PALLAS_INTERPRET", "") == "1"
    n, ck = mk.shape
    p = qk.shape[0]
    if not isinstance(values, (tuple, list)):
        values = (values,)
    segs = tuple(values)
    o, _, cv = segs[0].shape
    caps = tuple(int(s.shape[1]) for s in segs)
    pads = tuple(-(-c // block_n) * block_n for c in caps)
    assert n == sum(pads), (n, caps, pads, block_n)  # see layout note below
    assert n % block_n == 0 and p % block_p == 0, (n, p, block_n, block_p)
    assert 32 % group_bits == 0, group_bits
    n_chunks = n // block_n
    grid = (p // block_p,)
    # Resident layout contract: segment s's keys/shrinkage/valid occupy the
    # block_n-ALIGNED region [offs[s], offs[s] + pads[s]) of mk/ms/valid,
    # with the pad tail valid=False (Mosaic needs aligned VMEM slices, so
    # tail chunks zero-weight their pad instead of clamping). usage comes
    # back in the SAME padded coordinates.
    offs = [0]
    for c in pads[:-1]:
        offs.append(offs[-1] + c)
    seg_info = tuple(zip(offs, caps))

    kernel = functools.partial(_radix_read_kernel, top_k=top_k, bn=block_n,
                               n_chunks=n_chunks, ck=ck, gbits=group_bits,
                               seg_info=seg_info, mm_dtype=value_dtype)
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
        ] + [pl.BlockSpec(memory_space=pltpu.HBM)  # values stay in HBM
             for _ in segs],
        out_specs=(
            pl.BlockSpec((block_p, o * cv), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((grid[0], n), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((p, o * cv), jnp.float32),
            jax.ShapeDtypeStruct((grid[0], n), jnp.float32),
        ),
        scratch_shapes=[
            # resident similarity as order keys (pass 1-2), then masked
            # weights bitcast in place (pass 3-4)
            pltpu.VMEM((block_p, n), jnp.uint32),
            # two slots: double-buffered per-object value stream (pass 3)
            pltpu.VMEM((2, o, block_n, cv), segs[0].dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_bytes),
        interpret=interpret,
    )(mk.astype(jnp.float32), ms.astype(jnp.float32)[None],
      valid.astype(jnp.float32)[None], qk.astype(jnp.float32),
      qe.astype(jnp.float32), *segs)

    readout = jnp.transpose(out.reshape(p, o, cv), (1, 0, 2))
    return readout, usage.sum(axis=0)


def fused_topk_readout(mk: jnp.ndarray, ms: jnp.ndarray, valid: jnp.ndarray,
                       qk: jnp.ndarray, qe: jnp.ndarray, values: jnp.ndarray,
                       top_k: int, *, block_p: int = 512, block_n: int = 1024,
                       vmem_limit_bytes: int = 64 * 1024 * 1024,
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
            pl.BlockSpec(memory_space=pltpu.HBM),  # values stay in HBM
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
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_bytes),
        interpret=interpret,
    )(mk.astype(jnp.float32), ms.astype(jnp.float32)[None],
      valid.astype(jnp.float32)[None], qk.astype(jnp.float32),
      qe.astype(jnp.float32), v2.astype(jnp.float32))

    readout = jnp.transpose(out.reshape(p, o, cv), (1, 0, 2))
    return readout, usage.sum(axis=0)
