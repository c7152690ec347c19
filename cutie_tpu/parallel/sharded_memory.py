"""Memory-token-axis sharded top-k read (multi-chip inference scaling).

The reference bounds memory by top-k attention + LT consolidation on one GPU
(cutie/model/utils/memory_utils.py:49-95); it has no multi-device read. On
TPU the natural scaling axis once long-term memory grows past one chip's HBM
is the memory-token axis N: shard keys/shrinkage/values over a `mem` mesh
axis and run an EXACT distributed top-k softmax readout:

  1. each shard computes its local similarity slice [B, P, N/D] and its
     local top-k values (any global top-k element is in its owning shard's
     local top-k, so the union of local top-k's contains the global top-k);
  2. one small all_gather of k values per query -> global k-th-largest
     threshold t and normalizer Z = sum(exp(global top-k));
  3. each shard forms its masked local affinity exp(sim)*[sim >= t]/Z and
     contracts against its local value slice; a psum over the mesh yields
     the replicated readout.

Communication per query pixel: k*D gathered scalars + the [B, O, P, Cv]
readout psum — independent of N, so the read scales to arbitrarily large
long-term memory at constant ICI traffic.

Tie caveat: if the k-th and (k+1)-th similarities are exactly equal, all
tied entries pass the threshold (affinity mass can exceed 1 by the tied
exp terms). The single-device `lax.top_k` breaks such ties arbitrarily;
float similarities make exact ties measure-zero in practice.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from cutie_tpu.ops.memory import NEG_INF, get_similarity


def make_mem_mesh(n_devices: Optional[int] = None, axis: str = "mem") -> Mesh:
    from cutie_tpu.parallel.mesh import make_mesh
    return make_mesh(n_devices, axis=axis)


def shard_memory(mesh: Mesh, mem_key, mem_shrink, values, valid,
                 axis: str = "mem"):
    """Device_put memory buffers with the token axis sharded.

    mem_key [B, N, Ck], mem_shrink [B, N], values [B, O, N, Cv],
    valid [B, N]; N must be divisible by the mesh size (MemoryState
    buffers grow in power-of-two chunks, so pick a chunk that is a
    multiple of the mesh).
    """
    n, d = mem_key.shape[1], mesh.shape[axis]
    if n % d != 0:
        raise ValueError(f"token axis {n} not divisible by mesh size {d}")
    kv = NamedSharding(mesh, P(None, axis, None))
    tok = NamedSharding(mesh, P(None, axis))
    val = NamedSharding(mesh, P(None, None, axis, None))
    return (jax.device_put(mem_key, kv), jax.device_put(mem_shrink, tok),
            jax.device_put(values, val), jax.device_put(valid, tok))


def _pad_axis_to(x: jnp.ndarray, axis: int, size: int,
                 fill: float = 0.0) -> jnp.ndarray:
    if x.shape[axis] == size:
        return x
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, size - x.shape[axis])
    return jnp.pad(x, pads, constant_values=fill)


def sharded_composite_readout(perm, lt, work, q_key, q_sel, top_k, mesh,
                              axis: str = "mem", lt_sharded: bool = False,
                              return_usage: bool = False, compute_dtype=None):
    """Exact top-k softmax readout over the [perm | lt | work] composite
    memory WITHOUT a global token concatenation (the concat of differently-
    sharded stores is what forced SPMD full rematerializations in r2 —
    MULTICHIP_r02.json tail).

    Each section is (key [B,N,Ck], shrink [B,N] or None, value [B,O,N,Cv],
    valid [B,N] bool). perm and work are REPLICATED (they are bounded:
    commits and the max_mem_frames ring) and every shard slices its own
    1/D chunk locally — zero communication. lt is the unbounded store: with
    lt_sharded=True its buffers arrive sharded on the token axis
    (NamedSharding P(None, axis, ...)) so long-term memory HBM scales with
    the mesh; otherwise it is replicated-and-sliced like the others.

    The distributed math matches `sharded_topk_readout` (local top-k ->
    gathered global threshold -> local contraction -> psum): ICI traffic is
    k*D gathered scalars + one [B,O,P,Cv] psum per call, independent of
    every section's token count.

    Returns (readout [B,O,P,Cv] replicated,
             lt_usage [B, Nl] (sharded on the token axis iff lt_sharded),
             work_usage [B, Nw] replicated) — usages None unless
    return_usage. Permanent tokens carry no usage (reference
    kv_memory_store.py:151-162 tracks work/LT only).
    """
    d = mesh.shape[axis]
    (pk, ps, pv, pvalid) = perm
    (lk, ls, lv, lvalid) = lt
    (wk, ws, wv, wvalid) = work
    b, _, ck = pk.shape
    o = pv.shape[1]
    np_, nl, nw = pk.shape[1], lk.shape[1], wk.shape[1]
    if lt_sharded and nl % d != 0:
        raise ValueError(f"lt token axis {nl} not divisible by mesh size {d}")
    cp, cw = -(-np_ // d), -(-nw // d)
    cl = nl // d if lt_sharded else -(-nl // d)
    has_qe = q_sel is not None

    def prep_rep(k_, s_, v_, valid_, chunk):
        """Pad a replicated section so every shard can slice `chunk` tokens."""
        size = chunk * d
        return (_pad_axis_to(k_, 1, size), _pad_axis_to(s_, 1, size),
                _pad_axis_to(v_, 2, size),
                _pad_axis_to(valid_, 1, size, fill=False))

    pk, ps, pv, pvalid = prep_rep(pk, ps, pv, pvalid, cp)
    wk, ws, wv, wvalid = prep_rep(wk, ws, wv, wvalid, cw)
    if not lt_sharded:
        lk, ls, lv, lvalid = prep_rep(lk, ls, lv, lvalid, cl)

    n_local = cp + cl + cw
    k = min(top_k, np_ + nl + nw)
    k_local = min(k, n_local)

    def local_read(pk, ps, pv, pvalid, lk, ls, lv, lvalid,
                   wk, ws, wv, wvalid, qk, qe):
        i = jax.lax.axis_index(axis)

        def chunk(x, ax, c):
            return jax.lax.dynamic_slice_in_dim(x, i * c, c, axis=ax)

        def local(sec_k, sec_s, sec_v, sec_valid, c, sharded):
            if sharded:
                return sec_k, sec_s, sec_v, sec_valid
            return (chunk(sec_k, 1, c), chunk(sec_s, 1, c),
                    chunk(sec_v, 2, c), chunk(sec_valid, 1, c))

        pk, ps, pv, pvalid = local(pk, ps, pv, pvalid, cp, False)
        lk, ls, lv, lvalid = local(lk, ls, lv, lvalid, cl, lt_sharded)
        wk, ws, wv, wvalid = local(wk, ws, wv, wvalid, cw, False)

        mk = jnp.concatenate([pk, lk, wk], axis=1)      # local, no comm
        ms = jnp.concatenate([ps, ls, ws], axis=1)
        vals = jnp.concatenate([pv, lv, wv], axis=2)
        vld = jnp.concatenate([pvalid, lvalid, wvalid], axis=1)

        sim = get_similarity(mk, ms, qk, qe if has_qe else None, vld)
        loc_vals = jax.lax.top_k(sim, k_local)[0]
        all_vals = jax.lax.all_gather(loc_vals, axis, axis=2, tiled=True)
        glob_vals = jax.lax.top_k(all_vals, k)[0]
        thresh = glob_vals[..., -1:]
        m = glob_vals[..., :1]
        live = sim > (NEG_INF / 2)
        z = jnp.sum(jnp.exp(glob_vals - m), axis=-1, keepdims=True)
        aff = jnp.where(live & (sim >= thresh), jnp.exp(sim - m), 0.0)
        aff = aff / jnp.maximum(z, 1e-30)
        if compute_dtype is not None:
            rd = jnp.einsum("bpn,bonc->bopc", aff.astype(compute_dtype),
                            vals.astype(compute_dtype),
                            preferred_element_type=jnp.float32)
        else:
            rd = jnp.einsum("bpn,bonc->bopc", aff, vals.astype(aff.dtype),
                            precision=jax.lax.Precision.HIGHEST)
        rd = jax.lax.psum(rd, axis)
        if return_usage:
            usage = aff.sum(axis=1)                     # [B, n_local]
            lt_usage = usage[:, cp:cp + cl]
            work_usage = usage[:, cp + cl:]
        else:
            lt_usage = work_usage = jnp.zeros((1, 1))
        return rd, lt_usage, work_usage

    rep = P()
    tok2 = P(None, axis)
    lt_k = P(None, axis, None) if lt_sharded else rep
    lt_s = tok2 if lt_sharded else rep
    lt_v = P(None, None, axis, None) if lt_sharded else rep
    in_specs = (rep, rep, rep, rep,                     # perm
                lt_k, lt_s, lt_v, lt_s,                 # lt
                rep, rep, rep, rep,                     # work
                rep, rep)                               # queries
    out_specs = (rep,
                 tok2 if return_usage else rep,
                 tok2 if return_usage else rep)

    try:  # jax >= 0.8 (check_vma) vs older shard_map (check_rep)
        fn = shard_map(local_read, mesh=mesh, in_specs=in_specs,
                       out_specs=out_specs, check_vma=False)
    except TypeError:
        fn = shard_map(local_read, mesh=mesh, in_specs=in_specs,
                       out_specs=out_specs, check_rep=False)
    dummy = jnp.zeros((1,))
    rd, lt_usage, work_usage = fn(pk, ps, pv, pvalid, lk, ls, lv, lvalid,
                                  wk, ws, wv, wvalid, q_key,
                                  q_sel if has_qe else dummy)
    if not return_usage:
        return rd, None, None
    # gathered-chunk order == padded token order; trim the slice padding.
    # The lt usage stays sharded when the buffers are (state.lt_use adds it
    # elementwise without any resharding).
    if not lt_sharded:
        lt_usage = lt_usage[:, :nl]
    work_usage = work_usage[:, :nw]
    return rd, lt_usage, work_usage


def sharded_topk_readout(mem_key: jnp.ndarray,
                         mem_shrink: Optional[jnp.ndarray],
                         q_key: jnp.ndarray,
                         q_sel: Optional[jnp.ndarray],
                         values: jnp.ndarray,
                         valid: Optional[jnp.ndarray],
                         top_k: int,
                         mesh: Mesh,
                         axis: str = "mem",
                         return_usage: bool = False,
                         compute_dtype=None
                         ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Exact top-k softmax readout with memory tokens sharded over `axis`.

    mem_key    [B, N, Ck]    sharded on N
    mem_shrink [B, N]        sharded on N (or None)
    q_key      [B, P, Ck]    replicated
    q_sel      [B, P, Ck]    replicated (or None)
    values     [B, O, N, Cv] sharded on N
    valid      [B, N]        sharded on N (or None)
    returns (readout [B, O, P, Cv] replicated,
             usage [B, N] sharded like the tokens, or None).

    Matches ops.memory.topk_softmax + readout up to fp reduction order
    (psum vs single einsum) and top-k tie-breaking.
    """
    n = mem_key.shape[1]
    d = mesh.shape[axis]
    if n % d != 0:
        raise ValueError(f"token axis {n} not divisible by mesh size {d}")
    k = min(top_k, n)
    k_local = min(k, n // d)
    has_ms = mem_shrink is not None
    has_qe = q_sel is not None
    has_valid = valid is not None

    def local_read(mk, ms, qk, qe, vals, vld):
        sim = get_similarity(mk, ms if has_ms else None, qk,
                             qe if has_qe else None,
                             vld if has_valid else None)
        loc_vals = jax.lax.top_k(sim, k_local)[0]           # [B, P, k_local]
        all_vals = jax.lax.all_gather(loc_vals, axis, axis=2, tiled=True)
        glob_vals = jax.lax.top_k(all_vals, k)[0]           # [B, P, k]
        thresh = glob_vals[..., -1:]                        # k-th largest
        # subtract the GLOBAL max (top-1, known on every shard after the
        # gather) before exponentiating: with q_sel the similarity is <= 0
        # by construction, but the qe-less form can be positive and a raw
        # exp would overflow to inf -> NaN affinities. The subtraction
        # cancels in the ratio, so results are unchanged where the raw
        # form was finite.
        m = glob_vals[..., :1]
        # all-tokens-invalid corner: every sim == NEG_INF makes m == thresh
        # == NEG_INF, so exp(sim - m) == 1 would average invalid values into
        # the readout. The dense/radix backends return exp(NEG_INF) == 0
        # there; mask masked tokens explicitly so the paths agree.
        live = sim > (NEG_INF / 2)
        z = jnp.sum(jnp.exp(glob_vals - m), axis=-1, keepdims=True)
        aff = jnp.where(live & (sim >= thresh), jnp.exp(sim - m), 0.0)
        aff = aff / jnp.maximum(z, 1e-30)                   # [B, P, N/D]
        if compute_dtype is not None:
            # amp: contraction in bf16 like the dense backend's readout
            # (ops/memory.readout compute_dtype; the reference's autocast)
            rd = jnp.einsum("bpn,bonc->bopc", aff.astype(compute_dtype),
                            vals.astype(compute_dtype),
                            preferred_element_type=jnp.float32)
        else:
            rd = jnp.einsum("bpn,bonc->bopc", aff, vals.astype(aff.dtype),
                            precision=jax.lax.Precision.HIGHEST)
        rd = jax.lax.psum(rd, axis)
        usage = aff.sum(axis=1) if return_usage else jnp.zeros((1,))
        return rd, usage

    rep = P()
    tok_spec = P(None, axis)
    in_specs = (P(None, axis, None),
                tok_spec if has_ms else rep,
                rep, rep,
                P(None, None, axis, None),
                tok_spec if has_valid else rep)
    out_specs = (rep, tok_spec if return_usage else rep)

    try:  # jax >= 0.8 (check_vma) vs older shard_map (check_rep)
        fn = shard_map(local_read, mesh=mesh, in_specs=in_specs,
                       out_specs=out_specs, check_vma=False)
    except TypeError:
        fn = shard_map(local_read, mesh=mesh, in_specs=in_specs,
                       out_specs=out_specs, check_rep=False)
    # shard_map needs concrete arrays everywhere; tiny dummies stand in for
    # the Nones and are ignored inside via the static has_* flags.
    dummy = jnp.zeros((1,))
    rd, usage = fn(mem_key,
                   mem_shrink if has_ms else dummy,
                   q_key,
                   q_sel if has_qe else dummy,
                   values,
                   valid if has_valid else dummy)
    return rd, (usage if return_usage else None)
