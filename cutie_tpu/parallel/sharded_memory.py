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
