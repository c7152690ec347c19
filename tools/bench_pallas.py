"""Memory-read backend comparison at long-term-memory scale (VERDICT r1 #10).

Compares, on the real chip, the four exact top-k read backends at LT token
counts (long_term.max_num_tokens=10000 + buffer + work + permanent ~ 20-30k
tokens) with 480p queries (P = 30*54 = 1620, padded to the kernel block):

  dense   — get_similarity + lax.top_k (bitonic sort) + scatter + bmm
  compact — same top_k, but readout contracts only the k gathered rows
  radix   — exact k-th-value via 32-step radix select (no sort), pure XLA
  pallas  — radix select with the [block_p, N] similarity VMEM-resident
            (ops/pallas_kernels.py:radix_topk_readout)

Timing: per-read cost from a lax.scan of chained reads inside ONE jit
(each read's queries depend on the previous readout), best of several
whole-scan runs — per-dispatch tunnel latency never enters the number.

These standalone numbers agree with the honest in-graph measurements
(tools/bench_read_backend.py: the sort is ~half the fused frame at N=8k),
which is why 'auto' selects radix on accelerators. An earlier conclusion
that "in-graph dense is fastest at 1.7 ms/frame" was a timing artifact —
jax.block_until_ready does not wait for remote execution over the dev
tunnel; see .claude/skills/verify/SKILL.md.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/cutie_tpu_jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from cutie_tpu.ops.memory import (get_similarity, readout,
                                  topk_readout_compact, topk_softmax,
                                  topk_softmax_radix)
from cutie_tpu.ops.pallas_kernels import radix_topk_readout


def make_scanned(read_fn, qk, iters):
    """Chain `iters` reads inside one jit: each iteration's query key
    depends on the previous readout, which serializes the reads, defeats
    CSE, and amortizes per-dispatch tunnel latency to zero."""

    def body(q, _):
        rd, usage = read_fn(q)
        q_next = q + 1e-30 * rd.sum()
        return q_next, (rd.sum(), usage.sum())

    def run():
        _, (rds, _) = jax.lax.scan(body, qk, None, length=iters)
        return rds

    return jax.jit(run)


def timeit_scan(read_fn, qk, iters=20, reps=5):
    """Compute-only per-read time (min over reps: tunnel weather only adds
    latency, never removes it)."""
    fn = make_scanned(read_fn, qk, iters)
    np.asarray(fn()[:1])  # forced fetch: block_until_ready can return early
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn()[:1])
        best = min(best, time.perf_counter() - t0)
    return best / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=20480, help="memory tokens")
    ap.add_argument("--p", type=int, default=1792,
                    help="query pixels (1620 = 480p; padded internally)")
    ap.add_argument("--objects", type=int, default=3)
    ap.add_argument("--cv", type=int, default=256)
    ap.add_argument("--topk", type=int, default=30)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    n, p, o, cv, ck = args.n, args.p, args.objects, args.cv, 64
    mk = jnp.asarray(rng.standard_normal((n, ck)), jnp.float32)
    ms = jnp.asarray(rng.uniform(1, 2, (n,)), jnp.float32)
    qk = jnp.asarray(rng.standard_normal((p, ck)), jnp.float32)
    qe = jnp.asarray(rng.uniform(0, 1, (p, ck)), jnp.float32)
    values = jnp.asarray(rng.standard_normal((o, n, cv)) * 0.1, jnp.float32)
    valid = jnp.ones((n,), bool)

    sim_f = lambda q: get_similarity(mk[None], ms[None], q[None], qe[None],
                                     valid[None])

    def dense(q):
        aff, usage = topk_softmax(sim_f(q), args.topk, return_usage=True)
        return readout(aff, values[None]), usage

    def compact(q):
        return topk_readout_compact(sim_f(q), values[None], args.topk,
                                    return_usage=True)

    def radix(q):
        aff, usage = topk_softmax_radix(sim_f(q), args.topk,
                                        return_usage=True)
        return readout(aff, values[None]), usage

    bp = 256
    pad = (-p) % bp
    qe_pad = jnp.pad(qe, ((0, pad), (0, 0)), constant_values=1.0)

    def pallas(q):
        rd, usage = radix_topk_readout(
            mk, ms, valid, jnp.pad(q, ((0, pad), (0, 0)),
                                   constant_values=1e6),
            qe_pad, values, args.topk, block_p=bp, block_n=512)
        return rd[None, :, :p], usage[None]

    print(f"N={n} P={p} O={o} Cv={cv} k={args.topk}", flush=True)
    rd_ref, us_ref = jax.device_get(jax.jit(dense)(qk))
    results = {}
    for name, fn in [("dense", dense), ("compact", compact),
                     ("radix", radix), ("pallas", pallas)]:
        rd, us = jax.device_get(jax.jit(fn)(qk))
        dd = np.abs(np.asarray(rd).reshape(-1, cv)
                    - np.asarray(rd_ref).reshape(-1, cv)).max()
        du = np.abs(np.asarray(us) - np.asarray(us_ref)).max()
        t = timeit_scan(fn, qk)
        results[name] = t
        speed = results["dense"] / t
        print(f"{name:8s} {t * 1000:8.3f} ms  ({speed:5.2f}x vs dense)  "
              f"|rd| {dd:.2e}  |usage| {du:.2e}", flush=True)
    aff_bytes = 4 * p * n
    print(f"[dense materializes a {aff_bytes / 1e6:.0f} MB affinity per "
          f"read; the sort is the dominant cost]", flush=True)


if __name__ == "__main__":
    main()
