"""Component probe for the fused radix read at LT scale (round 4).

Times radix_topk_readout variants on the real chip to attribute the
8.3 ms/frame LT fp32 read (round-4 LT trace) to its phases:
  - fp32 bp=256 (production today)
  - fp32 bp=512 (fewer value-stream passes; keys scratch 57.7MB)
  - fp32 values, HIGH readout dot (3-pass bf16x3 instead of 6-pass HIGHEST)
  - bf16 value streaming (the amp mode, for scale)
  - top_k phases isolated: a kernel run with top_k so large the mask is
    all-ones isolates select cost vs readout cost? (no — run with n tiny)
Timing: chained lax.scan reads inside one jit (tunnel-latency-proof),
min over reps.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/cutie_tpu_jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from cutie_tpu.ops.pallas_kernels import radix_topk_readout

N, P, O, CV, CK, K = 28160, 1792, 4, 256, 64, 30


def timeit(fn, qk, iters=10, reps=4):
    def body(q, _):
        rd, usage = fn(q)
        return q + 1e-30 * rd.sum(), rd.sum()

    @jax.jit
    def run():
        _, s = jax.lax.scan(body, qk, None, length=iters)
        return s

    np.asarray(run()[:1])
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(run()[:1])
        best = min(best, time.perf_counter() - t0)
    return best / iters * 1e3


def main():
    rng = np.random.default_rng(0)
    mk = jnp.asarray(rng.standard_normal((N, CK)), jnp.float32)
    ms = jnp.asarray(rng.uniform(1, 2, (N,)), jnp.float32)
    qk = jnp.asarray(rng.standard_normal((P, CK)), jnp.float32)
    qe = jnp.asarray(rng.uniform(0, 1, (P, CK)), jnp.float32)
    vals = jnp.asarray(rng.standard_normal((O, N, CV)) * 0.1, jnp.float32)
    valid = jnp.ones((N,), bool)

    def mk_fn(bp, vdt, **kw):
        def f(q):
            # pad queries to the block like inference/steps.py does
            # (qk=1e6/qe=1 saturates similarity; contributes nothing)
            pp = -(-P // bp) * bp
            qp = jnp.pad(q, ((0, pp - P), (0, 0)), constant_values=1e6)
            qep = jnp.pad(qe, ((0, pp - P), (0, 0)), constant_values=1.0)
            r, u = radix_topk_readout(mk, ms, valid, qp, qep, vals, K,
                                      block_p=bp, block_n=512,
                                      value_dtype=vdt, **kw)
            return r[:, :P], u
        return f

    for name, fn in [
        ("fp32 g=1 bf16x3", mk_fn(256, jnp.float32, group_bits=1)),
        ("fp32 g=2 bf16x3", mk_fn(256, jnp.float32, group_bits=2)),
        ("fp32 g=1 bp=512", mk_fn(512, jnp.float32, group_bits=1)),
        ("bf16 g=1", mk_fn(256, jnp.bfloat16, group_bits=1)),
        ("bf16 g=1 bp=512", mk_fn(512, jnp.bfloat16, group_bits=1)),
    ]:
        try:
            t = timeit(fn, qk)
            print(f"{name:24s} {t:7.2f} ms/read")
        except Exception as e:  # VMEM OOM etc
            print(f"{name:24s} FAILED: {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
