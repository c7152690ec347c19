"""Compiled-on-TPU correctness check of the segmented pallas read.

The interpret-mode unit tests pin the semantics; this pins the MOSAIC
LOWERING at production LT sizes (segment tails, DMA alignment, double
buffering): segmented radix_topk_readout vs the XLA dense chain on the
same padded-resident layout. Run after any kernel change, before bench.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/cutie_tpu_jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def main():
    from cutie_tpu.ops.memory import get_similarity, readout, topk_softmax
    from cutie_tpu.ops.pallas_kernels import radix_topk_readout

    rng = np.random.default_rng(0)
    # production-like lvos caps: perm 1624, lt 12000, work 9*1620 -> 14584
    caps = (1624, 12000, 14584)
    bn = 512
    pads = tuple(-(-c // bn) * bn for c in caps)
    n = sum(pads)
    p, o, ck, cv, k = 1792, 4, 64, 256, 30

    mk = np.zeros((n, ck), np.float32)
    ms = np.ones((n,), np.float32)
    valid = np.zeros((n,), bool)
    segs = []
    vals_flat = np.zeros((o, n, cv), np.float32)
    off = 0
    for c, pd in zip(caps, pads):
        mk[off:off + c] = rng.normal(size=(c, ck)) * 0.3
        ms[off:off + c] = rng.uniform(1, 3, size=(c,))
        valid[off:off + c] = rng.uniform(size=(c,)) > 0.1
        vv = (rng.normal(size=(o, c, cv)) * 0.1).astype(np.float32)
        segs.append(jnp.asarray(vv))
        vals_flat[:, off:off + c] = vv
        off += pd
    qk = (rng.normal(size=(p, ck)) * 0.3).astype(np.float32)
    qe = rng.uniform(size=(p, ck)).astype(np.float32)

    rd, usage = jax.jit(lambda *a: radix_topk_readout(
        *a, top_k=k, block_p=256, block_n=bn))(
        jnp.asarray(mk), jnp.asarray(ms), jnp.asarray(valid),
        jnp.asarray(qk), jnp.asarray(qe), tuple(segs))
    rd, usage = np.asarray(rd), np.asarray(usage)

    with jax.default_matmul_precision("highest"):
        sim = get_similarity(jnp.asarray(mk)[None], jnp.asarray(ms)[None],
                             jnp.asarray(qk)[None], jnp.asarray(qe)[None],
                             valid=jnp.asarray(valid)[None])
        aff, use_ref = topk_softmax(sim, k, return_usage=True)
        rd_ref = np.asarray(readout(aff, jnp.asarray(vals_flat)[None])[0])
        use_ref = np.asarray(use_ref[0])

    e_rd = np.abs(rd - rd_ref).max() / max(np.abs(rd_ref).max(), 1e-9)
    e_us = np.abs(usage - use_ref).max() / max(np.abs(use_ref).max(), 1e-9)
    print(f"readout rel err {e_rd:.2e}   usage rel err {e_us:.2e}")
    ok = e_rd < 5e-4 and e_us < 1e-3
    print("OK" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
