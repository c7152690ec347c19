"""Fused Pallas memory-read kernel vs the XLA reference chain (interpret
mode on CPU; the same comparison passes compiled on a real v5e chip)."""
import numpy as np


def test_fused_topk_readout_matches_xla():
    import jax
    import jax.numpy as jnp

    from cutie_tpu.ops.memory import get_similarity, readout, topk_softmax
    from cutie_tpu.ops.pallas_kernels import fused_topk_readout

    rng = np.random.default_rng(0)
    n, p, o, ck, cv, k = 1024, 256, 3, 64, 128, 30
    mk = rng.normal(size=(n, ck)).astype(np.float32)
    ms = rng.uniform(1, 3, size=(n,)).astype(np.float32)
    valid = np.zeros((n,), bool)
    valid[:700] = True
    qk = rng.normal(size=(p, ck)).astype(np.float32)
    qe = rng.uniform(size=(p, ck)).astype(np.float32)
    vals = rng.normal(size=(o, n, cv)).astype(np.float32)

    rd, usage = fused_topk_readout(
        jnp.asarray(mk), jnp.asarray(ms), jnp.asarray(valid), jnp.asarray(qk),
        jnp.asarray(qe), jnp.asarray(vals), k, block_p=128, block_n=256,
        interpret=True)

    sim = get_similarity(mk[None], ms[None], qk[None], qe[None],
                         valid=jnp.asarray(valid)[None])
    aff, use_ref = topk_softmax(sim, k, return_usage=True)
    rd_ref = readout(aff, jnp.asarray(vals)[None])[0]
    np.testing.assert_allclose(np.asarray(rd), np.asarray(rd_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(usage), np.asarray(use_ref[0]),
                               rtol=1e-5, atol=1e-5)


def test_fused_topk_fewer_valid_than_k():
    import jax.numpy as jnp

    from cutie_tpu.ops.pallas_kernels import fused_topk_readout

    rng = np.random.default_rng(1)
    n, p, o, ck, cv = 256, 128, 1, 64, 128
    mk = rng.normal(size=(n, ck)).astype(np.float32)
    ms = np.ones((n,), np.float32)
    valid = np.zeros((n,), bool)
    valid[:5] = True  # fewer valid tokens than k=30
    qk = rng.normal(size=(p, ck)).astype(np.float32)
    qe = rng.uniform(size=(p, ck)).astype(np.float32)
    vals = rng.normal(size=(o, n, cv)).astype(np.float32)

    rd, usage = fused_topk_readout(
        jnp.asarray(mk), jnp.asarray(ms), jnp.asarray(valid), jnp.asarray(qk),
        jnp.asarray(qe), jnp.asarray(vals), 30, block_p=128, block_n=256,
        interpret=True)
    assert np.all(np.isfinite(np.asarray(rd)))
    # affinity mass sums to p over the 5 valid tokens
    np.testing.assert_allclose(np.asarray(usage).sum(), p, rtol=1e-4)
    assert np.abs(np.asarray(usage)[5:]).max() == 0


def test_radix_topk_readout_matches_xla():
    """VMEM-resident radix-select kernel vs the XLA chain (interpret mode;
    the same comparison passes compiled on a real v5e — tools/bench_pallas)."""
    import jax.numpy as jnp

    from cutie_tpu.ops.memory import get_similarity, readout, topk_softmax
    from cutie_tpu.ops.pallas_kernels import radix_topk_readout

    rng = np.random.default_rng(2)
    n, p, o, ck, cv, k = 1024, 256, 3, 64, 128, 30
    mk = rng.normal(size=(n, ck)).astype(np.float32)
    ms = rng.uniform(1, 3, size=(n,)).astype(np.float32)
    valid = np.zeros((n,), bool)
    valid[:700] = True
    qk = rng.normal(size=(p, ck)).astype(np.float32)
    qe = rng.uniform(size=(p, ck)).astype(np.float32)
    vals = rng.normal(size=(o, n, cv)).astype(np.float32)

    rd, usage = radix_topk_readout(
        jnp.asarray(mk), jnp.asarray(ms), jnp.asarray(valid), jnp.asarray(qk),
        jnp.asarray(qe), jnp.asarray(vals), k, block_p=128, block_n=256,
        interpret=True)

    sim = get_similarity(mk[None], ms[None], qk[None], qe[None],
                         valid=jnp.asarray(valid)[None])
    aff, use_ref = topk_softmax(sim, k, return_usage=True)
    rd_ref = readout(aff, jnp.asarray(vals)[None])[0]
    # fp32 mode reads out via a manual two-part bf16 split (3 MXU passes):
    # each operand carries ~2^-17 representation error from rounding its
    # bf16 residual, so the contraction is good to ~3e-5 relative — half
    # the passes of a HIGHEST fp32 dot, measured 16% faster at LT scale
    # (tools/probe_radix_variants.py).
    np.testing.assert_allclose(np.asarray(rd), np.asarray(rd_ref),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(usage), np.asarray(use_ref[0]),
                               rtol=1e-5, atol=1e-5)


def test_radix_topk_readout_padded_queries():
    """qk=1e6/qe=1 padded query rows must not disturb readout or usage."""
    import jax.numpy as jnp

    from cutie_tpu.ops.memory import get_similarity, readout, topk_softmax
    from cutie_tpu.ops.pallas_kernels import radix_topk_readout

    rng = np.random.default_rng(3)
    n, p, o, ck, cv, k = 512, 96, 2, 64, 64, 30
    mk = rng.normal(size=(n, ck)).astype(np.float32)
    ms = rng.uniform(1, 3, size=(n,)).astype(np.float32)
    valid = np.ones((n,), bool)
    qk = rng.normal(size=(p, ck)).astype(np.float32)
    qe = rng.uniform(size=(p, ck)).astype(np.float32)
    vals = rng.normal(size=(o, n, cv)).astype(np.float32)

    qk_pad = np.concatenate([qk, np.full((32, ck), 1e6, np.float32)])
    qe_pad = np.concatenate([qe, np.ones((32, ck), np.float32)])
    rd, usage = radix_topk_readout(
        jnp.asarray(mk), jnp.asarray(ms), jnp.asarray(valid),
        jnp.asarray(qk_pad), jnp.asarray(qe_pad), jnp.asarray(vals), k,
        block_p=128, block_n=256, interpret=True)

    sim = get_similarity(mk[None], ms[None], qk[None], qe[None],
                         valid=jnp.asarray(valid)[None])
    aff, use_ref = topk_softmax(sim, k, return_usage=True)
    rd_ref = readout(aff, jnp.asarray(vals)[None])[0]
    np.testing.assert_allclose(np.asarray(rd)[:, :p], np.asarray(rd_ref),
                               rtol=1e-4, atol=1e-5)  # bf16x3 readout, above
    np.testing.assert_allclose(np.asarray(usage), np.asarray(use_ref[0]),
                               rtol=1e-5, atol=1e-5)


def test_radix_topk_readout_bf16_values():
    """amp variant: bf16 value streaming + bf16 readout matmul must match the
    XLA chain computed on bf16-rounded values to bf16 tolerance (top-k
    boundary and softmax stay fp32-exact, so the SELECTED token set is
    identical — only the value contraction is rounded)."""
    import jax.numpy as jnp

    from cutie_tpu.ops.memory import get_similarity, readout, topk_softmax
    from cutie_tpu.ops.pallas_kernels import radix_topk_readout

    rng = np.random.default_rng(4)
    n, p, o, ck, cv, k = 1024, 256, 3, 64, 128, 30
    mk = rng.normal(size=(n, ck)).astype(np.float32)
    ms = rng.uniform(1, 3, size=(n,)).astype(np.float32)
    valid = np.zeros((n,), bool)
    valid[:900] = True
    qk = rng.normal(size=(p, ck)).astype(np.float32)
    qe = rng.uniform(size=(p, ck)).astype(np.float32)
    vals = rng.normal(size=(o, n, cv)).astype(np.float32)

    rd, usage = radix_topk_readout(
        jnp.asarray(mk), jnp.asarray(ms), jnp.asarray(valid), jnp.asarray(qk),
        jnp.asarray(qe), jnp.asarray(vals), k, block_p=128, block_n=256,
        value_dtype=jnp.bfloat16, interpret=True)

    sim = get_similarity(mk[None], ms[None], qk[None], qe[None],
                         valid=jnp.asarray(valid)[None])
    aff, use_ref = topk_softmax(sim, k, return_usage=True)
    vals_bf = jnp.asarray(vals).astype(jnp.bfloat16).astype(jnp.float32)
    rd_ref = readout(aff, vals_bf[None])[0]
    # usage doesn't touch the values: stays fp32-exact
    np.testing.assert_allclose(np.asarray(usage), np.asarray(use_ref[0]),
                               rtol=1e-5, atol=1e-5)
    # readout: bf16 contraction tolerance
    np.testing.assert_allclose(np.asarray(rd), np.asarray(rd_ref),
                               rtol=2e-2, atol=2e-2)


def test_radix_topk_readout_multi_segment():
    """Per-segment value streaming (perm|lt|work in place): the resident
    keys live in block_n-ALIGNED per-segment regions (tails valid=False);
    value caps need not be block_n multiples — tail chunks DMA only their
    real rows (caps must be 8-aligned like the production state buffers).
    Must match the XLA chain on the equivalent flat layout."""
    import jax.numpy as jnp

    from cutie_tpu.ops.memory import get_similarity, readout, topk_softmax
    from cutie_tpu.ops.pallas_kernels import radix_topk_readout

    rng = np.random.default_rng(5)
    caps = (296, 424, 560)  # 8-aligned, none a block_n multiple, all >= bn
    bn = 256
    pads = tuple(-(-c // bn) * bn for c in caps)  # 512, 512, 768
    n = sum(pads)
    p, o, ck, cv, k = 128, 2, 64, 64, 30

    # per-segment real data + padded resident layout
    seg_keys, seg_ms, seg_valid, seg_vals = [], [], [], []
    mk = np.zeros((n, ck), np.float32)
    ms = np.ones((n,), np.float32)
    valid = np.zeros((n,), bool)
    off = 0
    for c, pd in zip(caps, pads):
        kk = rng.normal(size=(c, ck)).astype(np.float32)
        sh = rng.uniform(1, 3, size=(c,)).astype(np.float32)
        vl = np.ones((c,), bool)
        vv = rng.normal(size=(o, c, cv)).astype(np.float32)
        mk[off:off + c] = kk
        ms[off:off + c] = sh
        valid[off:off + c] = vl
        seg_vals.append(jnp.asarray(vv))
        seg_keys.append(kk); seg_ms.append(sh); seg_valid.append(vl)
        off += pd
    valid[10:40] = False  # a hole inside the first segment

    qk = rng.normal(size=(p, ck)).astype(np.float32)
    qe = rng.uniform(size=(p, ck)).astype(np.float32)

    rd_seg, use_seg = radix_topk_readout(
        jnp.asarray(mk), jnp.asarray(ms), jnp.asarray(valid), jnp.asarray(qk),
        jnp.asarray(qe), tuple(seg_vals), k, block_p=128, block_n=bn,
        interpret=True)

    # XLA reference on the SAME padded-resident layout (pad tokens invalid,
    # pad value rows zero — they never enter the top-k)
    vals_flat = np.zeros((o, n, cv), np.float32)
    off = 0
    for (c, pd), vv in zip(zip(caps, pads), seg_vals):
        vals_flat[:, off:off + c] = np.asarray(vv)
        off += pd
    sim = get_similarity(mk[None], ms[None], qk[None], qe[None],
                         valid=jnp.asarray(valid)[None])
    aff, use_ref = topk_softmax(sim, k, return_usage=True)
    rd_ref = readout(aff, jnp.asarray(vals_flat)[None])[0]
    np.testing.assert_allclose(np.asarray(rd_seg), np.asarray(rd_ref),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(use_seg), np.asarray(use_ref[0]),
                               rtol=1e-5, atol=1e-5)
