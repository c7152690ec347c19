"""Parity of the memory attention math (similarity / top-k softmax / readout)
against the reference memory_utils fixtures, plus masked-validity behavior
that has no reference equivalent (fixed-shape buffers)."""
import numpy as np

from tests.conftest import require_golden


def test_similarity_topk_readout_parity():
    from cutie_tpu.ops.memory import get_similarity, readout, topk_softmax

    rec = dict(np.load(require_golden("memory_math.npz")))
    # reference layout: mk [B,CK,N], qk/qe [B,CK,P], sim/aff [B,N,P], mv [B,CV,T,H,W]
    mk = np.transpose(rec["mk"], (0, 2, 1))
    ms = rec["ms"][:, 0, :]
    qk = np.transpose(rec["qk"], (0, 2, 1))
    qe = np.transpose(rec["qe"], (0, 2, 1))

    sim = get_similarity(mk, ms, qk, qe)  # [B,P,N]
    # fp32 reduction-order noise is amplified by the -a^2+2ab-b^2 cancellation
    np.testing.assert_allclose(np.asarray(sim), np.transpose(rec["sim"], (0, 2, 1)),
                               rtol=5e-3, atol=5e-2)

    aff, usage = topk_softmax(sim, top_k=30, return_usage=True)
    # entries at the top-k rank boundary can swap under fp32 noise in sim;
    # those carry ~1e-2 affinity mass at most
    np.testing.assert_allclose(np.asarray(aff), np.transpose(rec["aff"], (0, 2, 1)),
                               rtol=5e-3, atol=1e-2)
    np.testing.assert_allclose(np.asarray(usage), rec["usage"], rtol=5e-3, atol=3e-2)

    b, cv, t, h, w = rec["mv"].shape
    mv = np.transpose(rec["mv"].reshape(b, cv, t * h * w), (0, 2, 1))
    rd = readout(aff, mv)  # [B,P,CV]
    rd_ref = rec["rd"].reshape(b, cv, h * w)
    # rank-30 boundary swaps (see above) carry ~1e-2 affinity mass against
    # O(1) value magnitudes -> up to ~5e-2 absolute readout differences
    np.testing.assert_allclose(np.asarray(rd), np.transpose(rd_ref, (0, 2, 1)),
                               rtol=5e-3, atol=6e-2)


def test_validity_mask_equals_sliced():
    """A padded buffer with a validity mask must give the same affinity as
    computing only on the valid tokens."""
    from cutie_tpu.ops.memory import get_similarity, topk_softmax

    rng = np.random.default_rng(0)
    n_valid, n_total, p, ck = 50, 128, 16, 64
    mk = rng.normal(size=(1, n_total, ck)).astype(np.float32)
    ms = (rng.uniform(1, 3, size=(1, n_total))).astype(np.float32)
    qk = rng.normal(size=(1, p, ck)).astype(np.float32)
    qe = rng.uniform(size=(1, p, ck)).astype(np.float32)
    valid = np.zeros((1, n_total), bool)
    valid[:, :n_valid] = True

    sim_full = get_similarity(mk, ms, qk, qe, valid=np.asarray(valid))
    aff_full, usage_full = topk_softmax(sim_full, 30, return_usage=True)

    sim_sl = get_similarity(mk[:, :n_valid], ms[:, :n_valid], qk, qe)
    aff_sl, usage_sl = topk_softmax(sim_sl, 30, return_usage=True)

    np.testing.assert_allclose(np.asarray(aff_full)[:, :, :n_valid],
                               np.asarray(aff_sl), rtol=1e-5, atol=1e-6)
    assert np.abs(np.asarray(aff_full)[:, :, n_valid:]).max() == 0
    np.testing.assert_allclose(np.asarray(usage_full)[:, :n_valid],
                               np.asarray(usage_sl), rtol=1e-5, atol=1e-6)


def test_fewer_valid_than_topk():
    """When fewer valid tokens than k exist, affinity must still normalize to 1."""
    from cutie_tpu.ops.memory import get_similarity, topk_softmax

    rng = np.random.default_rng(1)
    mk = rng.normal(size=(1, 64, 16)).astype(np.float32)
    ms = np.ones((1, 64), np.float32)
    qk = rng.normal(size=(1, 8, 16)).astype(np.float32)
    valid = np.zeros((1, 64), bool)
    valid[:, :5] = True
    sim = get_similarity(mk, ms, qk, None, valid=np.asarray(valid))
    aff, _ = topk_softmax(sim, 30)
    np.testing.assert_allclose(np.asarray(aff).sum(-1), 1.0, rtol=1e-5)
    assert np.abs(np.asarray(aff)[:, :, 5:]).max() == 0


def test_radix_topk_matches_sort():
    """topk_softmax_radix must reproduce the sort-based affinity exactly
    (same selected tokens on tie-free data, same fp32 weights)."""
    from cutie_tpu.ops.memory import (get_similarity, topk_softmax,
                                      topk_softmax_radix,
                                      topk_threshold_radix)
    import jax

    rng = np.random.default_rng(2)
    for n, p, k in [(1024, 64, 30), (300, 33, 30), (20, 8, 30), (513, 17, 7)]:
        mk = rng.normal(size=(1, n, 64)).astype(np.float32)
        ms = rng.uniform(1, 3, size=(1, n)).astype(np.float32)
        qk = rng.normal(size=(1, p, 64)).astype(np.float32)
        qe = rng.uniform(size=(1, p, 64)).astype(np.float32)
        valid = np.zeros((1, n), bool)
        valid[:, :int(n * 0.7)] = True
        sim = get_similarity(mk, ms, qk, qe, valid=np.asarray(valid))

        kk = min(k, n)
        tau_ref = jax.lax.top_k(sim, kk)[0][..., -1:]
        tau = topk_threshold_radix(sim, kk)
        assert bool((tau == tau_ref).all()), "radix k-th value must be exact"

        aff_ref, use_ref = topk_softmax(sim, k, return_usage=True)
        aff, use = topk_softmax_radix(sim, k, return_usage=True)
        np.testing.assert_allclose(np.asarray(aff), np.asarray(aff_ref),
                                   rtol=1e-5, atol=1e-7)
        np.testing.assert_allclose(np.asarray(use), np.asarray(use_ref),
                                   rtol=1e-5, atol=1e-6)


def test_radix_topk_keeps_all_ties():
    """Documented deviation: at an exact fp32 tie of the k-th similarity the
    radix path keeps every tied token (sort keeps an arbitrary k)."""
    from cutie_tpu.ops.memory import topk_softmax_radix

    sim = np.full((1, 1, 8), -2.0, np.float32)
    sim[0, 0, :2] = -1.0  # two best, then six exact ties at the k-th value
    aff, _ = topk_softmax_radix(np.asarray(sim), 4)
    a = np.asarray(aff)[0, 0]
    assert (a > 0).sum() == 8  # 2 + all 6 ties kept
    np.testing.assert_allclose(a.sum(), 1.0, rtol=1e-6)


def test_compact_readout_matches_dense():
    """topk_readout_compact == topk_softmax + readout to fp32 tolerance."""
    from cutie_tpu.ops.memory import (get_similarity, readout, topk_softmax,
                                      topk_readout_compact)

    rng = np.random.default_rng(3)
    n, p, o, cv, k = 512, 40, 3, 64, 30
    mk = rng.normal(size=(1, n, 64)).astype(np.float32)
    ms = rng.uniform(1, 3, size=(1, n)).astype(np.float32)
    qk = rng.normal(size=(1, p, 64)).astype(np.float32)
    qe = rng.uniform(size=(1, p, 64)).astype(np.float32)
    vals = rng.normal(size=(1, o, n, cv)).astype(np.float32)
    valid = np.zeros((1, n), bool)
    valid[:, :400] = True
    sim = get_similarity(mk, ms, qk, qe, valid=np.asarray(valid))

    aff, use_ref = topk_softmax(sim, k, return_usage=True)
    rd_ref = readout(aff, np.asarray(vals))
    rd, use = topk_readout_compact(sim, np.asarray(vals), k, return_usage=True)
    np.testing.assert_allclose(np.asarray(rd), np.asarray(rd_ref),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(use), np.asarray(use_ref),
                               rtol=1e-4, atol=1e-5)


def test_auto_read_backend_policy(monkeypatch):
    """auto = dense on CPU (golden tie behavior), radix on accelerators,
    pallas only on real TPU past the (dtype-dependent) token threshold;
    explicit settings pass through untouched."""
    import jax
    import jax.numpy as jnp
    from cutie_tpu.inference import steps

    class M:
        def __init__(self, dtype):
            self.dtype = dtype

    class S:  # minimal stand-in for _pick_read_backend's attribute reads
        _pick = steps.StepFunctions._pick_read_backend

        def __init__(self, rb, dtype=jnp.float32):
            self.read_backend = rb
            self.model = M(dtype)

    def pick(rb, n, backend, dtype=jnp.float32):
        monkeypatch.setattr(jax, "default_backend", lambda: backend)
        return S._pick(S(rb, dtype), n)

    assert pick("auto", 512, "cpu") == "dense"
    assert pick("auto", 50000, "cpu") == "dense"
    assert pick("auto", 512, "tpu") == "dense"
    assert pick("auto", 4000, "tpu") == "radix"
    # fp32: the segmented kernel wins from d17 scale (~8.1k tokens) up
    assert pick("auto", 8108, "tpu") == "pallas"
    assert pick("auto", 27948, "tpu") == "pallas"
    # bf16 (amp): radix keeps d17 scale, kernel takes over at LT scale
    assert pick("auto", 8108, "tpu", jnp.bfloat16) == "radix"
    assert pick("auto", 27948, "tpu", jnp.bfloat16) == "pallas"
    assert pick("auto", 27948, "gpu") == "radix"  # Mosaic kernel: TPU only
    assert pick("pallas", 64, "cpu") == "pallas"  # explicit wins
    assert pick("dense", 50000, "tpu") == "dense"
