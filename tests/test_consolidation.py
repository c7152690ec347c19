"""Long-term consolidation/eviction unit tests on crafted states.

Covers the round-2 review findings: LT eviction must compact
lt_obj_valid with the same usage-ranked permutation as the token
buffers, and per-object potentiation must not dilute a late-added
object's prototypes with the zero value rows of frames predating it.
"""
import numpy as np
import pytest


def _make_steps_and_state(lt_capacity=16, work_frames=4, h=2, w=2, o=2):
    import jax.numpy as jnp

    from cutie_tpu.config import eval_config
    from cutie_tpu.inference.state import init_state
    from cutie_tpu.inference.steps import StepFunctions
    from cutie_tpu.models import CUTIE

    cfg = eval_config("small")
    cfg.merge({
        "use_long_term": True,
        "long_term": {"count_usage": True, "max_mem_frames": 4,
                      "min_mem_frames": 2, "num_prototypes": 2,
                      "max_num_tokens": lt_capacity - 2, "buffer_tokens": 2},
    })
    model = CUTIE(cfg)
    steps = StepFunctions(model, cfg)  # consolidate never touches variables

    mc = cfg.model
    state = init_state(
        batch=1, max_objects=o, h=h, w=w, sensory_dim=mc.sensory_dim,
        key_dim=mc.key_dim, value_dim=mc.value_dim,
        num_queries=mc.object_transformer.num_queries,
        embed_dim=mc.object_transformer.embed_dim,
        perm_frames=1, work_frames=work_frames, lt_capacity=lt_capacity)

    rng = np.random.default_rng(0)
    hw = h * w
    ck, cv = mc.key_dim, mc.value_dim
    state = state.replace(
        work_key=jnp.asarray(rng.normal(size=(1, work_frames, hw, ck)),
                             jnp.float32),
        work_shrink=jnp.asarray(rng.uniform(1, 2, (1, work_frames, hw)),
                                jnp.float32),
        work_sel=jnp.asarray(rng.uniform(0, 1, (1, work_frames, hw, ck)),
                             jnp.float32),
        work_value=jnp.asarray(rng.normal(size=(1, o, work_frames, hw, cv)),
                               jnp.float32),
        work_use=jnp.asarray(rng.uniform(0, 5, (1, work_frames, hw)),
                             jnp.float32),
        work_life=jnp.ones((1, work_frames, hw), jnp.float32),
    )
    return steps, state, cfg


def test_lt_eviction_compacts_obj_valid():
    """Usage-ranked eviction reorders LT tokens; the per-object validity
    must follow the SAME permutation (review finding: it previously kept
    the pre-eviction layout, masking survivors with other tokens' bits)."""
    import jax.numpy as jnp

    steps, state, cfg = _make_steps_and_state()
    lcap = state.lt_key.shape[1]
    n_lt = 6
    rng = np.random.default_rng(1)

    # distinct usage ranking + a validity pattern that differs per token
    lt_use = np.zeros((1, lcap), np.float32)
    lt_use[0, :n_lt] = [5.0, 1.0, 4.0, 2.0, 6.0, 3.0]
    ov = np.zeros((2, lcap), bool)
    ov[0, :n_lt] = [True, False, True, False, True, False]
    ov[1, :n_lt] = [False, True, False, True, False, True]
    state = state.replace(
        lt_key=jnp.asarray(rng.normal(size=state.lt_key.shape), jnp.float32),
        lt_use=jnp.asarray(lt_use),
        lt_life=jnp.ones((1, lcap), jnp.float32),
        lt_obj_valid=jnp.asarray(ov),
        lt_count=jnp.asarray(n_lt, jnp.int32),
        work_obj_valid=jnp.ones_like(state.work_obj_valid),
        work_count=jnp.asarray(4, jnp.int32),
    )

    lt_keep = 3
    old_key = np.asarray(state.lt_key[0])
    new_state = steps.consolidate(None, state, n_candidate_frames=2,
                                  lt_keep=lt_keep)

    # usage ranking keeps tokens 4, 0, 2 (usage 6, 5, 4) in that order
    keep = [4, 0, 2]
    np.testing.assert_allclose(np.asarray(new_state.lt_key[0, :lt_keep]),
                               old_key[keep], rtol=1e-6)
    got_ov = np.asarray(new_state.lt_obj_valid[:, :lt_keep])
    np.testing.assert_array_equal(got_ov, ov[:, keep])


def test_consolidation_per_object_candidate_masking():
    """A late-added object's prototypes must be potentiated only from ITS
    frames — zero value rows of earlier frames must not dilute them
    (review finding; the reference consolidates per bucket)."""
    import jax.numpy as jnp

    steps, state, cfg = _make_steps_and_state()
    # object 0 present in all 4 work frames; object 1 only from frame 2 on;
    # object 1's value rows for frames 0-1 are zeros (as written by insert)
    wov = np.zeros((2, 4), bool)
    wov[0, :] = True
    wov[1, 2:] = True
    wv = np.array(state.work_value)
    wv[:, 1, :2] = 0.0
    state = state.replace(
        work_obj_valid=jnp.asarray(wov),
        work_value=jnp.asarray(wv),
        work_count=jnp.asarray(4, jnp.int32),
    )

    new_state = steps.consolidate(None, state, n_candidate_frames=2,
                                  lt_keep=None)
    protos = np.asarray(new_state.lt_value[0, :, :2])  # [O, P, Cv]

    # object 1 had NO valid candidate frames (candidates are the oldest 2):
    # its prototypes must be exactly zero (not an average over zeros and
    # the softmax mass of other frames) and marked invalid
    np.testing.assert_array_equal(protos[1], 0.0)
    ov = np.asarray(new_state.lt_obj_valid)
    assert not ov[1, :2].any()
    assert ov[0, :2].all()
    # object 0's prototypes are real values
    assert np.abs(protos[0]).max() > 0


def test_update_config_grows_long_term_capacity():
    """Raising long_term.max_num_tokens at runtime must reallocate the LT
    buffers (review finding: capacity was fixed at construction, so appends
    silently overwrote the newest prototypes)."""
    from tests.test_inference_stream import _build_core

    from tests.conftest import require_golden

    core = _build_core(use_long_term=True)
    rec = dict(np.load(require_golden("stream_small_work.npz")))
    frames, mask0 = rec["frames"], rec["mask0"]
    core.step(frames[0], mask0, objects=[1, 2])
    for ti in range(1, 6):
        core.step(frames[ti])
    old_cap = core.state.lt_key.shape[1]

    cfg = core.cfg.copy()
    cfg["long_term"]["max_num_tokens"] = 512  # up from 256
    core.update_config(cfg)
    assert core.lt_capacity == 512 + core.num_prototypes
    assert core.state.lt_key.shape[1] == core.lt_capacity > old_cap
    assert core.state.lt_obj_valid.shape[1] == core.lt_capacity

    # stream continues fine at the new capacity
    for ti in range(6, min(10, frames.shape[0])):
        prob = core.step(frames[ti])
    assert np.isfinite(np.asarray(prob)).all()


def test_ring_shrink_consolidates_before_wrap():
    """Shrinking the LT-mode work ring to (or below) its live count must
    consolidate immediately — otherwise the next memorize FIFO-overwrites
    an unconsolidated frame (review finding)."""
    from tests.conftest import require_golden
    from tests.test_inference_stream import _build_core

    core = _build_core(use_long_term=True)
    rec = dict(np.load(require_golden("stream_small_work.npz")))
    frames, mask0 = rec["frames"], rec["mask0"]
    core.step(frames[0], mask0, objects=[1, 2])
    for ti in range(1, 8):
        core.step(frames[ti])
    assert core._work_count >= 2

    cfg = core.cfg.copy()
    # shrink: max_mem_frames 4 -> 3 (ring 5 -> 4); min stays 2
    cfg["long_term"]["max_mem_frames"] = 3
    core.update_config(cfg)
    assert core._work_count < core.ring_frames, (
        core._work_count, core.ring_frames)


def test_early_return_frees_features_and_matches_resolution():
    """step() early returns (no memory yet / empty mask) must not leak
    cached frame features and must match the configured output size
    (review findings)."""
    from tests.conftest import require_golden
    from tests.test_inference_stream import _build_core

    rec = dict(np.load(require_golden("stream_small_work.npz")))
    frames = rec["frames"]

    core = _build_core(use_long_term=False)
    out = core.step(frames[0])  # no mask, no memory -> early return
    assert out.shape == (1,) + frames[0].shape[-2:]
    assert len(core.image_feature_store) == 0, "leaked cached features"

    # with max_internal_size resizing active the zeros must come back at
    # the ORIGINAL resolution like every normal frame
    core_rs = _build_core(use_long_term=False, max_internal_size=32)
    out = core_rs.step(frames[0])
    assert out.shape == (1,) + frames[0].shape[-2:]
    assert len(core_rs.image_feature_store) == 0


def test_multibucket_lt_eviction_stream():
    """End-to-end: mid-video object addition (two buckets) streamed long
    enough that LT consolidation AND usage-ranked eviction both run. Drives
    the round-2 fixes (obj-validity compaction, per-object potentiation)
    through the real InferenceCore path and checks the invariants."""
    import numpy as np

    from tests.conftest import require_golden
    from tests.test_inference_stream import _build_core

    rec = dict(np.load(require_golden("stream_small_adddel.npz")))
    frames, mask0, mask2 = rec["frames"], rec["mask0"], rec["mask2"]

    # tiny LT budgets force consolidation + eviction within the clip:
    # ring of 3 (max 2 + slack), candidates consolidate every ~2 memorized
    # frames, LT caps at 64 tokens with a 16-token buffer
    core = _build_core(use_long_term=True, cfg_extra={
        "mem_every": 1,
        "long_term": {"count_usage": True, "max_mem_frames": 3,
                      "min_mem_frames": 1, "num_prototypes": 8,
                      "max_num_tokens": 64, "buffer_tokens": 16},
    })

    t = frames.shape[0]
    evicted = False
    for rep in range(3):  # loop the clip to accumulate enough LT tokens
        for ti in range(t):
            step_i = rep * t + ti
            if step_i == 0:
                prob = core.step(frames[ti], np.where(mask0 == 1, 1, 0),
                                 objects=[1])
            elif step_i == 4:
                prob = core.step(frames[ti], mask2, objects=[2])  # bucket 2
            else:
                prob = core.step(frames[ti])
            p = np.asarray(prob)
            assert np.isfinite(p).all()
            assert p.min() >= 0 and p.max() <= 1 + 1e-5
            lcap = core.state.lt_key.shape[1]
            assert core._lt_count <= lcap
            if core._lt_count >= core.max_long_tokens - core.num_prototypes:
                evicted = True
    assert core._lt_count > 0, "consolidation never ran"
    assert evicted or core._lt_count > 32, "LT never approached its cap"
    # both buckets' objects must hold valid LT tokens after eviction churn
    ov = np.asarray(core.state.lt_obj_valid[:, :core._lt_count])
    assert ov[0].any() and ov[1].any()
