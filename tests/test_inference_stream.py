"""End-to-end streaming parity: our InferenceCore vs the reference's recorded
per-frame outputs on a synthetic video (same weights, same cadence).

Covers: first-frame permanent memory, mem_every cadence, staggered sensory
updates, working-memory FIFO (ring), and long-term consolidation.
"""
import numpy as np
import pytest

from tests.conftest import require_golden


def _build_core(use_long_term: bool, flip_aug: bool = False,
                max_internal_size: int = -1, variant: str = "small",
                cfg_extra: dict = None):
    from cutie_tpu.config import Config, eval_config
    from cutie_tpu.inference import InferenceCore
    from cutie_tpu.models import CUTIE
    from cutie_tpu.utils.get_default_model import ModelBundle
    from cutie_tpu.utils.weight_import import convert_torch_state_dict
    import jax
    import jax.numpy as jnp

    sd = {k: v.astype(np.float32)
          for k, v in np.load(require_golden(f"state_dict_{variant}.npz")).items()}
    cfg = eval_config(variant)
    cfg.merge({
        "mem_every": 3, "top_k": 30, "stagger_updates": 5, "flip_aug": flip_aug,
        "use_long_term": use_long_term, "max_mem_frames": 3,
        "max_internal_size": max_internal_size,
        "long_term": {"count_usage": True, "max_mem_frames": 4,
                      "min_mem_frames": 2, "num_prototypes": 32,
                      "max_num_tokens": 256, "buffer_tokens": 64},
    })
    if cfg_extra:
        cfg.merge(cfg_extra)
    # same dtype selection as utils/get_default_model.build_model
    dtype = jnp.bfloat16 if cfg.get("amp", False) else jnp.float32
    model = CUTIE(cfg, dtype=dtype)
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                            jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 2, 64, 64)))
    zeros = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), dict(shapes))
    variables = convert_torch_state_dict(sd, zeros, strict=True)
    bundle = ModelBundle(model=model, variables=variables, cfg=cfg)
    return InferenceCore(bundle, cfg)


def _run_stream(tag: str, use_long_term: bool, flip_aug: bool = False,
                max_internal_size: int = -1, variant: str = "small",
                cfg_extra: dict = None):
    rec = dict(np.load(require_golden(f"stream_{variant}_{tag}.npz")))
    frames, mask0, ref_probs = rec["frames"], rec["mask0"], rec["probs"]
    core = _build_core(use_long_term, flip_aug, max_internal_size, variant,
                       cfg_extra)

    t = frames.shape[0]
    agree = []
    conf_agree = []
    prob_err = []
    for ti in range(t):
        if ti == 0:
            prob = core.step(frames[ti], mask0, objects=[1, 2])
        else:
            prob = core.step(frames[ti])
        prob = np.asarray(prob)
        ref = ref_probs[ti]
        assert prob.shape == ref.shape, (ti, prob.shape, ref.shape)
        ours = prob.argmax(0)
        theirs = ref.argmax(0)
        agree.append((ours == theirs).mean())
        # random-weight boundaries contain exact-tie pixels whose argmax flips
        # on fp noise; disagreements only count against parity where the
        # reference's top-2 margin is decisive
        srt = np.sort(ref, axis=0)
        margin = srt[-1] - srt[-2]
        confident = margin > 0.01
        conf_agree.append(((ours == theirs) | ~confident).mean())
        prob_err.append(np.abs(prob - ref).max())

    # pixel-level argmax agreement must be near-perfect on every frame
    assert min(agree) > 0.97, (agree, prob_err)
    assert min(conf_agree) > 0.995, (conf_agree, prob_err)
    # probabilities should track closely (top-k boundary noise aside)
    assert np.median(prob_err) < 0.05, prob_err
    return core


def test_stream_working_memory_parity():
    _run_stream("work", use_long_term=False)


def test_stream_base_working_memory_parity():
    """Flagship cutie-base (R50, pixel_dim 256) end-to-end stream parity —
    the architecture the BASELINE J&F gate runs (VERDICT r1 #2)."""
    _run_stream("work", use_long_term=False, variant="base")


def test_stream_base_long_term_parity():
    core = _run_stream("lt", use_long_term=True, variant="base")
    assert core._lt_count > 0


def test_stream_bf16_inference():
    """cfg.amp=True must actually build the bf16 model (the reference's
    inference autocast, eval_vos.py:66,112 / gui_config.yaml:11) and still
    track the fp32 masks closely — the fp32 islands (attention read, GRUs,
    logits) bound the drift."""
    import jax.numpy as jnp

    rec = dict(np.load(require_golden("stream_small_work.npz")))
    frames, mask0 = rec["frames"], rec["mask0"]

    core32 = _build_core(use_long_term=False)
    core16 = _build_core(use_long_term=False, cfg_extra={"amp": True})
    assert core16.model.dtype == jnp.bfloat16
    assert core32.model.dtype == jnp.float32

    agree = []
    for ti in range(frames.shape[0]):
        if ti == 0:
            p32 = core32.step(frames[ti], mask0, objects=[1, 2])
            p16 = core16.step(frames[ti], mask0, objects=[1, 2])
        else:
            p32 = core32.step(frames[ti])
            p16 = core16.step(frames[ti])
        p16 = np.asarray(p16)
        assert np.isfinite(p16).all() and p16.min() >= 0 and p16.max() <= 1
        agree.append((np.asarray(p32).argmax(0) == p16.argmax(0)).mean())
    # Frame 1 is a pure forward from identical memory — the honest one-step
    # bf16 drift. Later frames feed divergent masks back through memory and,
    # with RANDOM weights (razor-thin logit margins), the two streams drift
    # chaotically; trained weights do not behave this way, so only finiteness
    # and valid probabilities are asserted there.
    assert agree[1] > 0.85, agree


def test_stream_radix_read_backend_parity():
    """Forcing the exact radix-select read backend must still match the
    golden stream recorded against the sort-based path (the backends agree
    everywhere except exact fp32 ties at the k-th similarity)."""
    _run_stream("lt", use_long_term=True,
                cfg_extra={"read_backend": "radix"})


def test_stream_internal_resize_parity():
    """192x256 video processed at max_internal_size=96 (the GUI's mode of
    operation): pins the host-side non-antialiased input downsample and the
    device output upsample against the reference end to end. (The antialias
    parity bug in the input resize survived round 1 precisely because no
    fixture exercised this path.)"""
    _run_stream("resize", use_long_term=False, max_internal_size=96)


def test_stream_long_term_parity():
    core = _run_stream("lt", use_long_term=True)
    # LT consolidation must actually have happened
    assert core._lt_count > 0


def test_output_prob_to_mask_roundtrip():
    rec = dict(np.load(require_golden("stream_small_work.npz")))
    core = _build_core(False)
    mask0 = np.where(rec["mask0"] == 1, 5, np.where(rec["mask0"] == 2, 9, 0))
    prob = core.step(rec["frames"][0], mask0, objects=[5, 9])
    mask = core.output_prob_to_mask(prob)
    # ids are remapped back to the caller's (non-contiguous) object ids
    assert set(np.unique(mask)) <= {0, 5, 9}
    got = (mask > 0)
    want = rec["mask0"] > 0
    assert (got == want).mean() > 0.99


def test_stream_flip_aug_parity():
    _run_stream("flip", use_long_term=False, flip_aug=True)


def test_stream_add_delete_objects_parity():
    """Mid-video object addition (merge path, split-permanent bucket) and
    deletion (slot repacking) vs the reference's recorded run."""
    rec = dict(np.load(require_golden("stream_small_adddel.npz")))
    frames, mask0, mask2 = rec["frames"], rec["mask0"], rec["mask2"]
    core = _build_core(use_long_term=False)
    core.max_mem_frames = 3  # fixture uses max_mem_frames=4 -> ring of 3
    core.ring_frames = 3
    core.state = None

    t = frames.shape[0]
    agree = []
    for ti in range(t):
        if ti == 9:
            core.delete_objects([1])
        if ti == 0:
            prob = core.step(frames[ti], np.where(mask0 == 1, 1, 0), objects=[1])
        elif ti == 4:
            prob = core.step(frames[ti], mask2, objects=[2])
        else:
            prob = core.step(frames[ti])
        ours = np.zeros((3, *frames.shape[2:]), np.float32)
        p = np.asarray(prob)
        ours[:p.shape[0]] = p
        agree.append((ours.argmax(0) == rec["probs"][ti].argmax(0)).mean())
    assert min(agree) > 0.98, agree


def test_determinism_same_seed_identical_masks():
    """SURVEY §4: same inputs => bit-identical outputs across runs."""
    rec = dict(np.load(require_golden("stream_small_work.npz")))
    outs = []
    for _ in range(2):
        core = _build_core(use_long_term=False)
        probs = []
        for ti in range(6):
            if ti == 0:
                p = core.step(rec["frames"][ti], rec["mask0"], objects=[1, 2])
            else:
                p = core.step(rec["frames"][ti])
            probs.append(np.asarray(p))
        outs.append(probs)
    for a, b in zip(*outs):
        np.testing.assert_array_equal(a, b)


def test_update_config_runtime():
    """Runtime memory-budget updates (reference inference_core.py:67-69,
    memory_manager.py:59-75): mem_every/top_k/max_mem_frames updatable,
    use_long_term immutable."""
    rec = dict(np.load(require_golden("stream_small_work.npz")))
    core = _build_core(use_long_term=False)
    core.step(rec["frames"][0], rec["mask0"], objects=[1, 2])
    core.update_config({
        "mem_every": 2, "top_k": 10, "use_long_term": False,
        "max_mem_frames": 4,
        "long_term": {"max_mem_frames": 4, "min_mem_frames": 2,
                      "max_num_tokens": 256, "buffer_tokens": 64},
    })
    assert core.mem_every == 2
    assert core.steps.top_k == 10
    assert core.max_mem_frames == 3
    # continues to run with the new top_k graph variant
    p = core.step(rec["frames"][1])
    assert np.asarray(p).shape[0] == 3
    with pytest.raises(AssertionError):
        core.update_config({"mem_every": 2, "top_k": 10, "use_long_term": True,
                            "long_term": {"max_mem_frames": 4,
                                          "min_mem_frames": 2,
                                          "max_num_tokens": 256,
                                          "buffer_tokens": 64}})


def test_image_feature_store_reuse():
    """delete_buffer=False caches frame features for reuse across steps
    (reference image_feature_store.py semantics)."""
    rec = dict(np.load(require_golden("stream_small_work.npz")))
    core = _build_core(use_long_term=False)
    core.step(rec["frames"][0], rec["mask0"], objects=[1, 2],
              delete_buffer=False)
    assert core.curr_ti in core.image_feature_store
    calls = {"n": 0}
    orig = core.steps.encode

    def counting(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    core.steps.encode = counting
    # re-step the SAME frame index (interactive correction flow)
    core.curr_ti -= 1
    prob = core.step(rec["frames"][0])
    assert calls["n"] == 0  # encode reused from the store
    core.steps.encode = orig
    core.image_feature_store.delete(core.curr_ti)
    assert len(core.image_feature_store) == 0


def test_resize_work_ring_fifo_order():
    """Growing/shrinking the work ring preserves chronological (FIFO) order —
    the semantics the reference gets for free from its growing token tensor
    (memory_manager.py:59-75 + kv_memory_store.py sieve)."""
    import jax.numpy as jnp

    from cutie_tpu.inference.state import init_state, resize_work_ring

    st = init_state(batch=1, max_objects=2, h=2, w=2, sensory_dim=4,
                    key_dim=3, value_dim=4, num_queries=2, embed_dim=4,
                    perm_frames=1, work_frames=3, lt_capacity=8)
    # simulate a wrapped ring: frames written in order 10,11,12,13 into 3
    # slots -> slots hold [13, 11, 12], start=1 (oldest=11), count=3
    key = np.zeros((1, 3, 4, 3), np.float32)
    key[0, 0] = 13
    key[0, 1] = 11
    key[0, 2] = 12
    st = st.replace(work_key=jnp.asarray(key),
                    work_start=jnp.asarray(1, jnp.int32),
                    work_count=jnp.asarray(3, jnp.int32),
                    work_obj_valid=jnp.ones((2, 3), bool))

    grown = resize_work_ring(st, 5)
    gk = np.asarray(grown.work_key)[0, :, 0, 0]
    assert list(gk[:3]) == [11, 12, 13]          # chronological, oldest first
    assert list(gk[3:]) == [0, 0]                # fresh slots empty
    assert int(grown.work_start) == 0 and int(grown.work_count) == 3
    assert np.asarray(grown.work_obj_valid)[:, 3:].sum() == 0

    shrunk = resize_work_ring(st, 2)
    sk = np.asarray(shrunk.work_key)[0, :, 0, 0]
    assert list(sk) == [12, 13]                  # newest survive a shrink
    assert int(shrunk.work_count) == 2


def test_update_config_grows_working_memory():
    """Raising max_mem_frames mid-video must actually raise ring capacity
    (VERDICT r1 weak #2): the GUI work-memory spinbox semantics of reference
    memory_manager.py:59-75."""
    rec = dict(np.load(require_golden("stream_small_work.npz")))
    core = _build_core(use_long_term=False)  # cfg max_mem_frames=3 -> ring 2
    assert core.ring_frames == 2
    frames, mask0 = rec["frames"], rec["mask0"]
    core.step(frames[0], mask0, objects=[1, 2])
    for ti in range(1, 7):
        core.step(frames[ti % frames.shape[0]])
    assert core._work_count == core.ring_frames == 2  # ring saturated

    core.update_config({
        "mem_every": 1, "top_k": 30, "use_long_term": False,
        "max_mem_frames": 6,
        "long_term": {"max_mem_frames": 4, "min_mem_frames": 2,
                      "max_num_tokens": 256, "buffer_tokens": 64},
    })
    assert core.ring_frames == 5
    assert core.state.work_key.shape[1] == 5
    # with mem_every=1 every frame becomes memory: the ring must now fill past
    # the old capacity
    for ti in range(7, 11):
        p = core.step(frames[ti % frames.shape[0]])
    assert core._work_count > 2
    assert int(core.state.work_count) == core._work_count
    assert np.isfinite(np.asarray(p)).all()

    # shrink back down: newest frames survive, counters clamp
    core.update_config({
        "mem_every": 1, "top_k": 30, "use_long_term": False,
        "max_mem_frames": 3,
        "long_term": {"max_mem_frames": 4, "min_mem_frames": 2,
                      "max_num_tokens": 256, "buffer_tokens": 64},
    })
    assert core.ring_frames == 2 and core._work_count == 2
    p = core.step(frames[0])
    assert np.isfinite(np.asarray(p)).all()


def test_stream_pallas_read_backend_parity(monkeypatch):
    """Forcing the fused Pallas read backend (interpret mode, tiny block
    sizes so the small fixture's per-segment capacities exceed block_n)
    must match the golden LT stream. Exercises the steps.py resident
    segment layout + in-place value streaming end to end on CPU — the
    kernel-level unit tests cannot see that layer (round-5 lesson: a
    segment-alignment bug compiled fine everywhere except the real chip).
    """
    monkeypatch.setenv("CUTIE_TPU_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("CUTIE_TPU_PALLAS_BLOCK_N", "8")
    monkeypatch.setenv("CUTIE_TPU_PALLAS_BLOCK_P", "16")
    core = _run_stream("lt", use_long_term=True,
                       cfg_extra={"read_backend": "pallas"})
    assert core._lt_count > 0
