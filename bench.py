"""Headline benchmark: DAVIS-2017-style 480p streaming FPS on one chip.

Measures InferenceCore.step throughput the same way the reference's
eval_vos.py does (synchronized per-frame step time, first frame included —
cutie/eval_vos.py:126-145,165-167), on a synthetic 480x854 3-object video
with the standard eval cadence (mem_every=5, top_k=30, no long-term memory).

Baseline: ~36 FPS for cutie-base at 480p on a 2080Ti-class GPU (paper
number recorded in BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} with the
secondary perf surface pinned under "extra": long-term-memory-mode FPS (same
video, LT consolidation active) and the warm interactive click latency
(RITM HRNet-18+OCR, 480p, flip + zoom-in) — the claims that previously lived
only in PARITY.md prose (VERDICT r1 #6).
"""
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/cutie_tpu_jax_cache")

import jax
import numpy as np

jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

BASELINE_FPS = 36.0
H, W = 480, 854
N_FRAMES = 60
N_OBJECTS = 3


def synth_video(t, h, w, seed=0):
    """uint8 HWC frames (the fast input path: decode-native layout)."""
    rng = np.random.default_rng(seed)
    bg = rng.integers(50, 150, size=(h, w, 3), dtype=np.uint8)
    frames = []
    mask0 = np.zeros((h, w), np.int64)
    sq = h // 6
    pos = [(h // 8, w // 8, 2, 3), (h // 2, w // 2, 1, -2), (h // 4, 3 * w // 4, -1, 1)]
    for ti in range(t):
        f = bg.copy()
        for oi, (y, x, dy, dx) in enumerate(pos):
            yy, xx = y + ti * dy, x + ti * dx
            yy = int(np.clip(yy, 0, h - sq - 1))
            xx = int(np.clip(xx, 0, w - sq - 1))
            f[yy:yy + sq, xx:xx + sq] = np.array(
                [230 - 70 * oi, 50 + 70 * oi, 128], np.uint8)
            if ti == 0:
                mask0[yy:yy + sq, xx:xx + sq] = oi + 1
        frames.append(f)
    return frames, mask0


def run_video(core, frames, mask0, timed: bool):
    times = []
    next_d = None
    t_start = time.perf_counter()
    for ti, frame in enumerate(frames):
        t0 = time.perf_counter()
        frame_d = next_d if next_d is not None else jax.device_put(frame)
        if ti == 0:
            prob = core.step(frame_d, mask0,
                             objects=list(range(1, N_OBJECTS + 1)))
        else:
            prob = core.step(frame_d)
        # pipeline: upload frame t+1 on the dispatch thread right after the
        # async jit dispatch, overlapping the copy with device compute.
        # (A threaded-prefetch device_put was measured SLOWER here — the
        # worker threads contend with dispatch for the GIL/tunnel.)
        if ti + 1 < len(frames):
            next_d = jax.device_put(frames[ti + 1])
        jax.block_until_ready(prob)
        times.append(time.perf_counter() - t0)
    wall = time.perf_counter() - t_start
    return times, wall


def bench_lt_fps(bundle, frames, mask0):
    """Long-term-memory mode on the same video (consolidation active)."""
    from cutie_tpu.config import eval_config, get_dataset_cfg
    from cutie_tpu.inference import InferenceCore

    cfg = eval_config("base")
    cfg.dataset = "lvos-val"  # LT preset (use_long_term, max_mem_frames 10)
    get_dataset_cfg(cfg)
    cfg.max_internal_size = -1
    core = InferenceCore(bundle, cfg)
    # warm-up must run the FULL video: the LT consolidation graph first
    # triggers around frame 50 (mem_every=5, max_mem_frames=10) and would
    # otherwise compile inside the timed pass
    run_video(core, frames, mask0, timed=False)
    core = InferenceCore(bundle, cfg)
    times, _ = run_video(core, frames, mask0, timed=True)
    return len(times) / sum(times)


def bench_amp_fps(frames, mask0):
    """amp (bf16 compute) eval — the reference's autocast analog
    (eval_vos.py:66,112; our fp32 islands match the training precision map)."""
    from cutie_tpu.config import eval_config, get_dataset_cfg
    from cutie_tpu.inference import InferenceCore
    from cutie_tpu.utils.get_default_model import build_model

    cfg = eval_config("base")
    cfg.dataset = "d17-val"
    get_dataset_cfg(cfg)
    cfg.max_internal_size = -1
    cfg.amp = True
    bundle = build_model(cfg, weights=None)
    core = InferenceCore(bundle, cfg)
    run_video(core, frames[:12], mask0, timed=False)
    core = InferenceCore(bundle, cfg)
    times, _ = run_video(core, frames, mask0, timed=True)
    return len(times) / sum(times)


def bench_click_latency(n_clicks: int = 5):
    """Warm RITM click latency at 480p (flip + zoom-in predictor params)."""
    from cutie_tpu.ritm.utils import ClickController

    ctrl = ClickController(None)  # random weights: same FLOPs as shipped ckpt
    frame = synth_video(1, H, W)[0][0]
    image = np.transpose(frame, (2, 0, 1)).astype(np.float32) / 255.0

    def click_pass(timed):
        # identical click sequence both passes: click-count-dependent point
        # padding + zoom-in crops compile per shape, so pass 1 warms every
        # graph pass 2 hits
        ctrl.unanchor()
        ctrl.interact(image, W // 3, H // 3, True)  # anchor + first click
        lat = []
        for i in range(n_clicks):
            t0 = time.perf_counter()
            out = ctrl.interact(image, W // 3 + 10 * (i + 1), H // 3,
                                i % 2 == 0)
            np.asarray(out)
            lat.append(time.perf_counter() - t0)
        return lat

    click_pass(timed=False)
    return float(np.median(click_pass(timed=True)))


def main():
    from cutie_tpu.config import eval_config, get_dataset_cfg
    from cutie_tpu.inference import InferenceCore
    from cutie_tpu.utils.get_default_model import build_model

    cfg = eval_config("base")
    cfg.dataset = "d17-val"
    get_dataset_cfg(cfg)
    bundle = build_model(cfg, weights=None)  # random weights: same FLOPs

    frames, mask0 = synth_video(N_FRAMES, H, W)

    # warm-up pass compiles every step variant
    core = InferenceCore(bundle, cfg)
    run_video(core, frames[:12], mask0, timed=False)

    # timed pass on a fresh core. FPS = frames / sum of per-frame
    # synchronized step times, every frame incl. the first — the reference's
    # methodology (cutie/eval_vos.py:126-145 times each step with CUDA
    # events and sums), so vs_baseline compares like for like.
    core = InferenceCore(bundle, cfg)
    times, wall = run_video(core, frames, mask0, timed=True)
    fps = len(times) / sum(times)

    extra = {}
    try:
        extra["lt_480p_3obj_fps"] = round(bench_lt_fps(bundle, frames, mask0), 3)
    except Exception as e:  # secondary metrics must never sink the headline
        extra["lt_480p_3obj_fps"] = f"error: {e}"
    try:
        extra["amp_480p_3obj_fps"] = round(bench_amp_fps(frames, mask0), 3)
    except Exception as e:
        extra["amp_480p_3obj_fps"] = f"error: {e}"
    try:
        extra["click_latency_ms"] = round(bench_click_latency() * 1000, 1)
    except Exception as e:
        extra["click_latency_ms"] = f"error: {e}"

    print(json.dumps({
        "metric": "d17_480p_3obj_fps",
        "value": round(fps, 3),
        "unit": "fps",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
