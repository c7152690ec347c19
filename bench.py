"""Headline benchmark: DAVIS-2017-style 480p streaming throughput on one chip.

Measures sustained InferenceCore.step throughput on a synthetic 480x854
3-object video with the standard eval cadence (mem_every=5, top_k=30), plus
long-term-memory mode, amp (bf16) mode, and the warm interactive click
latency (RITM HRNet-18+OCR, 480p, flip + zoom-in).

METHODOLOGY (important): over the dev TPU tunnel `jax.block_until_ready`
returns BEFORE remote execution finishes, so naive per-frame sync timing
measures dispatch latency, not compute — it inflated earlier rounds' FPS
~5x (330-550 "FPS" vs ~16 ms/frame of real device time; caught by a
jax.profiler device trace, see .claude/skills/verify/SKILL.md). This bench
therefore free-runs N steps and forces completion by FETCHING from the
final output — the donated state chains every queued step, so the fetch
cannot complete early — and reports wall/N. The number agrees with the
device trace within ~5%. The reference measures per-frame CUDA-event time
(cutie/eval_vos.py:126-145); on directly-attached hardware the two
methodologies agree at steady state (the pipeline is one frame deep).

Baseline: ~36 FPS for cutie-base at 480p on a 2080Ti-class GPU (paper
number recorded in BASELINE.md).

Weights: the synthetically TRAINED base weights (tests/golden/
state_dict_base_trained.npz — same FLOPs as the unreachable release
checkpoint), so the run is self-verifying: after timing, the committed
480p golden stream (recorded from the reference torch implementation)
is replayed and the min per-object cross-implementation IoU is reported
as extra.xiou; the bench FAILS (exit 1) if it drops below 0.99.

Prints ONE JSON line (last): {"metric", "value", "unit", "vs_baseline",
"extra"}.
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

_T0 = time.perf_counter()


def _stage(msg: str):
    """Stage progress on stderr (stdout stays one JSON line) so a timeout
    in a driver run pinpoints which stage stalled."""
    print(f"[bench +{time.perf_counter() - _T0:7.1f}s] {msg}",
          file=sys.stderr, flush=True)


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


def run_video(core, frames, mask0):
    """Streaming warm-up pass (compiles every step variant). The returned
    per-frame times are DISPATCH times only over the tunnel — do not report
    them as FPS (see module docstring); use measure_throughput."""
    times = []
    out = None
    t_start = time.perf_counter()
    for ti, frame in enumerate(frames):
        t0 = time.perf_counter()
        if ti == 0:
            out = core.step(frame, mask0, objects=list(range(1, N_OBJECTS + 1)))
        else:
            out = core.step(frame)
        times.append(time.perf_counter() - t0)
    np.asarray(out[:1, :1, :1])  # force completion of the whole chain
    wall = time.perf_counter() - t_start
    return times, wall


def measure_throughput(core, dev_frames, mask0, reps: int = 3):
    """Sustained steady-state throughput: free-run the frame loop, force
    completion by fetching from the final output (donated state chains all
    queued steps), best of `reps`. Returns (ms_per_frame, fps)."""
    prob = core.step(np.asarray(dev_frames[0]), mask0,
                     objects=list(range(1, N_OBJECTS + 1)))
    np.asarray(prob[:1, :1, :1])  # hard sync before timing
    n = len(dev_frames) - 1
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = None
        for f in dev_frames[1:]:
            out = core.step(f)
        np.asarray(out[:1, :1, :1])
        best = min(best, time.perf_counter() - t0)
    return best / n * 1000, n / best


def _bench_config(dataset: str, amp: bool = False):
    from cutie_tpu.config import eval_config, get_dataset_cfg

    cfg = eval_config("base")
    cfg.dataset = dataset
    get_dataset_cfg(cfg)
    cfg.max_internal_size = -1
    cfg.amp = amp
    return cfg


def bench_stream_fps(bundle, cfg, frames, mask0):
    from cutie_tpu.inference import InferenceCore

    core = InferenceCore(bundle, cfg)
    run_video(core, frames, mask0)  # warm-up: compiles all graph variants
    dev_frames = [jax.device_put(f) for f in frames]
    jax.block_until_ready(dev_frames[-1])
    core = InferenceCore(bundle, cfg)
    ms, fps = measure_throughput(core, dev_frames, mask0)
    return fps


def bench_click_latency(n_clicks: int = 5):
    """Warm RITM click latency at 480p (flip + zoom-in predictor params).
    Honest (np.asarray forces the D2H) but includes one tunnel round-trip
    per click; single-digit ms of it remain on a directly-attached host."""
    from cutie_tpu.ritm.utils import ClickController

    ctrl = ClickController(None)  # random weights: same FLOPs as shipped ckpt
    frame = synth_video(1, H, W)[0][0]
    image = np.transpose(frame, (2, 0, 1)).astype(np.float32) / 255.0

    def click_pass():
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

    click_pass()
    return float(np.median(click_pass()))


TRAINED_WEIGHTS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "tests", "golden",
                               "state_dict_base_trained.npz")


def verify_xiou() -> float:
    """Correctness gate inside the bench (VERDICT r3 #3): replay the
    committed 480p golden stream (recorded from the reference torch
    implementation with the synthetically TRAINED base weights) and return
    the min per-object cross-implementation IoU. Runs at matmul precision
    'highest' like the parity gate so MXU bf16 rounding can't mask (or
    fake) an implementation regression."""
    import jax as _jax
    repo = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, repo)
    from tools.report_parity_480p import run_stream

    with _jax.default_matmul_precision("highest"):
        ious, _gt_ours, _gt_ref, _dt = run_stream("work", False, "trained")
    return float(ious.min())


def quick():
    """Landing gate for hot-path commits (VERDICT r4 #2): ONE config
    (d17 fp32, trained weights), a short stream, ~2 min warm-cache on the
    tunnel. Policy (PARITY.md §timing): every commit touching ops/,
    models/resnet.py, models/layers.py, or inference/steps.py quotes this
    output in its commit message. Usage: python bench.py --quick"""
    from cutie_tpu.utils.get_default_model import build_model

    n = 16
    frames, mask0 = synth_video(n, H, W)
    weights = TRAINED_WEIGHTS if os.path.exists(TRAINED_WEIGHTS) else None
    cfg = _bench_config("d17-val")
    bundle = build_model(cfg, weights=weights)
    _stage("quick d17 fp32 stream...")
    fps = bench_stream_fps(bundle, cfg, frames, mask0)
    print(json.dumps({"metric": "quick_d17_480p_3obj_fps",
                      "value": round(fps, 3), "unit": "fps",
                      "vs_baseline": round(fps / BASELINE_FPS, 3),
                      "extra": {"frames": n}}))


def main():
    if os.environ.get("CUTIE_BENCH_WATCHDOG"):
        import faulthandler
        faulthandler.enable()
        faulthandler.dump_traceback_later(
            int(os.environ["CUTIE_BENCH_WATCHDOG"]), repeat=True)
    if "--quick" in sys.argv:
        quick()
        return
    from cutie_tpu.utils.get_default_model import build_model

    frames, mask0 = synth_video(N_FRAMES, H, W)

    # synthetic-TRAINED base weights (same FLOPs as the release checkpoint;
    # lets the xIoU gate below verify the exact artifact being timed)
    weights = TRAINED_WEIGHTS if os.path.exists(TRAINED_WEIGHTS) else None
    cfg = _bench_config("d17-val")
    bundle = build_model(cfg, weights=weights)
    _stage("d17 fp32 stream...")
    fps = bench_stream_fps(bundle, cfg, frames, mask0)
    _stage(f"d17 fp32 done: {fps:.1f} FPS")

    extra = {}
    try:  # secondary metrics must never sink the headline
        cfg_lt = _bench_config("lvos-val")
        extra["lt_480p_3obj_fps"] = round(
            bench_stream_fps(bundle, cfg_lt, frames, mask0), 3)
    except Exception as e:
        extra["lt_480p_3obj_fps"] = f"error: {e}"
    _stage(f"lt fp32 done: {extra['lt_480p_3obj_fps']}")
    try:
        cfg_amp = _bench_config("d17-val", amp=True)
        bundle_amp = build_model(cfg_amp, weights=weights)
        extra["amp_480p_3obj_fps"] = round(
            bench_stream_fps(bundle_amp, cfg_amp, frames, mask0), 3)
    except Exception as e:
        extra["amp_480p_3obj_fps"] = f"error: {e}"
    _stage(f"d17 amp done: {extra['amp_480p_3obj_fps']}")
    try:
        cfg_lt_amp = _bench_config("lvos-val", amp=True)
        bundle_lt_amp = build_model(cfg_lt_amp, weights=weights)
        extra["lt_amp_480p_3obj_fps"] = round(
            bench_stream_fps(bundle_lt_amp, cfg_lt_amp, frames, mask0), 3)
    except Exception as e:
        extra["lt_amp_480p_3obj_fps"] = f"error: {e}"
    _stage(f"lt amp done: {extra['lt_amp_480p_3obj_fps']}")
    try:
        extra["click_latency_ms"] = round(bench_click_latency() * 1000, 1)
    except Exception as e:
        extra["click_latency_ms"] = f"error: {e}"
    _stage(f"click done: {extra['click_latency_ms']}")

    # correctness gate: FPS and masks from one artifact — a perf change that
    # breaks numerics fails the bench instead of posting a green number
    xiou = None
    if os.path.exists(TRAINED_WEIGHTS):
        _stage("xiou correctness gate...")
        xiou = verify_xiou()
        extra["xiou"] = round(xiou, 5)
    _stage("done")

    print(json.dumps({
        "metric": "d17_480p_3obj_fps",
        "value": round(fps, 3),
        "unit": "fps",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
        "extra": extra,
    }))
    if xiou is not None and xiou < 0.99:
        print(f"BENCH CORRECTNESS GATE FAILED: min xIoU {xiou:.5f} < 0.99",
              file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
