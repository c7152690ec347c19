"""Bisect the round-4 d17 bench collapse (BENCH_r04: 0.3 FPS, rc=124).

Times a short synthetic 480p 3-object stream under one configuration per
invocation (subprocess-per-config keeps the jit caches honest):

  python tools/bisect_r4.py <tag> [read_backend]

with env toggles CUTIE_TPU_FAST_STEM=0|1, CUTIE_TPU_RADIX_GROUP_BITS=n.
Prints ms/frame + FPS measured the honest way (free-run, fetch from the
final donated output — see bench.py module docstring).
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/cutie_tpu_jax_cache")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def main():
    tag = sys.argv[1] if len(sys.argv) > 1 else "default"
    backend = sys.argv[2] if len(sys.argv) > 2 else "auto"
    n_frames = int(os.environ.get("BISECT_FRAMES", "16"))

    from bench import synth_video, H, W, N_OBJECTS, _bench_config
    try:
        from bench import TRAINED_WEIGHTS
    except ImportError:
        TRAINED_WEIGHTS = ""
    from cutie_tpu.utils.get_default_model import build_model
    from cutie_tpu.inference import InferenceCore

    frames, mask0 = synth_video(n_frames, H, W)
    cfg = _bench_config(os.environ.get("BISECT_DATASET", "d17-val"))
    if backend != "auto":
        cfg.read_backend = backend
    weights = (TRAINED_WEIGHTS if os.path.exists(TRAINED_WEIGHTS)
               and os.environ.get("BISECT_RANDOM_WEIGHTS") != "1" else None)
    bundle = build_model(cfg, weights=weights)

    core = InferenceCore(bundle, cfg)
    t0 = time.perf_counter()
    out = core.step(frames[0], mask0, objects=list(range(1, N_OBJECTS + 1)))
    np.asarray(out[:1, :1, :1])
    print(f"[{tag}] first frame (incl compile): "
          f"{time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    for f in frames[1:]:
        out = core.step(f)
    np.asarray(out[:1, :1, :1])
    print(f"[{tag}] warmup pass {n_frames - 1} frames: "
          f"{time.perf_counter() - t0:.1f}s", flush=True)

    dev_frames = [jax.device_put(f) for f in frames]
    jax.block_until_ready(dev_frames[-1])
    core = InferenceCore(bundle, cfg)
    out = core.step(np.asarray(dev_frames[0]), mask0,
                    objects=list(range(1, N_OBJECTS + 1)))
    np.asarray(out[:1, :1, :1])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for f in dev_frames[1:]:
            out = core.step(f)
        np.asarray(out[:1, :1, :1])
        best = min(best, time.perf_counter() - t0)
    n = n_frames - 1
    print(f"[{tag}] backend={backend} fast_stem="
          f"{os.environ.get('CUTIE_TPU_FAST_STEM', '1')} gbits="
          f"{os.environ.get('CUTIE_TPU_RADIX_GROUP_BITS', '1')}: "
          f"{best / n * 1000:.1f} ms/frame = {n / best:.1f} FPS", flush=True)


if __name__ == "__main__":
    main()
