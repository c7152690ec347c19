"""Per-frame phase breakdown of InferenceCore.step on the real device."""
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/cutie_tpu_jax_cache")

import jax
import numpy as np

jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from bench import synth_video, N_OBJECTS, H, W


def main():
    from cutie_tpu.config import eval_config, get_dataset_cfg
    from cutie_tpu.inference import InferenceCore
    from cutie_tpu.utils.get_default_model import build_model

    cfg = eval_config("base")
    cfg.dataset = "d17-val"
    get_dataset_cfg(cfg)
    bundle = build_model(cfg, weights=None)
    frames, mask0 = synth_video(24, H, W)

    core = InferenceCore(bundle, cfg)
    # instrument: wrap step fns with timers
    orig = {}
    acc = {}

    def wrap(name, fn):
        def wrapped(*a, **k):
            t0 = time.perf_counter()
            out = fn(*a, **k)
            leaf = jax.tree_util.tree_leaves(out)[0]
            np.asarray(leaf[..., :1])  # forced TINY fetch (block can return early)
            acc[name] = acc.get(name, 0.0) + (time.perf_counter() - t0)
            return out
        return wrapped

    for name in ["encode", "segment", "memorize", "set_last_mask"]:
        orig[name] = getattr(core.steps, name)
        setattr(core.steps, name, wrap(name, orig[name]))

    times = []
    for ti, frame in enumerate(frames):
        t0 = time.perf_counter()
        if ti == 0:
            prob = core.step(frame, mask0, objects=list(range(1, N_OBJECTS + 1)))
        else:
            prob = core.step(frame)
        np.asarray(prob[:1, :1, :1])  # forced fetch (block can return early)
        times.append(time.perf_counter() - t0)

    warm = times[12:]
    print("first-frame:", round(times[0], 3), "s")
    print("per-frame (last 12):", [round(t, 3) for t in warm])
    print("avg warm per-frame: %.1f ms" % (1000 * np.mean(warm)))
    total = sum(times[12:])
    for k, v in sorted(acc.items()):
        print(f"  {k:14s} cumulative {v:.2f}s")


if __name__ == "__main__":
    main()
