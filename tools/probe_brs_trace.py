"""Device-trace ONLY the BRS head eval + grad eval (where do 39/160 ms go?).

Usage: python tools/probe_brs_trace.py [head_low|loss_grad|backbone]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/cutie_tpu_jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

TRACE_DIR = "/tmp/cutie_tpu_brs_probe_trace"
N = 10


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "head_low"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    sys.path.insert(0, os.path.join(repo, "tools"))
    import importlib
    bench = importlib.import_module("bench")
    from profile_train_trace import summarize

    from cutie_tpu.ritm.utils import ClickController

    H, W = bench.H, bench.W
    ctrl = ClickController(None)
    frame = bench.synth_video(1, H, W)[0][0]
    image = np.transpose(frame, (2, 0, 1)).astype(np.float32) / 255.0
    ctrl.interact(image, W // 3, H // 3, True)
    for i in range(3):
        ctrl.interact(image, W // 3 + 10 * (i + 1), H // 3, i % 2 == 0)

    pred = ctrl.controller.predictor
    feats = pred.input_data
    var = pred.variables
    x = jnp.asarray(np.asarray(pred.opt_data))
    bs = 1
    low = pred._head_low(var, feats, x, bs=bs)
    hp, wp = low.shape[1] * 4, low.shape[2] * 4
    pos = jnp.zeros((2, hp, wp), jnp.float32).at[:, 100:103, 100:103].set(1.0)
    neg = jnp.zeros((2, hp, wp), jnp.float32).at[:, 200:203, 200:203].set(1.0)

    if which == "head_low":
        run = lambda: pred._head_low(var, feats, x, bs=bs)
    elif which == "loss_grad":
        run = lambda: pred._loss_grad(var, feats, pos, neg, x,
                                      out_h=hp, out_w=wp, bs=bs)
    else:
        rgb, msk, pts, wd = pred._last_flip_args  # may not exist
        run = lambda: pred._head_input_flip(var, rgb, msk, pts, wd)

    out = run()
    jax.tree.map(np.asarray, out)
    print(f"tracing {N} x {which} ...", flush=True)
    jax.profiler.start_trace(TRACE_DIR)
    t0 = time.perf_counter()
    for _ in range(N):
        out = run()
    jax.tree.map(np.asarray, out)
    wall = time.perf_counter() - t0
    jax.profiler.stop_trace()
    print(f"wall {wall / N * 1e3:.2f} ms/call")
    summarize(TRACE_DIR, n_steps=N)


if __name__ == "__main__":
    main()
