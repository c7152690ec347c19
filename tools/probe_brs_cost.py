"""Split the warm-click device cost: backbone vs head-eval vs L-BFGS driver.

Times (forced-fetch, median of 5):
  - _head_input_flip (HRNet backbone + aggregation, runs once per click)
  - _loss_grad (ONE objective value+grad eval at full maxfun cost shape)
  - _device_brs at maxfun=1 vs maxfun=20 (driver fixed overhead vs per-eval)

Usage: python tools/probe_brs_cost.py
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


def timed(fn, n=5):
    fn()  # warm
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        jax.tree.map(lambda a: np.asarray(a) if hasattr(a, "shape") else a, out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts) * 1e3)


def main():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    import importlib
    bench = importlib.import_module("bench")
    from cutie_tpu.ritm.utils import ClickController

    H, W = bench.H, bench.W
    ctrl = ClickController(None)
    frame = bench.synth_video(1, H, W)[0][0]
    image = np.transpose(frame, (2, 0, 1)).astype(np.float32) / 255.0

    # drive real clicks so predictor caches (input_data/opt_data) are hot
    ctrl.interact(image, W // 3, H // 3, True)
    for i in range(3):
        ctrl.interact(image, W // 3 + 10 * (i + 1), H // 3, i % 2 == 0)

    pred = ctrl.controller.predictor
    print("predictor:", type(pred).__name__, flush=True)
    feats = pred.input_data
    var = pred.variables
    x = jnp.asarray(np.asarray(pred.opt_data))
    bs = 1
    # shapes from the last click (zoom-in crop, padded)
    from cutie_tpu.ritm.inference import pad_hw
    t = pred.transforms[-1] if pred.transforms else None
    # recover out_h/out_w the same way _run_model does
    # use the low-res logits shape: feats is the head input
    print("feats:", jax.tree.map(lambda a: a.shape, feats), flush=True)

    # out_h/out_w: probe from a head_low call
    low = pred._head_low(var, feats, x, bs=bs)
    hp4, wp4 = low.shape[1], low.shape[2]
    hp, wp = hp4 * 4, wp4 * 4
    print(f"low-res {low.shape} -> padded {hp}x{wp}", flush=True)

    t_head_low = timed(lambda: pred._head_low(var, feats, x, bs=bs))
    print(f"_head_low (1 head eval, no grad): {t_head_low:.1f} ms", flush=True)

    pos = jnp.zeros((2, hp, wp), jnp.float32).at[:, 100:103, 100:103].set(1.0)
    neg = jnp.zeros((2, hp, wp), jnp.float32).at[:, 200:203, 200:203].set(1.0)
    t_lossgrad = timed(lambda: pred._loss_grad(
        var, feats, pos, neg, x, out_h=hp, out_w=wp, bs=bs))
    print(f"_loss_grad (1 eval + grad): {t_lossgrad:.1f} ms", flush=True)

    map_pts = jnp.asarray(
        np.array([[[100.0, 100.0, 0.0], [200.0, 200.0, 0.0]]], np.float32))
    for mf in (1, 2, 5, 20):
        t_brs = timed(lambda mf=mf: pred._device_brs(
            var, feats, map_pts, x, out_h=hp, out_w=wp, bs=bs, maxfun=mf))
        print(f"_device_brs maxfun={mf:2d}: {t_brs:.1f} ms", flush=True)

    # backbone rerun
    rgb = pred._rgb_cache[1] if hasattr(pred, "_rgb_cache") else None
    print("timing head_input_flip via a fresh click:", flush=True)
    t0 = time.perf_counter()
    ctrl.interact(image, W // 3 + 77, H // 3, True)
    print(f"full extra click: {(time.perf_counter() - t0) * 1e3:.1f} ms",
          flush=True)


if __name__ == "__main__":
    main()
