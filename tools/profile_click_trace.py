"""Per-click breakdown of the warm RITM interactive path (VERDICT r2 #2).

Runs bench.py's exact click sequence warm, then (a) wall-times each
interact() with a phase breakdown (transform/upload/dispatch/fetch) via
lightweight monkeypatch probes, and (b) captures a jax.profiler device
trace of one warm click to split device-busy vs host/dispatch time.

Usage: python tools/profile_click_trace.py

FINDINGS (2026-08-20, round 5, one v5e over the dev tunnel — this tool +
a NoBRS control trace + cProfile of the NoBRS pass):
  f-BRS-B warm click (bench default): median 315-340 ms wall.
    - device:  ~217 ms/click traced — BRS L-BFGS while-loops (~110 ms:
      ~25 head re-evals on [2,16,27,270] ROI features, each a chain of
      tiny latency-bound convs, plus optax two-loop math on [540]) + HRNet
      backbone/head convs (~70 ms at <10 TF/s — 16x27 spatial with 18-144
      channels barely fills the MXU).
  NoBRS control: median ~200-300 ms wall, device only 13.9 ms/click:
    - ~125 ms/click = the ONE blocking D2H fetch (jax _value wait:
      200 KB low-res logits + remote execution + tunnel RTT; a bare
      dispatch+200KB-fetch microbench costs 28-33 ms RTT, the rest is
      remote queue/exec wait),
    - ~50 ms/click = host transforms (ZoomIn crop+resize ~18, split-upload
      ~12, torch bilinear up ~10, inverse transforms ~5).
  CONCLUSION: the warm click over the dev tunnel is TRANSPORT-bound
  (fetch wait + host), not compute-bound; the <150 ms target (VERDICT
  r3 #6) is reachable only on a directly-attached host (fetch ~1 ms:
  NoBRS ~=65 ms, f-BRS-B ~=150 ms with the BRS loop the next lever —
  its serial L-BFGS math and tiny-conv head re-evals are the remaining
  device cost ranked first for any future pass).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/cutie_tpu_jax_cache")

import jax
import numpy as np

jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

TRACE_DIR = "/tmp/cutie_tpu_click_trace"


def main():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    import importlib
    bench = importlib.import_module("bench")
    from cutie_tpu.ritm import brs as brs_mod
    from cutie_tpu.ritm.utils import ClickController

    H, W = bench.H, bench.W
    ctrl = ClickController(None)
    frame = bench.synth_video(1, H, W)[0][0]
    image = np.transpose(frame, (2, 0, 1)).astype(np.float32) / 255.0

    # probe: count + time _device_brs and head dispatches per click
    pred_holder = {}

    def wrap(obj, name, stats):
        fn = getattr(obj, name)

        def wrapped(*a, **k):
            t0 = time.perf_counter()
            out = fn(*a, **k)
            jax.block_until_ready(out)
            stats.setdefault(name, []).append(time.perf_counter() - t0)
            return out
        setattr(obj, name, wrapped)

    def click_pass(label, n_clicks=5, probe=False):
        ctrl.unanchor()
        ctrl.interact(image, W // 3, H // 3, True)
        stats = {}
        if probe:
            pred = ctrl.controller.predictor
            pred_holder["pred"] = pred
            for nm in ("_device_brs", "_head_low", "_head_input_flip",
                       "_head_input"):
                if getattr(pred, nm, None) is not None:
                    wrap(pred, nm, stats)
        lat = []
        for i in range(n_clicks):
            t0 = time.perf_counter()
            out = ctrl.interact(image, W // 3 + 10 * (i + 1), H // 3,
                                i % 2 == 0)
            np.asarray(out)
            lat.append(time.perf_counter() - t0)
        print(f"{label}: per-click ms {[f'{x * 1e3:.0f}' for x in lat]} "
              f"median {np.median(lat) * 1e3:.1f}")
        for nm, ts in stats.items():
            print(f"  {nm}: n={len(ts)} total={sum(ts) * 1e3:.1f} ms "
                  f"each={[f'{x * 1e3:.0f}' for x in ts]}")
        return lat

    click_pass("warmup (compiles)")
    click_pass("warm, probed", probe=True)

    # device trace of one more warm pass
    jax.profiler.start_trace(TRACE_DIR)
    t0 = time.perf_counter()
    click_pass("traced", n_clicks=3)
    wall = time.perf_counter() - t0
    jax.profiler.stop_trace()
    print(f"traced-pass wall {wall * 1e3:.0f} ms (incl. anchor click)")
    from profile_train_trace import summarize
    sys.path.insert(0, os.path.join(repo, "tools"))
    summarize(TRACE_DIR, n_steps=4)  # anchor + 3 clicks


if __name__ == "__main__":
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__))))
    main()
