"""End-to-end read-backend comparison: full InferenceCore streaming.

The microbenchmark (tools/bench_pallas.py) isolates the read chain; this
tool measures what actually matters — the per-frame fused-step time with
each backend inside the production graph — on the non-LT (d17, N ~ 8k
tokens) and long-term (lvos, N ~ 28k tokens) configurations. The auto
thresholds in inference/steps.py are set from THESE numbers.

Single process (tunnel latency comparable across combos); median per-frame
step time + eval-style FPS per (config, backend).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/cutie_tpu_jax_cache")

import jax
import numpy as np

jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import bench as B
from cutie_tpu.config import eval_config, get_dataset_cfg
from cutie_tpu.inference import InferenceCore
from cutie_tpu.utils.get_default_model import build_model


def run_combo(bundle, frames, mask0, dataset, backend):
    cfg = eval_config("base")
    cfg.dataset = dataset
    get_dataset_cfg(cfg)
    cfg.max_internal_size = -1
    cfg.read_backend = backend
    core = InferenceCore(bundle, cfg)
    B.run_video(core, frames, mask0, timed=False)  # warm every graph
    core = InferenceCore(bundle, cfg)
    times, _ = B.run_video(core, frames, mask0, timed=True)
    med = float(np.median(times)) * 1000
    fps = len(times) / sum(times)
    return med, fps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--backends", default="dense,radix,pallas")
    ap.add_argument("--datasets", default="d17-val,lvos-val")
    args = ap.parse_args()

    cfg = eval_config("base")
    cfg.dataset = "d17-val"
    get_dataset_cfg(cfg)
    bundle = build_model(cfg, weights=None)
    frames, mask0 = B.synth_video(args.frames, B.H, B.W)

    for dataset in args.datasets.split(","):
        for backend in args.backends.split(","):
            try:
                med, fps = run_combo(bundle, frames, mask0, dataset, backend)
                print(f"{dataset:10s} {backend:7s}  median {med:7.2f} ms/frame"
                      f"   {fps:7.1f} fps", flush=True)
            except Exception as e:
                print(f"{dataset:10s} {backend:7s}  FAILED "
                      f"{type(e).__name__}: {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
