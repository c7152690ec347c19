"""End-to-end read-backend comparison: full InferenceCore streaming.

Measures the per-frame SUSTAINED cost of the fused step with each top-k
read backend inside the production graph, on the non-LT (d17, N ~ 8k
tokens) and long-term (lvos, N ~ 28k tokens) configurations.

Timing is honest-throughput (see bench.py): free-run the frame loop and
force completion by fetching from the final output — over the dev tunnel
`jax.block_until_ready` returns before remote execution finishes, and a
round-1/2 version of this tool that trusted it concluded "dense is
fastest in-graph" at 1.7 ms/frame while the device was really spending
~16 ms/frame (half of it in the bitonic-sort top-k). The honest numbers
(one v5e, 2026-08): d17 dense 16.1 ms/frame vs radix 8.0; these set the
auto thresholds in inference/steps.py.
"""
import argparse
import os
import sys
import time

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


def run_combo(bundle, frames, dev_frames, mask0, dataset, backend, amp):
    cfg = eval_config("base")
    cfg.dataset = dataset
    get_dataset_cfg(cfg)
    cfg.max_internal_size = -1
    cfg.read_backend = backend
    cfg.amp = amp
    core = InferenceCore(bundle, cfg)
    B.run_video(core, frames, mask0)  # warm every graph
    core = InferenceCore(bundle, cfg)
    return B.measure_throughput(core, dev_frames, mask0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--backends", default="dense,radix,pallas")
    ap.add_argument("--datasets", default="d17-val,lvos-val")
    ap.add_argument("--amp", action="store_true")
    args = ap.parse_args()

    cfg = eval_config("base")
    cfg.dataset = "d17-val"
    get_dataset_cfg(cfg)
    cfg.amp = args.amp
    bundle = build_model(cfg, weights=None)
    frames, mask0 = B.synth_video(args.frames, B.H, B.W)
    dev_frames = [jax.device_put(f) for f in frames]
    jax.block_until_ready(dev_frames[-1])

    for dataset in args.datasets.split(","):
        for backend in args.backends.split(","):
            try:
                ms, fps = run_combo(bundle, frames, dev_frames, mask0,
                                    dataset, backend, args.amp)
                print(f"{dataset:10s} {backend:7s}"
                      f"{' amp' if args.amp else '    '}  "
                      f"{ms:7.2f} ms/frame   {fps:7.1f} fps", flush=True)
            except Exception as e:
                print(f"{dataset:10s} {backend:7s}  FAILED "
                      f"{type(e).__name__}: {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
