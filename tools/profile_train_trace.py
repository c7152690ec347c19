"""Device-trace profile of the jitted training step (where do the ms go?).

Captures a jax.profiler trace of two warm main-training steps at the
production shapes (batch 2, T=8, 480x480, 3 objects, bf16+remat) and
prints an op-class breakdown from the trace-viewer JSON: total device
time, achieved TFLOP/s and HBM GB/s, top individual ops, and the
flop-efficiency histogram.

Findings on one v5e (2026-08-20, round 5 — post matmul-stem (e8ebb23/
475265b) + gather-free point supervision (6967831) rewrites; supersedes
the round-2 533 ms/22.7 TF/s block):
  - 304 ms/step device (341 ms wall warm, tools/profile_train.py; fp32:
    426 ms); 47.6 TFLOP/s achieved (~24% of bf16 peak) at 779 GB/s HBM
    (~95% of the 819 GB/s roofline) -> the step is now effectively
    HBM-BOUND; training MFU is formally retired as a lever (VERDICT r4
    #3): 2x more would require activation-traffic reduction (wider
    fusion/remat policy), not better matmuls.
  - zero-FLOP share is down from 53% to 37%: 65 ms/step layout copies +
    21 ms reshapes (the remaining fold/unfold seams around the matmul
    stems and grouped convs); the point-supervision scatter/sort block
    is gone from the top-op list.
  - FLOP ops: 70 ms/step >=100 TF/s (the big matmul/conv fusions) vs
    71 ms below 10 TF/s — the tail is the T=8 BPTT while-loop bodies on
    [*, 8192]-token attention shapes (6 x ~3 ms visible as while.6x).
  Projection (main training, 125k iters, global batch 16 = 8 chips x 2):
  11.8 h bf16 / 14.8 h fp32 vs the reference's ~30 h both-stage budget
  on 4xA100 (docs/TRAINING.md:62).
"""
import collections
import glob
import gzip
import json
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

TRACE_DIR = "/tmp/cutie_tpu_train_trace"


def capture(batch=2, t=8, hw=480, o=3):
    from profile_train import make_data

    from cutie_tpu.config import Config, eval_config
    from cutie_tpu.models import CUTIE
    from cutie_tpu.training.trainer import Trainer
    from cutie_tpu.utils.get_default_model import init_variables

    cfg = eval_config("base")
    stage = Config({
        "name": "main_training", "amp": True, "num_iterations": 125000,
        "learning_rate": 1e-4, "lr_schedule": "step",
        "lr_schedule_steps": [100000, 115000], "lr_schedule_gamma": 0.1,
        "point_supervision": True, "train_num_points": 12544,
        "oversample_ratio": 3.0, "importance_sample_ratio": 0.75,
        "clip_grad_norm": 3.0, "weight_decay": 0.001,
        "embed_weight_decay": 0.0, "backbone_lr_ratio": 0.1,
        "num_ref_frames": 3, "seq_length": t, "remat": True,
        "num_objects": o, "deep_update_prob": 0.2, "crop_size": [hw, hw],
    })
    model = CUTIE(cfg, dtype=jnp.bfloat16)
    variables = init_variables(model, image_size=64, num_objects=o)
    trainer = Trainer(cfg=cfg, stage_cfg=stage, model=model,
                      variables=variables)
    data = jax.device_put(make_data(batch, t, hw, o))
    jax.block_until_ready(data["frames"])
    losses = trainer.do_pass(data, 0, jax.random.PRNGKey(0))
    float(losses["total_loss"])  # forced fetch (block can return early)
    print("warm; tracing 2 steps ...", flush=True)
    jax.profiler.start_trace(TRACE_DIR)
    for i in range(1, 3):
        losses = trainer.do_pass(data, i, jax.random.PRNGKey(i))
    float(losses["total_loss"])  # forced fetch (block can return early)
    jax.profiler.stop_trace()


def summarize(trace_dir: str = TRACE_DIR, n_steps: int = 2):
    paths = sorted(glob.glob(
        os.path.join(trace_dir, "plugins/profile/*/*.trace.json.gz")))
    if not paths:
        print("no trace found under", trace_dir)
        return
    data = json.load(gzip.open(paths[-1]))
    events = data.get("traceEvents", [])
    pids, tids = {}, {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tids[(e["pid"], e["tid"])] = e["args"].get("name", "")
    tpu = [p for p, n in pids.items() if "TPU" in n]
    if not tpu:
        print("no TPU pid in trace")
        return
    ops = [e for e in events
           if e.get("ph") == "X" and e.get("pid") == tpu[0]
           and tids.get((e["pid"], e["tid"])) == "XLA Ops"]
    total = sum(e["dur"] for e in ops)
    flops = sum(int(e.get("args", {}).get("model_flops", 0) or 0)
                for e in ops)
    byt = sum(int(e.get("args", {}).get("raw_bytes_accessed", 0) or 0)
              for e in ops)
    print(f"device time {total / 1e3:.0f} ms ({n_steps} steps, "
          f"{total / 1e3 / n_steps:.2f} ms/step) | "
          f"{flops / (total / 1e6) / 1e12:.1f} TFLOP/s | "
          f"{byt / (total / 1e6) / 1e9:.0f} GB/s")

    agg = {}
    for e in ops:
        a = e.get("args", {})
        v = agg.setdefault(e["name"], [0, 0, a.get("long_name", "")[:110]])
        v[0] += e["dur"]
        v[1] += int(a.get("model_flops", 0) or 0)
    flop_t = sum(v[0] for v in agg.values() if v[1] > 0)
    print(f"flop-op time {flop_t / 1e3:.0f} ms | "
          f"zero-flop-op time {(total - flop_t) / 1e3:.0f} ms "
          f"({(total - flop_t) / total * 100:.0f}%)")

    # category breakdown of the ZERO-flop time (where the copy tax lives)
    def category(name, long_name):
        base = name.lstrip("%").split(".")[0]
        if base in ("copy", "copy-start", "copy-done"):
            return "copy"
        if base in ("transpose", "bitcast", "reshape"):
            return base
        if base in ("convert",):
            return "convert"
        if base.startswith(("all-reduce", "all-gather", "collective")):
            return "collective"
        if base in ("gather", "scatter", "dynamic-slice",
                    "dynamic-update-slice", "select-and-scatter"):
            return "gather/scatter"
        if base in ("while", "conditional", "sort", "rng-bit-generator"):
            return base
        if base == "fusion":
            ln = long_name or ""
            for kw, cat in (("transpose(", "fused-transpose"),
                            ("copy(", "fused-copy"),
                            ("gather(", "fused-gather"),
                            ("scatter(", "fused-scatter"),
                            ("sort(", "fused-sort")):
                if kw in ln:
                    return cat
            return "fusion(other)"
        return base
    zf = collections.Counter()
    for n, (d, f, ln) in agg.items():
        if f == 0:
            zf[category(n, ln)] += d
    for cat, d in zf.most_common(12):
        print(f"  zero-flop {cat}: {d / 1e3:.0f} ms")
    buckets = collections.Counter()
    for _, (d, f, _) in agg.items():
        if f > 0:
            tfs = f / (d / 1e6) / 1e12
            b = ("<10 TF/s" if tfs < 10 else "<50 TF/s" if tfs < 50
                 else "<100 TF/s" if tfs < 100 else ">=100 TF/s")
            buckets[b] += d
    for k in ("<10 TF/s", "<50 TF/s", "<100 TF/s", ">=100 TF/s"):
        print(f"  flop-ops {k}: {buckets.get(k, 0) / 1e3:.0f} ms")
    print("top ops:")
    for n, (d, f, ln) in sorted(agg.items(), key=lambda kv: -kv[1][0])[:12]:
        print(f"  {d / 1e3:7.2f} ms  {ln or n}")


if __name__ == "__main__":
    capture()
    summarize()
