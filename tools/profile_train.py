"""Measure the jitted training step on the real device: fp32 vs bf16 (amp).

Reproduces the PARITY.md projection methodology: main-training shapes
(per-chip batch 2, T=8, 480x480, 3 objects, remat), reference recipe = 125k
iters at global batch 16 => 8 chips x batch 2.

Usage: python tools/profile_train.py [--dtype fp32|bf16|both] [--batch 2]
"""
import argparse
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


def make_data(b, t, hw, o, seed=0):
    rng = np.random.default_rng(seed)
    cls_gt = rng.integers(0, o + 1, size=(b, t, hw, hw))
    first_gt = np.moveaxis(np.eye(o + 1, dtype=np.float32)[cls_gt[:, 0]], -1, 1)[:, 1:]
    return {
        "frames": rng.uniform(size=(b, t, hw, hw, 3)).astype(np.float32),
        "first_frame_gt": first_gt,
        "selector": np.ones((b, o), np.float32),
        "cls_gt": cls_gt.astype(np.uint8),
    }


def profile(amp: bool, batch: int, t: int, hw: int, o: int, steps: int = 10,
            remat: bool = True):
    from cutie_tpu.config import Config, eval_config
    from cutie_tpu.models import CUTIE
    from cutie_tpu.training.trainer import Trainer
    from cutie_tpu.utils.get_default_model import init_variables

    cfg = eval_config("base")
    stage = Config({
        "name": "main_training", "amp": amp, "num_iterations": 125000,
        "learning_rate": 1e-4, "lr_schedule": "step",
        "lr_schedule_steps": [100000, 115000], "lr_schedule_gamma": 0.1,
        "point_supervision": True, "train_num_points": 12544,
        "oversample_ratio": 3.0, "importance_sample_ratio": 0.75,
        "clip_grad_norm": 3.0, "weight_decay": 0.001,
        "embed_weight_decay": 0.0, "backbone_lr_ratio": 0.1,
        "num_ref_frames": 3, "seq_length": t, "remat": remat,
        "num_objects": o, "deep_update_prob": 0.2, "crop_size": [hw, hw],
    })
    dtype = jnp.bfloat16 if amp else jnp.float32
    model = CUTIE(cfg, dtype=dtype)
    variables = init_variables(model, image_size=64, num_objects=o)
    trainer = Trainer(cfg=cfg, stage_cfg=stage, model=model, variables=variables)

    data = make_data(batch, t, hw, o)
    # pre-upload the batch: the tunnel H2D of ~90MB/step would otherwise
    # dominate the measurement (production runs prefetch H2D behind compute)
    data = jax.device_put(data)
    jax.block_until_ready(data["frames"])
    tag = "bf16" if amp else "fp32"
    t0 = time.perf_counter()
    losses = trainer.do_pass(data, 0, jax.random.PRNGKey(0))
    jax.block_until_ready(losses["total_loss"])
    print(f"[{tag}] compile+first step: {time.perf_counter() - t0:.1f}s "
          f"loss={float(losses['total_loss']):.3f}")

    times = []
    for i in range(1, steps + 1):
        t0 = time.perf_counter()
        losses = trainer.do_pass(data, i, jax.random.PRNGKey(i))
        float(losses["total_loss"])  # forced fetch (block can return early)
        times.append(time.perf_counter() - t0)
    med = float(np.median(times))
    print(f"[{tag}] warm step: median {med * 1000:.0f} ms "
          f"(min {min(times) * 1000:.0f}, max {max(times) * 1000:.0f}) "
          f"loss={float(losses['total_loss']):.3f}")
    # reference recipe projection: 125k iters, global batch 16 on 8 chips
    # (per-chip batch `batch`): scale per-step time by (16/8)/batch
    proj_h = med * (16 / 8 / batch) * 125000 / 3600
    print(f"[{tag}] projected main-training wall-clock on 8 chips: "
          f"{proj_h:.1f} h (reference both-stage budget ~30 h on 4xA100)")
    return med


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="both", choices=["fp32", "bf16", "both"])
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--seq", type=int, default=8)
    ap.add_argument("--size", type=int, default=480)
    ap.add_argument("--objects", type=int, default=3)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--no-remat", action="store_true")
    args = ap.parse_args()

    meds = {}
    if args.dtype in ("fp32", "both"):
        meds["fp32"] = profile(False, args.batch, args.seq, args.size,
                               args.objects, args.steps,
                               remat=not args.no_remat)
    if args.dtype in ("bf16", "both"):
        meds["bf16"] = profile(True, args.batch, args.seq, args.size,
                               args.objects, args.steps,
                               remat=not args.no_remat)
    if len(meds) == 2:
        print(f"bf16 speedup: {meds['fp32'] / meds['bf16']:.2f}x")


if __name__ == "__main__":
    main()
