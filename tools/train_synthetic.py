"""Train cutie-base on a synthetic moving-shapes VOS task (real TPU), then
export the weights in the reference torch naming.

This provides TRAINED weights for the 480p parity gate (VERDICT r2 #1): the
released cutie-base-mega.pth is unreachable from this zero-egress environment
(DNS failure for github.com), and random-statistics weights produce chaotic
masks whose feedback amplifies fp noise — per-object IoU between
implementations is only meaningful once the model actually tracks. After
~1000 steps on this task the model tracks the synth_frames_480 clip with
crisp masks, so implementation divergence shows up as IoU loss instead of
being drowned in chaos.

Outputs:
  tests/golden/state_dict_base_trained.npz  — torch-naming, fp16-rounded
      (both sides load identical values; fp32 compute), via
      utils/weight_import.export_torch_state_dict.

Usage: python tools/train_synthetic.py [--steps 1000] [--size 384] [--amp]
"""
import argparse
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def synth_batch(rng: np.random.Generator, b: int, t: int, h: int, w: int,
                n_obj: int = 3):
    """Random moving/growing rectangles over a textured background — the
    train-time distribution generalizing synth_frames_480 (same palette
    family, randomized geometry/velocity/growth)."""
    frames = np.empty((b, t, h, w, 3), np.float32)
    cls_gt = np.zeros((b, t, h, w), np.int64)
    for bi in range(b):
        bg = rng.uniform(0.2, 0.5, size=(h, w, 3)).astype(np.float32)
        geo = []
        for oi in range(n_obj):
            sz = rng.integers(h // 8, h // 3)
            geo.append({
                "y": rng.integers(0, h - sz), "x": rng.integers(0, w - sz),
                "hs": sz, "ws": rng.integers(h // 8, h // 3),
                "vy": rng.integers(-6, 7), "vx": rng.integers(-6, 7),
                "g": rng.integers(-3, 4) if oi == n_obj - 1 else 0,
                "color": rng.uniform(0.0, 1.0, size=3) ** 0.5,
            })
        for ti in range(t):
            f = bg.copy()
            m = np.zeros((h, w), np.int64)
            for oi, g in enumerate(geo):
                hs = max(4, g["hs"] + ti * g["g"])
                ws = max(4, g["ws"] + ti * g["g"])
                y = int(np.clip(g["y"] + ti * g["vy"], -hs + 4, h - 4))
                x = int(np.clip(g["x"] + ti * g["vx"], -ws + 4, w - 4))
                y0, x0 = max(y, 0), max(x, 0)
                y1, x1 = min(y + hs, h), min(x + ws, w)
                f[y0:y1, x0:x1] = g["color"]
                m[y0:y1, x0:x1] = oi + 1
            frames[bi, ti] = np.round(f * 255.0) / 255.0
            cls_gt[bi, ti] = m
    eye = np.eye(n_obj + 1, dtype=np.float32)
    first_gt = np.moveaxis(eye[cls_gt[:, 0]], -1, 1)[:, 1:]  # [b,o,h,w]
    return {"frames": frames, "first_frame_gt": first_gt,
            "selector": np.ones((b, n_obj), np.float32),
            "cls_gt": cls_gt.astype(np.uint8)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--size", type=int, default=384)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--seq", type=int, default=8)
    ap.add_argument("--amp", action="store_true", default=True)
    ap.add_argument("--no-amp", dest="amp", action="store_false")
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=str(REPO / "tests/golden/state_dict_base_trained.npz"))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from cutie_tpu.config import Config, eval_config
    from cutie_tpu.models import CUTIE
    from cutie_tpu.training.trainer import Trainer
    from cutie_tpu.utils.get_default_model import init_variables
    from cutie_tpu.utils.weight_import import export_torch_state_dict

    cfg = eval_config("base")
    stage = Config({
        "name": "synthetic", "amp": args.amp,
        "num_iterations": args.steps, "learning_rate": args.lr,
        "lr_schedule": "step", "lr_schedule_steps": [int(args.steps * 0.8)],
        "lr_schedule_gamma": 0.1,
        "point_supervision": True, "train_num_points": 4096,
        "oversample_ratio": 3.0, "importance_sample_ratio": 0.75,
        "clip_grad_norm": 3.0, "weight_decay": 0.001,
        "embed_weight_decay": 0.0, "backbone_lr_ratio": 0.1,
        "num_ref_frames": 3, "seq_length": args.seq,
        "num_objects": 3, "deep_update_prob": 0.2,
    })
    model = CUTIE(cfg, dtype=jnp.bfloat16 if args.amp else jnp.float32)
    variables = init_variables(model, image_size=args.size, num_objects=3)
    trainer = Trainer(cfg=cfg, stage_cfg=stage, model=model, variables=variables)

    rng = np.random.default_rng(args.seed)
    t0 = time.perf_counter()
    for it in range(args.steps):
        data = synth_batch(rng, args.batch, args.seq, args.size, args.size)
        out = trainer.do_pass(data, it, jax.random.PRNGKey(args.seed * 100003 + it))
        if it % 25 == 0 or it == args.steps - 1:
            print(f"it {it:5d}  total_loss {float(out['total_loss']):.4f}  "
                  f"({time.perf_counter() - t0:.0f}s)", flush=True)

    variables = {"params": jax.device_get(trainer.params),
                 "batch_stats": jax.device_get(
                     trainer.variables.get("batch_stats", {}))}
    sd = export_torch_state_dict(variables)
    sd16 = {k: np.asarray(v, np.float16) if np.asarray(v).dtype == np.float32
            else np.asarray(v) for k, v in sd.items()}
    np.savez_compressed(args.out, **sd16)
    print(f"wrote {args.out} ({len(sd16)} keys)")


if __name__ == "__main__":
    main()
