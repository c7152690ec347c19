"""Two-stage training entry point.

Behavioral parity target: reference cutie/train.py:37-170 — pre_training
(static images) then main_training (VOS) with in-memory weight hand-off,
per-stage seeding, the max_skip curriculum that rebuilds the loader
mid-training, periodic weight/checkpoint saving with a crash-save guard.

Distribution: jax.distributed.initialize() for multi-host (replaces
torchrun/NCCL env plumbing, cutie/train.py:19-29); the train step runs under
a `data` mesh.

Usage:
    python -m cutie_tpu.train exp_id=first data.vos_datasets.base=... [overrides]
"""
from __future__ import annotations

import logging
import os
import sys
from os import path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/cutie_tpu_jax_cache")

import jax
import numpy as np

from cutie_tpu.config import Config, eval_config, model_base, model_small
from cutie_tpu.utils.log_integrator import Integrator
from cutie_tpu.utils.logger import TensorboardLogger
from cutie_tpu.utils.time_estimator import TimeEstimator

log = logging.getLogger("train")


# package-relative subset/empty-mask index files (reference cutie/utils/subsets/)
_SUBSETS = path.join(path.dirname(path.abspath(__file__)), "utils", "subsets")


def _subset(name: str) -> str:
    return path.join(_SUBSETS, name)


# data presets (reference cutie/config/data/{base,with-mose,mega}.yaml):
# each sets the main-training dataset mix + iteration schedule
DATA_PRESETS = {
    "base": {"datasets": ["DAVIS", "YouTubeVOS"],
             "num_iterations": 125000, "lr_schedule_steps": [100000, 115000]},
    "with-mose": {"datasets": ["DAVIS", "YouTubeVOS", "MOSE"],
                  "num_iterations": 125000,
                  "lr_schedule_steps": [100000, 115000]},
    "mega": {"datasets": ["DAVIS", "YouTubeVOS", "MOSE", "BURST", "OVIS"],
             "num_iterations": 175000,
             "lr_schedule_steps": [140000, 160000]},
}


def apply_data_preset(cfg: Config, preset: str) -> None:
    """Overlay a data preset onto cfg (hydra `data=<preset>` group semantics:
    the group writes into main_training's schedule, cutie/config/data/mega.yaml)."""
    p = DATA_PRESETS[preset]
    cfg.data.main_training.merge({"datasets": list(p["datasets"]),
                                  "num_iterations": p["num_iterations"],
                                  "lr_schedule_steps": list(p["lr_schedule_steps"])})
    cfg.main_training.merge({"num_iterations": p["num_iterations"],
                             "lr_schedule_steps": list(p["lr_schedule_steps"])})


def train_config() -> Config:
    """Mirrors reference cutie/config/train_config.yaml + data/base.yaml."""
    return Config({
        "model": model_base(),
        "exp_id": "default",
        "debug": False,
        "weights": None,
        "checkpoint": None,
        "seed": 14159265,
        "num_workers": 16,
        "single_object_pretraining": True,
        "log_text_interval": 100,
        "log_image_interval": 1500,
        "save_weights_interval": 10000,
        "save_checkpoint_interval": 10000,
        "data": {
            "image_datasets": {
                "base": "../static",
                "FSS": {"directory": "fss", "data_structure": 0, "multiplier": 1},
                "DUTS_TR": {"directory": "DUTS-TR", "data_structure": 1, "multiplier": 1},
                "DUTS_TE": {"directory": "DUTS-TE", "data_structure": 1, "multiplier": 1},
                "ECSSD": {"directory": "ecssd", "data_structure": 1, "multiplier": 1},
                "BIG": {"directory": "BIG_small", "data_structure": 1, "multiplier": 5},
                "HRSOD": {"directory": "HRSOD_small", "data_structure": 1, "multiplier": 5},
            },
            "preset": "base",
            "vos_datasets": {
                # full registry, reference cutie/config/data/datasets.yaml:28-80
                "base": "../",
                "DAVIS": {
                    "image_directory": "DAVIS/2017/trainval/JPEGImages/480p",
                    "mask_directory": "DAVIS/2017/trainval/Annotations/480p",
                    "multiplier": 2, "frame_interval": 2,
                    "subset": _subset("davis_train.txt"),
                    "empty_masks": _subset("davis_empty_masks.txt"),
                },
                "YouTubeVOS": {
                    "image_directory": "YouTube/train/JPEGImages",
                    "mask_directory": "YouTube/train/Annotations",
                    "multiplier": 1, "frame_interval": 5,
                    "subset": _subset("yv_train.txt"),
                    "empty_masks": _subset("yv_empty_masks.txt"),
                },
                "MOSE": {
                    "image_directory": "MOSE/train/JPEGImages",
                    "mask_directory": "MOSE/train/Annotations",
                    "multiplier": 1, "frame_interval": 5,
                    "subset": None,
                    "empty_masks": _subset("mose_empty_masks.txt"),
                },
                "BURST": {
                    "image_directory": "BURST/train-vos/JPEGImages",
                    "mask_directory": "BURST/train-vos/Annotations",
                    "multiplier": 1, "frame_interval": 5,
                    "subset": None,
                    "empty_masks": _subset("burst_empty_masks.txt"),
                },
                "OVIS": {
                    "image_directory": "OVIS-VOS-train/JPEGImages",
                    "mask_directory": "OVIS-VOS-train/Annotations",
                    "multiplier": 1, "frame_interval": 3,
                    "subset": None,
                    "empty_masks": _subset("ovis_empty_masks.txt"),
                },
            },
            "pre_training": {"datasets": ["FSS", "DUTS_TR", "DUTS_TE", "ECSSD",
                                          "BIG", "HRSOD"]},
            "main_training": {"datasets": ["DAVIS", "YouTubeVOS"],
                              "num_iterations": 125000,
                              "lr_schedule_steps": [100000, 115000]},
        },
        "pre_training": {
            "name": "pre_training", "enabled": True, "batch_size": 16,
            "amp": False, "num_iterations": 80000, "learning_rate": 1e-4,
            "lr_schedule": "constant", "point_supervision": True,
            "train_num_points": 8192, "oversample_ratio": 3.0,
            "importance_sample_ratio": 0.75, "clip_grad_norm": 3.0,
            "weight_decay": 0.001, "embed_weight_decay": 0.0,
            "backbone_lr_ratio": 0.1, "num_ref_frames": 2, "seq_length": 3,
            "remat": True,
            "num_objects": 1, "deep_update_prob": 0.2, "crop_size": [384, 384],
            "frequent_save_in_last": 0, "frequent_save_interval": 1000,
        },
        "main_training": {
            "name": "main_training", "enabled": True, "batch_size": 16,
            "amp": True, "num_iterations": 125000, "learning_rate": 1e-4,
            "lr_schedule": "step", "lr_schedule_steps": [100000, 115000],
            "lr_schedule_gamma": 0.1, "point_supervision": True,
            "train_num_points": 12544, "oversample_ratio": 3.0,
            "importance_sample_ratio": 0.75, "clip_grad_norm": 3.0,
            "weight_decay": 0.001, "embed_weight_decay": 0.0,
            "backbone_lr_ratio": 0.1, "num_ref_frames": 3, "seq_length": 8,
            "remat": True,
            "num_objects": 3, "deep_update_prob": 0.2, "crop_size": [480, 480],
            "merge_probability": 0.5, "max_skip_schedule": [5, 10, 15, 5],
            "max_skip_schedule_fraction": [0.0, 0.1, 0.3, 0.8],
            "frequent_save_in_last": 0, "frequent_save_interval": 1000,
        },
    })


def run_stage(cfg, stage_cfg, variables, run_path, logger):
    from cutie_tpu.data.setup_training_data import (setup_main_training_datasets,
                                                    setup_pre_training_datasets)
    from cutie_tpu.models import CUTIE
    from cutie_tpu.parallel import make_mesh
    from cutie_tpu.training.trainer import Trainer

    stage = stage_cfg.name
    seed = cfg.seed + (0 if stage == "pre_training" else 1)
    single_object = (stage_cfg.num_objects == 1
                     and cfg.get("single_object_pretraining", True))
    # amp: True -> bf16 compute with fp32 master params (the TPU equivalent of
    # the reference's autocast+GradScaler, cutie/model/trainer.py:64,137; the
    # fp32 islands — affinity/softmax, GRUs, final logits, summarizer pooling —
    # are enforced inside the modules regardless of this dtype)
    import jax.numpy as jnp
    dtype = jnp.bfloat16 if stage_cfg.amp else jnp.float32
    model = CUTIE(cfg, single_object=single_object, dtype=dtype)

    # DP mesh over as many devices as the local batch divides across
    import math as _math
    n_dev = _math.gcd(stage_cfg.batch_size // jax.process_count(),
                      len(jax.local_devices())) * jax.process_count()
    mesh = make_mesh(n_dev) if n_dev > 1 else None
    trainer = Trainer(cfg=cfg, stage_cfg=stage_cfg, model=model,
                      variables=variables, mesh=mesh)
    if cfg.checkpoint is not None:
        # resume applies to the FIRST enabled stage only (reference
        # train.py:84-89 loads then clears) — without the clear, a stale
        # pre_training checkpoint would be re-loaded INTO main_training,
        # clobbering the freshly adapted hand-off weights
        trainer.load_checkpoint(cfg.checkpoint)
        cfg.checkpoint = None

    integrator = Integrator(logger)
    logger.time_estimator = TimeEstimator(stage_cfg.num_iterations,
                                          cfg.log_text_interval)

    max_skip_values = stage_cfg.get("max_skip_schedule", [0])
    max_skip_fracs = stage_cfg.get("max_skip_schedule_fraction", [0.0])

    def build_loader(max_skip):
        if stage == "pre_training":
            return setup_pre_training_datasets(cfg, stage_cfg, seed=seed)[1]
        return setup_main_training_datasets(cfg, stage_cfg, max_skip, seed=seed)[1]

    total_iter = stage_cfg.num_iterations
    skip_i = 0
    loader = build_loader(max_skip_values[0])
    it = trainer.it
    rng = jax.random.PRNGKey(seed)
    # checkpoint resume: fast-forward the deterministic stream to the
    # epoch the run stopped in (reference train.py restores
    # current_epoch = curr_iter // len(loader)); also advance the
    # curriculum pointer so the right max_skip loader is built
    epoch = it // max(loader.batches_per_epoch(), 1)
    while (stage == "main_training" and skip_i < len(max_skip_fracs) - 1
           and it >= max_skip_fracs[skip_i + 1] * total_iter):
        skip_i += 1
    if skip_i > 0:
        loader = build_loader(max_skip_values[skip_i])
    def split_host_keys(data):
        """Host-side extras (bookkeeping) stay numpy. cls_gt uploads (the
        loss samples it on device) — keep the host copy for vis grids."""
        data.pop("info", None)
        return data, data.get("cls_gt"), data.get("frames")

    try:
        while it < total_iter:
            batches = iter(loader.epoch(epoch))
            nxt = next(batches, None)
            if nxt is not None:
                nxt = split_host_keys(nxt)
                nxt = (trainer.upload_batch(nxt[0]),) + nxt[1:]
            while nxt is not None:
                data_dev, cls_gt, host_frames = nxt
                # max_skip curriculum: rebuild the loader at schedule points
                # (train.py:102-119,142-149)
                if (stage == "main_training"
                        and skip_i < len(max_skip_fracs) - 1
                        and it >= max_skip_fracs[skip_i + 1] * total_iter):
                    skip_i += 1
                    loader = build_loader(max_skip_values[skip_i])
                    break
                rng, k = jax.random.split(rng)
                losses = trainer.do_pass(data_dev, it, k)  # async dispatch
                # prefetch the next batch while this step computes (device_put
                # is async; the implicit in-call transfer would serialize)
                nxt = next(batches, None)
                if nxt is not None:
                    nxt = split_host_keys(nxt)
                    nxt = (trainer.upload_batch(nxt[0]),) + nxt[1:]
                integrator.add_dict(losses)
                it += 1
                if it % cfg.log_text_interval == 0:
                    integrator.finalize(f"train/{stage}", it)
                    integrator.reset_except_hooks()
                if (it % cfg.log_image_interval == 0 and cls_gt is not None
                        and jax.process_index() == 0):
                    # image/GT/prediction grids (reference trainer.py:113-118)
                    from cutie_tpu.utils.image_saver import vis_sequence
                    logits = trainer.last_logits
                    if jax.process_count() > 1:
                        # only this process's rows are addressable; they
                        # line up with the process-local host batch
                        shards = sorted(logits.addressable_shards,
                                        key=lambda s: s.index)
                        logits = np.concatenate(
                            [np.asarray(s.data) for s in shards])
                    grid = vis_sequence(
                        {"frames": np.asarray(host_frames),
                         "cls_gt": np.asarray(cls_gt)},
                        np.asarray(logits))
                    logger.log_image(f"train/{stage}", grid, it)
                if it % cfg.save_weights_interval == 0 and jax.process_index() == 0:
                    trainer.save_weights(path.join(run_path, f"weights_{it}.npz"))
                if it % cfg.save_checkpoint_interval == 0 and jax.process_index() == 0:
                    trainer.save_checkpoint(path.join(run_path, "checkpoint.pkl"))
                if it >= total_iter:
                    break
            epoch += 1
    finally:
        # crash-save guard (train.py:157-160)
        if jax.process_index() == 0:
            trainer.save_weights(path.join(run_path, f"weights_{stage}_final.npz"))
            trainer.save_checkpoint(path.join(run_path, "checkpoint_final.pkl"))
    return trainer.get_variables()


def setup_rank_logging(run_path: str) -> None:
    """Per-rank log files with rank-tagged formatters (reference
    cutie/config/hydra/job_logging/custom.yaml:4-16)."""
    rank = jax.process_index()
    fmt = logging.Formatter(
        f"[%(asctime)s][%(levelname)s][r{rank}] - %(message)s",
        datefmt="%Y-%m-%d %H:%M:%S")
    root = logging.getLogger()
    root.setLevel(logging.INFO)
    stream = logging.StreamHandler()
    stream.setFormatter(fmt)
    root.addHandler(stream)
    os.makedirs(run_path, exist_ok=True)
    fh = logging.FileHandler(path.join(run_path, f"train_rank{rank}.log"))
    fh.setFormatter(fmt)
    root.addHandler(fh)


def main():
    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()

    cfg = train_config()
    cfg.apply_overrides(sys.argv[1:])
    # data=<preset> group (base / with-mose / mega) overlays the main-training
    # dataset mix + iteration schedule, then explicit CLI overrides re-apply on
    # top so `data.preset=mega main_training.num_iterations=...` still wins
    if cfg.data.preset != "base":
        apply_data_preset(cfg, cfg.data.preset)
        cfg.apply_overrides(sys.argv[1:])
    # the model=<small|base> group override stores a raw string; convert it only
    # after ALL override passes, or re-applied overrides would reset cfg.model
    # back to a string (hydra resolves groups before overrides too)
    if isinstance(cfg.get("model"), str):
        cfg.model = model_small() if cfg.model == "small" else model_base()

    run_path = path.join("output", cfg.exp_id)
    setup_rank_logging(run_path)
    logger = TensorboardLogger(path.join(run_path, "tb"),
                               enabled=jax.process_index() == 0)
    logger.log_string("config", str(cfg.to_dict()))

    np.random.seed(cfg.seed)

    variables = None
    if cfg.weights is not None:
        from cutie_tpu.training.trainer import load_weights_npz
        variables = load_weights_npz(cfg.weights)

    for stage_name in ("pre_training", "main_training"):
        stage_cfg = cfg[stage_name]
        if not stage_cfg.enabled:
            continue
        if variables is None:
            from cutie_tpu.models import CUTIE
            from cutie_tpu.utils.get_default_model import init_variables
            single_object = (stage_cfg.num_objects == 1
                             and cfg.get("single_object_pretraining", True))
            model = CUTIE(cfg, single_object=single_object)
            variables = init_variables(model)
        log.info("=== stage %s ===", stage_name)
        variables = run_stage(cfg, stage_cfg, variables, run_path, logger)
        if stage_name == "pre_training" and stage_cfg.num_objects == 1:
            # single->multi-object conv surgery for the hand-off
            # (reference cutie/model/cutie.py:212-256 semantics)
            from cutie_tpu.utils.weight_import import adapt_variables_single_to_multi
            variables = adapt_variables_single_to_multi(
                variables, cfg.model.sensory_dim, cfg.model.value_dim)


if __name__ == "__main__":
    main()
