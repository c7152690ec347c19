"""Stage dataset construction (pre-training statics / main-training VOS).

Behavioral parity target: reference cutie/dataset/setup_training_data.py:25-87
+ cutie/config/data/datasets.yaml registry semantics.
"""
from __future__ import annotations

import json
import logging
from os import path
from typing import Dict, Optional

import jax

from cutie_tpu.data.loader import ShardedLoader
from cutie_tpu.data.static_dataset import SyntheticVideoDataset
from cutie_tpu.data.vos_dataset import VOSMergeTrainDataset

log = logging.getLogger(__name__)


def load_subset(p: str):
    with open(p) as f:
        return set(line.strip() for line in f)


def load_empty_masks(p: str) -> Dict[str, list]:
    with open(p) as f:
        return json.load(f)


def setup_pre_training_datasets(cfg, stage_cfg, seed: int = 0):
    root = cfg.data.image_datasets.base
    names = cfg.data.pre_training.datasets
    tuples = []
    for name in names:
        d = cfg.data.image_datasets[name]
        tuples.append((path.join(root, d.directory), d.data_structure, d.multiplier))
    dataset = SyntheticVideoDataset(tuples, seq_length=stage_cfg.seq_length,
                                    max_num_obj=stage_cfg.num_objects,
                                    size=stage_cfg.crop_size[0])
    loader = ShardedLoader(dataset, stage_cfg.batch_size, seed=seed,
                           num_workers=cfg.get("num_workers", 8),
                           process_index=jax.process_index(),
                           process_count=jax.process_count())
    return dataset, loader


def setup_main_training_datasets(cfg, stage_cfg, max_skip: int, seed: int = 0):
    root = cfg.data.vos_datasets.base
    names = cfg.data.main_training.datasets
    dataset_configs = {}
    for name in names:
        d = cfg.data.vos_datasets[name]
        dataset_configs[name] = {
            "im_root": path.join(root, d.image_directory),
            "gt_root": path.join(root, d.mask_directory),
            "max_skip": max_skip // d.frame_interval,
            "subset": load_subset(d.subset) if d.get("subset") else None,
            "empty_masks": (load_empty_masks(d.empty_masks)
                            if d.get("empty_masks") else None),
            "multiplier": d.multiplier,
        }
    dataset = VOSMergeTrainDataset(dataset_configs,
                                   seq_length=stage_cfg.seq_length,
                                   max_num_obj=stage_cfg.num_objects,
                                   size=stage_cfg.crop_size[0],
                                   merge_probability=stage_cfg.merge_probability)
    loader = ShardedLoader(dataset, stage_cfg.batch_size, seed=seed,
                           num_workers=cfg.get("num_workers", 8),
                           process_index=jax.process_index(),
                           process_count=jax.process_count())
    log.info("Using a max skip of %d frames", max_skip)
    return dataset, loader
