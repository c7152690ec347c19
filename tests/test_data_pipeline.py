"""Training data pipeline tests: synthetic on-disk datasets through the
augmentation stacks, loader determinism, and collation."""
import os
from os import path

import numpy as np
import pytest
from PIL import Image


@pytest.fixture(scope="module")
def static_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("static")
    rng = np.random.default_rng(0)
    for i in range(6):
        img = rng.integers(0, 255, size=(80, 100, 3), dtype=np.uint8)
        mask = np.zeros((80, 100), np.uint8)
        mask[20:60, 30:70] = 255
        Image.fromarray(img).save(root / f"{i}.jpg")
        Image.fromarray(mask).save(root / f"{i}.png")
    return str(root)


@pytest.fixture(scope="module")
def vos_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("vos")
    rng = np.random.default_rng(0)
    for vid in ["vid_a", "vid_b"]:
        os.makedirs(root / "JPEGImages" / vid)
        os.makedirs(root / "Annotations" / vid)
        for ti in range(6):
            img = rng.integers(0, 255, size=(90, 120, 3), dtype=np.uint8)
            mask = np.zeros((90, 120), np.uint8)
            mask[10 + ti * 5:40 + ti * 5, 20:60] = 1
            mask[50:80, 70 + ti * 3:110] = 2
            Image.fromarray(img).save(root / "JPEGImages" / vid / f"{ti:05d}.jpg")
            pm = Image.fromarray(mask, mode="P")
            from cutie_tpu.utils.palette import davis_palette
            pm.putpalette(davis_palette)
            pm.save(root / "Annotations" / vid / f"{ti:05d}.png")
    return str(root)


def test_synthetic_video_dataset(static_root):
    from cutie_tpu.data.static_dataset import SyntheticVideoDataset

    ds = SyntheticVideoDataset([(static_root, 1, 1)], size=64, seq_length=3,
                               max_num_obj=2)
    assert len(ds) == 6
    rng = np.random.default_rng(1)
    s = ds.get(0, rng)
    assert s["rgb"].shape == (3, 64, 64, 3)
    assert s["first_frame_gt"].shape == (2, 64, 64)
    assert s["cls_gt"].shape == (3, 64, 64)
    assert s["selector"].shape == (2,)
    assert s["rgb"].min() >= 0 and s["rgb"].max() <= 1
    # determinism: same rng seed -> identical sample
    s2 = ds.get(0, np.random.default_rng(1))
    np.testing.assert_array_equal(s["rgb"], s2["rgb"])
    np.testing.assert_array_equal(s["cls_gt"], s2["cls_gt"])


def test_vos_dataset_and_merge(vos_root):
    from cutie_tpu.data.vos_dataset import VOSMergeTrainDataset

    configs = {
        "tiny": {
            "im_root": path.join(vos_root, "JPEGImages"),
            "gt_root": path.join(vos_root, "Annotations"),
            "max_skip": 3, "subset": None, "empty_masks": None, "multiplier": 1,
        }
    }
    ds = VOSMergeTrainDataset(configs, seq_length=4, max_num_obj=3, size=64,
                              merge_probability=1.0)
    assert len(ds) == 12
    s = ds.get(0, np.random.default_rng(0))
    assert s["rgb"].shape == (4, 64, 64, 3)
    assert s["cls_gt"].max() >= 1  # non-empty first frame guaranteed
    assert s["first_frame_gt"].sum() > 0
    assert s["info"]["num_objects"] >= 1


def test_sharded_loader_determinism_and_collate(static_root):
    from cutie_tpu.data.loader import ShardedLoader
    from cutie_tpu.data.static_dataset import SyntheticVideoDataset

    ds = SyntheticVideoDataset([(static_root, 1, 1)], size=32, seq_length=3,
                               max_num_obj=2)
    loader = ShardedLoader(ds, batch_size=2, seed=7, num_workers=2)
    b1 = next(iter(loader.epoch(0)))
    b2 = next(iter(loader.epoch(0)))
    np.testing.assert_array_equal(b1["frames"], b2["frames"])
    assert b1["frames"].shape == (2, 3, 32, 32, 3)
    # cls_gt ships as a compact uint8 class map (device-side one-hot at the
    # sampled points only — training/losses.py)
    assert b1["cls_gt"].shape == (2, 3, 32, 32)
    assert b1["cls_gt"].dtype == np.uint8
    assert b1["cls_gt"].max() <= 2
    # two-process sharding partitions the global batch
    l0 = ShardedLoader(ds, batch_size=2, seed=7, process_index=0, process_count=2)
    l1 = ShardedLoader(ds, batch_size=2, seed=7, process_index=1, process_count=2)
    s0 = next(iter(l0.epoch(0)))
    s1 = next(iter(l1.epoch(0)))
    np.testing.assert_array_equal(
        np.concatenate([s0["frames"], s1["frames"]]), b1["frames"])


def test_tps_warp_identity():
    from cutie_tpu.data.augment import tps_warp_grid
    import cv2

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, size=(40, 50, 3), dtype=np.uint8)
    c = np.stack([rng.uniform(size=8), rng.uniform(size=8)], 1)
    mapx, mapy = tps_warp_grid(c, c, 40, 50)  # zero displacement
    out = cv2.remap(img, mapx, mapy, cv2.INTER_LINEAR)
    # identity warp reproduces the image (borders may clamp)
    assert np.abs(out[2:-2, 2:-2].astype(int)
                  - img[2:-2, 2:-2].astype(int)).max() <= 1


def test_training_data_registry_ships_complete(tmp_path):
    """Default train_config() must resolve every subset / empty-mask index to
    a file shipped with the package (VERDICT r1 #3), and the with-mose / mega
    presets must overlay the reference's dataset mixes + schedules
    (cutie/config/data/{with-mose,mega}.yaml)."""
    from cutie_tpu.data.setup_training_data import (load_empty_masks,
                                                    load_subset,
                                                    setup_main_training_datasets)
    from cutie_tpu.train import DATA_PRESETS, apply_data_preset, train_config

    cfg = train_config()
    registry = cfg.data.vos_datasets
    for name in ["DAVIS", "YouTubeVOS", "MOSE", "BURST", "OVIS"]:
        d = registry[name]
        if d.get("subset"):
            subset = load_subset(d.subset)
            assert len(subset) > 10, name
        assert d.get("empty_masks"), name
        em = load_empty_masks(d.empty_masks)
        assert isinstance(em, dict) and len(em) > 0, name

    assert "bear" in load_subset(registry.DAVIS.subset)
    assert len(load_subset(registry.YouTubeVOS.subset)) > 3000

    # presets
    apply_data_preset(cfg, "with-mose")
    assert cfg.data.main_training.datasets == ["DAVIS", "YouTubeVOS", "MOSE"]
    apply_data_preset(cfg, "mega")
    assert cfg.data.main_training.datasets == ["DAVIS", "YouTubeVOS", "MOSE",
                                               "BURST", "OVIS"]
    assert cfg.main_training.num_iterations == 175000
    assert cfg.main_training.lr_schedule_steps == [140000, 160000]
    assert set(DATA_PRESETS) == {"base", "with-mose", "mega"}

    # data.preset=mega builds the merged five-dataset sampler against a tiny
    # on-disk tree (one subset-listed video per dataset)
    rng = np.random.default_rng(0)
    names = {"DAVIS": "bear", "YouTubeVOS": "003234408d", "MOSE": "vid_m",
             "BURST": "vid_b", "OVIS": "vid_o"}
    for name, vid in names.items():
        d = registry[name]
        d.image_directory, d.mask_directory = f"{name}/JPEGImages", f"{name}/Annotations"
        for ti in range(4):
            os.makedirs(tmp_path / name / "JPEGImages" / vid, exist_ok=True)
            os.makedirs(tmp_path / name / "Annotations" / vid, exist_ok=True)
            img = rng.integers(0, 255, size=(60, 80, 3), dtype=np.uint8)
            mask = np.zeros((60, 80), np.uint8)
            mask[10:40, 20:60] = 1
            Image.fromarray(img).save(
                tmp_path / name / "JPEGImages" / vid / f"{ti:05d}.jpg")
            Image.fromarray(mask, mode="P").save(
                tmp_path / name / "Annotations" / vid / f"{ti:05d}.png")
    cfg.data.vos_datasets.base = str(tmp_path)
    cfg.main_training.merge({"seq_length": 3, "num_objects": 2,
                             "crop_size": [48, 48], "batch_size": 2,
                             "merge_probability": 0.5})
    cfg.num_workers = 0
    dataset, _loader = setup_main_training_datasets(cfg, cfg.main_training,
                                                    max_skip=5, seed=0)
    assert set(dataset.videos) == set(names)
    for name, vid in names.items():
        assert dataset.videos[name] == [vid], name
