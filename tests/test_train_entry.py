"""Two-stage train entry smoke test: tiny synthetic datasets on disk, a few
iterations of pre_training and main_training through cutie_tpu.train.run_stage
(incl. the single->multi-object surgery hand-off and checkpoint saving)."""
import os
from os import path

import numpy as np
import pytest
from PIL import Image


@pytest.fixture(scope="module")
def data_roots(tmp_path_factory):
    root = tmp_path_factory.mktemp("train_data")
    rng = np.random.default_rng(0)
    # static images (method 1: flat jpg+png)
    static = root / "static" / "dummy"
    os.makedirs(static)
    for i in range(4):
        img = rng.integers(0, 255, (70, 90, 3), dtype=np.uint8)
        mask = np.zeros((70, 90), np.uint8)
        mask[20:50, 30:60] = 255
        Image.fromarray(img).save(static / f"{i}.jpg")
        Image.fromarray(mask).save(static / f"{i}.png")
    # vos videos
    for vid in ["v0", "v1"]:
        os.makedirs(root / "vos" / "JPEGImages" / vid)
        os.makedirs(root / "vos" / "Annotations" / vid)
        for ti in range(5):
            img = rng.integers(0, 255, (70, 90, 3), dtype=np.uint8)
            mask = np.zeros((70, 90), np.uint8)
            mask[10 + 3 * ti:30 + 3 * ti, 20:50] = 1
            Image.fromarray(img).save(root / "vos" / "JPEGImages" / vid / f"{ti:05d}.jpg")
            pm = Image.fromarray(mask, mode="P")
            pm.save(root / "vos" / "Annotations" / vid / f"{ti:05d}.png")
    return str(root)


def test_two_stage_training_entry(data_roots, tmp_path):
    from cutie_tpu.config import model_small
    from cutie_tpu.train import run_stage, train_config
    from cutie_tpu.utils.logger import TensorboardLogger
    from cutie_tpu.utils.weight_import import adapt_variables_single_to_multi

    cfg = train_config()
    cfg.model = model_small()
    cfg.merge({
        "num_workers": 2, "log_text_interval": 2,
        "save_weights_interval": 1000, "save_checkpoint_interval": 1000,
        "data": {
            "image_datasets": {
                "base": data_roots + "/static",
                "DUMMY": {"directory": "dummy", "data_structure": 1,
                          "multiplier": 1},
            },
            "vos_datasets": {
                "base": data_roots + "/vos",
                "TINY": {"image_directory": "JPEGImages",
                         "mask_directory": "Annotations",
                         "multiplier": 1, "frame_interval": 1,
                         "subset": None, "empty_masks": None},
            },
            "pre_training": {"datasets": ["DUMMY"]},
            "main_training": {"datasets": ["TINY"], "num_iterations": 2,
                              "lr_schedule_steps": [1]},
        },
    })
    cfg.pre_training.merge({
        "batch_size": 2, "num_iterations": 2, "seq_length": 3,
        "num_objects": 1, "crop_size": [48, 48], "train_num_points": 32,
    })
    cfg.main_training.merge({
        "batch_size": 2, "num_iterations": 2, "seq_length": 3,
        "num_objects": 2, "crop_size": [48, 48], "train_num_points": 32,
        "num_ref_frames": 2, "lr_schedule_steps": [1],
        "max_skip_schedule": [2], "max_skip_schedule_fraction": [0.0],
    })

    cfg.log_image_interval = 2

    run_path = str(tmp_path / "run")
    logger = TensorboardLogger(None, enabled=False)
    logged_images = []
    logger.log_image = lambda tag, img, it: logged_images.append(
        (tag, img.shape, img.dtype))

    from cutie_tpu.models import CUTIE
    from cutie_tpu.utils.get_default_model import init_variables

    model = CUTIE(cfg, single_object=True)
    variables = init_variables(model, image_size=48, num_objects=1)

    variables = run_stage(cfg, cfg.pre_training, variables, run_path, logger)
    assert path.exists(path.join(run_path, "weights_pre_training_final.npz"))
    # single -> multi surgery
    k = variables["params"]["mask_encoder"]["trunk"]["conv1"]["kernel"]
    assert np.asarray(k).shape[2] == 4
    variables = adapt_variables_single_to_multi(
        variables, cfg.model.sensory_dim, cfg.model.value_dim)
    k = variables["params"]["mask_encoder"]["trunk"]["conv1"]["kernel"]
    assert np.asarray(k).shape[2] == 5

    variables = run_stage(cfg, cfg.main_training, variables, run_path, logger)
    assert path.exists(path.join(run_path, "weights_main_training_final.npz"))
    assert path.exists(path.join(run_path, "checkpoint_final.pkl"))

    # training vis grids were dumped at log_image_interval
    # (reference cutie/model/trainer.py:113-118)
    assert logged_images, "no vis grids logged"
    tag, shape, dtype = logged_images[0]
    assert str(dtype) == "uint8" and shape[-1] == 3 and shape[0] > 0
