"""Eval-harness format coverage: BURST RLE json round trip and
YouTubeVOS-style incremental objects with meta.json required frames."""
import json
import os
from os import path

import numpy as np
import pytest
from PIL import Image

from tests.conftest import require_golden


def _small_bundle(cfg):
    import jax
    import jax.numpy as jnp

    from cutie_tpu.models import CUTIE
    from cutie_tpu.utils.get_default_model import ModelBundle
    from cutie_tpu.utils.weight_import import convert_torch_state_dict

    sd = dict(np.load(require_golden("state_dict_small.npz")))
    model = CUTIE(cfg)
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                            jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 2, 64, 64)))
    zeros = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), dict(shapes))
    variables = convert_torch_state_dict(sd, zeros, strict=False)
    return ModelBundle(model=model, variables=variables, cfg=cfg)


def _patch_build_model(monkeypatch, cfg):
    import cutie_tpu.eval_vos as ev

    bundle = _small_bundle(cfg)
    monkeypatch.setattr(ev, "build_model", lambda *a, **k: bundle)


def test_burst_end_to_end(tmp_path, monkeypatch):
    from cutie_tpu.config import eval_config
    from cutie_tpu.eval_vos import eval_vos
    from cutie_tpu.utils import rle

    rec = dict(np.load(require_golden("stream_small_work.npz")))
    frames, mask0 = rec["frames"], rec["mask0"]
    h, w = mask0.shape

    # build a mini BURST layout: frames/val/<dataset>/<seq>/*.png + json
    img_root = tmp_path / "frames"
    seq_dir = img_root / "ds" / "seq1"
    os.makedirs(seq_dir)
    names = []
    for ti in range(6):
        arr = (np.transpose(frames[ti], (1, 2, 0)) * 255).astype(np.uint8)
        name = f"{ti:05d}.png"
        Image.fromarray(arr).save(seq_dir / name)
        names.append(name)
    segms = []
    for ti in range(6):
        if ti == 0:
            segms.append({
                "1": {"rle": rle.encode((mask0 == 1).astype(np.uint8))["counts"]},
                "2": {"rle": rle.encode((mask0 == 2).astype(np.uint8))["counts"]},
            })
        else:
            segms.append({})
    burst_json = {
        "sequences": [{
            "dataset": "ds", "seq_name": "seq1", "width": w, "height": h,
            "all_image_paths": names, "annotated_image_paths": names,
            "segmentations": segms,
        }],
        "split": "val",
    }
    json_path = tmp_path / "first_frame_annotations.json"
    with open(json_path, "w") as f:
        json.dump(burst_json, f)

    cfg = eval_config("small")
    cfg.merge({"dataset": "burst-tiny", "output_dir": str(tmp_path / "out"),
               "weights": None, "mem_every": 3, "max_mem_frames": 3})
    cfg.datasets["burst-tiny"] = {
        "image_directory": str(img_root),
        "json_directory": str(json_path),
        "size": -1, "save_all": False, "use_long_term": False,
        "mem_every": 3, "skip_frames": -1,
    }
    _patch_build_model(monkeypatch, cfg)
    stats = eval_vos(cfg)
    assert stats["total_frames"] == 6

    with open(tmp_path / "out" / "predictions.json") as f:
        preds = json.load(f)
    seq = preds["sequences"][0]
    assert len(seq["segmentations"]) == 6
    # frame 0 segments copied from the input annotations
    assert set(map(str, seq["segmentations"][0].keys())) == {"1", "2"}
    # later frames contain predicted RLEs that decode to the right shape
    found = False
    for s in seq["segmentations"][1:]:
        for obj in s.values():
            m = rle.decode({"size": [h, w], "counts": obj["rle"]})
            assert m.shape == (h, w)
            found = True
    assert found


def test_ytvos_style_incremental_objects(tmp_path, monkeypatch):
    from cutie_tpu.config import eval_config
    from cutie_tpu.eval_vos import eval_vos

    rec = dict(np.load(require_golden("stream_small_adddel.npz")))
    frames, mask0, mask2 = rec["frames"], rec["mask0"], rec["mask2"]
    img_dir = tmp_path / "JPEGImages" / "vid"
    mask_dir = tmp_path / "Annotations" / "vid"
    os.makedirs(img_dir)
    os.makedirs(mask_dir)
    from cutie_tpu.utils.palette import davis_palette
    names = []
    for ti in range(8):
        arr = (np.transpose(frames[ti], (1, 2, 0)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(img_dir / f"{ti:05d}.png")
        names.append(f"{ti:05d}")
    # object 1 annotated at frame 0; object 2 first annotated at frame 4
    m0 = np.where(mask0 == 1, 1, 0).astype(np.uint8)
    pm = Image.fromarray(m0, mode="P")
    pm.putpalette(davis_palette)
    pm.save(mask_dir / "00000.png")
    pm = Image.fromarray(mask2.astype(np.uint8), mode="P")
    pm.putpalette(davis_palette)
    pm.save(mask_dir / "00004.png")

    meta = {"videos": {"vid": {"objects": {
        "1": {"frames": names},
        "2": {"frames": names[4:]},
    }}}}
    meta_path = tmp_path / "meta.json"
    with open(meta_path, "w") as f:
        json.dump(meta, f)

    cfg = eval_config("small")
    cfg.merge({"dataset": "y-tiny", "output_dir": str(tmp_path / "out"),
               "weights": None, "mem_every": 3, "max_mem_frames": 4})
    cfg.datasets["y-tiny"] = {
        "image_directory": str(tmp_path / "JPEGImages"),
        "mask_directory": str(tmp_path / "Annotations"),
        "json_directory": str(meta_path),
        "size": -1, "save_all": False, "use_all_masks": True,
        "use_long_term": False, "mem_every": 3,
    }
    _patch_build_model(monkeypatch, cfg)
    stats = eval_vos(cfg)
    assert stats["total_frames"] == 8
    out_dir = tmp_path / "out" / "Annotations" / "vid"
    saved = sorted(os.listdir(out_dir))
    assert len(saved) == 8  # meta.json marks all frames as required
    last = np.array(Image.open(out_dir / "00007.png"))
    # both objects present after the incremental addition, tracking the
    # reference's recorded masks
    ref = rec["probs"][7].argmax(0)
    assert (last == ref).mean() > 0.97


def test_score_dump_hickle_roundtrip(tmp_path):
    """save_scores writes reference-format .hkl dumps when hickle exists
    (results_utils.py:194-208); npz fallback otherwise. Round-trips through
    the same loader merge_multi_scale uses."""
    import cutie_tpu.utils.results as results_mod
    from cutie_tpu.inference.object_manager import ObjectManager

    if results_mod.hickle is None:
        pytest.skip("hickle not installed — npz fallback covered by "
                    "test_eval_harness multi-scale merge")

    om = ObjectManager()
    om.add_new_objects([1, 2])
    saver = results_mod.ResultSaver(
        str(tmp_path / "masks"), "vid", dataset="d17-val",
        object_manager=om, use_long_id=False, save_mask=False,
        save_scores=True, score_output_root=str(tmp_path / "scores"))
    prob = np.random.default_rng(0).random((3, 8, 8)).astype(np.float32)
    saver.process(prob, "00000.png", last_frame=True)
    saver.end()

    vid_dir = tmp_path / "scores" / "vid"
    assert (vid_dir / "00000.hkl").exists()
    assert (vid_dir / "backward.hkl").exists()
    loaded = np.asarray(results_mod.hickle.load(str(vid_dir / "00000.hkl")))
    assert loaded.dtype == np.uint8
    np.testing.assert_array_equal(loaded, (prob * 255).astype(np.uint8))
    back = results_mod.hickle.load(str(vid_dir / "backward.hkl"))
    assert set(int(k) for k in back) == {1, 2}
