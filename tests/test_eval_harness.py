"""Eval-harness integration test: build a tiny DAVIS-style dataset on disk from
the stream fixture, run eval_vos end-to-end (golden weights), and check the
saved masks track the reference's recorded masks."""
import os
from os import path

import numpy as np
import pytest
from PIL import Image

from tests.conftest import require_golden


@pytest.fixture()
def tiny_davis(tmp_path):
    rec = dict(np.load(require_golden("stream_small_work.npz")))
    frames, mask0 = rec["frames"], rec["mask0"]
    img_dir = tmp_path / "JPEGImages" / "video1"
    mask_dir = tmp_path / "Annotations" / "video1"
    os.makedirs(img_dir)
    os.makedirs(mask_dir)
    from cutie_tpu.utils.palette import davis_palette
    for ti, f in enumerate(frames):
        arr = (np.transpose(f, (1, 2, 0)) * 255).astype(np.uint8)
        # lossless: jpeg noise would compound through the random-weight model
        Image.fromarray(arr).save(img_dir / f"{ti:05d}.png")
    m = Image.fromarray(mask0.astype(np.uint8), mode="P")
    m.putpalette(davis_palette)
    m.save(mask_dir / "00000.png")
    return tmp_path, rec


def test_eval_vos_end_to_end(tiny_davis, tmp_path):
    from cutie_tpu.config import eval_config
    from cutie_tpu.eval_vos import eval_vos

    root, rec = tiny_davis
    out_dir = str(tmp_path / "run")
    cfg = eval_config("small")
    cfg.merge({
        "dataset": "tiny", "output_dir": out_dir, "weights": None,
        "mem_every": 3, "max_mem_frames": 3, "save_scores": False,
        "visualize": True,
    })
    cfg.datasets["tiny"] = {
        "image_directory": str(root / "JPEGImages"),
        "mask_directory": str(root / "Annotations"),
        "size": -1, "save_all": True, "use_all_masks": False,
        "use_long_term": False, "mem_every": 3,
    }
    # use the golden weights so outputs are meaningful
    import jax
    from cutie_tpu.models import CUTIE
    from cutie_tpu.utils import get_default_model as gdm
    from cutie_tpu.utils.weight_import import convert_torch_state_dict

    sd = dict(np.load(require_golden("state_dict_small.npz")))

    def fake_build_model(cfg_, weights=None, single_object=False):
        model = CUTIE(cfg_)
        import jax.numpy as jnp
        shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                                jnp.zeros((1, 64, 64, 3)),
                                jnp.zeros((1, 2, 64, 64)))
        zeros = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), dict(shapes))
        variables = convert_torch_state_dict(sd, zeros, strict=False)
        return gdm.ModelBundle(model=model, variables=variables, cfg=cfg_)

    import cutie_tpu.eval_vos as ev
    orig = ev.build_model
    ev.build_model = fake_build_model
    try:
        stats = eval_vos(cfg)
    finally:
        ev.build_model = orig

    assert stats["total_frames"] == rec["frames"].shape[0]
    # saved masks exist and track the reference recording
    agree = []
    for ti in range(rec["frames"].shape[0]):
        p = path.join(out_dir, "Annotations", "video1", f"{ti:05d}.png")
        assert path.exists(p), p
        saved = np.array(Image.open(p))
        ref_mask = rec["probs"][ti].argmax(0)
        agree.append((saved == ref_mask).mean())
    assert min(agree) > 0.97, agree
    # visualizations got written too
    assert path.exists(path.join(out_dir, "Visualizations", "video1", "00000.jpg"))
