"""Training-step tests: unrolled forward, losses, DP sharding on the virtual
8-device CPU mesh, checkpoint roundtrip."""
import numpy as np
import pytest


def _tiny_stage(seq_length=3, num_objects=2):
    from cutie_tpu.config import Config
    return Config({
        "name": "test", "amp": False, "num_iterations": 10,
        "learning_rate": 1e-4, "lr_schedule": "constant",
        "point_supervision": True, "train_num_points": 64,
        "oversample_ratio": 3.0, "importance_sample_ratio": 0.75,
        "clip_grad_norm": 3.0, "weight_decay": 0.001,
        "embed_weight_decay": 0.0, "backbone_lr_ratio": 0.1,
        "num_ref_frames": 2, "seq_length": seq_length,
        "num_objects": num_objects, "deep_update_prob": 0.2,
    })


def _tiny_data(b, t, hw, o, seed=0):
    rng = np.random.default_rng(seed)
    cls_gt = rng.integers(0, o + 1, size=(b, t, hw, hw))
    first_gt = np.moveaxis(np.eye(o + 1, dtype=np.float32)[cls_gt[:, 0]], -1, 1)[:, 1:]
    return {
        "frames": rng.uniform(size=(b, t, hw, hw, 3)).astype(np.float32),
        "first_frame_gt": first_gt,
        "selector": np.ones((b, o), np.float32),
        "cls_gt": cls_gt.astype(np.uint8),
    }


@pytest.mark.parametrize("small_map_pixels", [4096, 0])
def test_point_sample_matches_torch_gridsample(small_map_pixels, monkeypatch):
    """Covers BOTH forward paths: the separable-matmul small-map path
    (threshold 4096, default for this 9x13 map) and the channels-minor
    4-corner gather path (threshold forced to 0)."""
    import torch
    import torch.nn.functional as F

    import cutie_tpu.ops.point_features as pf

    monkeypatch.setattr(pf, "_SMALL_MAP_PIXELS", small_map_pixels)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 3, 9, 13)).astype(np.float32)
    # include out-of-range points to exercise the zero-padding corners
    coords = rng.uniform(-0.05, 1.05, size=(2, 50, 2)).astype(np.float32)
    ours = np.asarray(pf.point_sample(x, coords))
    theirs = F.grid_sample(torch.tensor(x),
                           2.0 * torch.tensor(coords).unsqueeze(2) - 1.0,
                           align_corners=False).squeeze(3).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("small_map_pixels", [4096, 0])
def test_point_sample_matmul_backward_matches_autodiff(small_map_pixels,
                                                       monkeypatch):
    """The custom scatter-free VJP (fp32 path on CPU) must match autodiff
    of the plain forward implementation for both cotangents — under both
    forward paths (separable matmul and 4-corner gather)."""
    import jax
    import jax.numpy as jnp

    import cutie_tpu.ops.point_features as pf

    monkeypatch.setattr(pf, "_SMALL_MAP_PIXELS", small_map_pixels)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(3, 4, 17, 23)).astype(np.float32))
    # include out-of-range points to exercise the zero-padding corners
    coords = jnp.asarray(
        rng.uniform(-0.05, 1.05, size=(3, 57, 2)).astype(np.float32))

    def loss_c(m, c):
        return jnp.sum(jnp.sin(pf.point_sample(m, c)))

    def loss_r(m, c):
        return jnp.sum(jnp.sin(pf._point_sample_gather(m, c)))

    g1 = jax.grad(loss_c, argnums=(0, 1))(x, coords)
    g2 = jax.grad(loss_r, argnums=(0, 1))(x, coords)
    np.testing.assert_allclose(g1[0], g2[0], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(g1[1], g2[1], rtol=1e-4, atol=1e-3)


def test_point_sample_upsampled_matches_sample_of_interpolate():
    """point_sample_upsampled == grid_sample(F.interpolate(x, factor)) — the
    composed-weight reformulation the loss uses for the main head must equal
    the reference's upsample-then-sample (cutie/model/cutie.py:200 +
    losses.py:54) exactly (fp32 tolerance)."""
    import jax.numpy as jnp
    import torch
    import torch.nn.functional as F

    import cutie_tpu.ops.point_features as pf

    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 3, 9, 13)).astype(np.float32)
    coords = rng.uniform(-0.05, 1.05, size=(2, 64, 2)).astype(np.float32)
    for factor in (4, 2, 1):
        up = F.interpolate(torch.tensor(x), scale_factor=factor,
                           mode="bilinear", align_corners=False)
        ref = F.grid_sample(up, 2.0 * torch.tensor(coords).unsqueeze(2) - 1.0,
                            align_corners=False).squeeze(3).numpy()
        ours = np.asarray(pf.point_sample_upsampled(
            jnp.asarray(x), jnp.asarray(coords), factor))
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_point_sample_cls_onehot_matches_onehot_gather():
    """point_sample_cls_onehot == point_sample(one_hot(cls)) — the gather-free
    gt-label path must reproduce the reference's cls_to_one_hot + point_sample
    (cutie/model/losses.py:53,75) including zero padding at out-of-range
    corners (which must NOT read as class 0)."""
    import jax.numpy as jnp

    import cutie_tpu.ops.point_features as pf

    rng = np.random.default_rng(4)
    for c in (3, 5):
        cls = rng.integers(0, c, size=(2, 21, 17))
        coords = rng.uniform(-0.05, 1.05, size=(2, 133, 2)).astype(np.float32)
        onehot = np.moveaxis(np.eye(c, dtype=np.float32)[cls], -1, 1)
        ref = np.asarray(pf._point_sample_gather(jnp.asarray(onehot),
                                                 jnp.asarray(coords)))
        ours = np.asarray(pf.point_sample_cls_onehot(
            jnp.asarray(cls), jnp.asarray(coords), c))
        np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-6)


def test_uncertain_point_selection_matches_topk():
    """Top-uncertainty selection picks the same index set as lax.top_k,
    and the sort-free uncertainty equals the top-2 margin."""
    import jax
    import jax.numpy as jnp

    import cutie_tpu.ops.point_features as pf

    rng = np.random.default_rng(2)
    u = jnp.asarray(rng.normal(size=(4, 999)).astype(np.float32))
    idx_new = np.asarray(pf._top_uncertain_indices(u, 100))
    idx_old = np.asarray(jax.lax.top_k(u, 100)[1])
    for r in range(4):
        assert set(idx_new[r].tolist()) == set(idx_old[r].tolist())

    logits = jnp.asarray(rng.normal(size=(3, 5, 211)).astype(np.float32))
    top2 = jax.lax.top_k(logits.swapaxes(1, 2), 2)[0]
    ref = (top2[..., 1] - top2[..., 0])[:, None, :]
    np.testing.assert_allclose(pf.calculate_uncertainty(logits), ref,
                               rtol=1e-6, atol=1e-6)


def test_train_step_runs_and_descends():
    import jax

    from cutie_tpu.config import eval_config
    from cutie_tpu.models import CUTIE
    from cutie_tpu.training.trainer import Trainer
    from cutie_tpu.utils.get_default_model import init_variables

    cfg = eval_config("small")
    stage = _tiny_stage()
    model = CUTIE(cfg)
    variables = init_variables(model, image_size=64, num_objects=2)
    trainer = Trainer(cfg=cfg, stage_cfg=stage, model=model, variables=variables)

    data = _tiny_data(2, 3, 64, 2)
    l0 = trainer.do_pass(data, 0, jax.random.PRNGKey(0))
    assert np.isfinite(float(l0["total_loss"]))
    # a few steps on the same batch must reduce the loss
    for i in range(1, 6):
        li = trainer.do_pass(data, i, jax.random.PRNGKey(i))
    assert float(li["total_loss"]) < float(l0["total_loss"])


def test_train_step_bf16_amp_descends():
    """amp=True must actually switch compute to bf16 (fp32 master params) and
    still descend — the TPU equivalent of reference autocast+GradScaler
    (cutie/model/trainer.py:64,137)."""
    import jax
    import jax.numpy as jnp

    from cutie_tpu.config import eval_config
    from cutie_tpu.models import CUTIE
    from cutie_tpu.training.trainer import Trainer
    from cutie_tpu.utils.get_default_model import init_variables

    cfg = eval_config("small")
    stage = _tiny_stage()
    stage.amp = True
    model = CUTIE(cfg, dtype=jnp.bfloat16)
    variables = init_variables(model, image_size=64, num_objects=2)

    # compute dtype really is bf16 (backbone output), params stay fp32
    img = jnp.zeros((1, 64, 64, 3), jnp.float32)
    ms_feat, pix_feat = model.apply(variables, img, method="encode_image")
    assert ms_feat[0].dtype == jnp.bfloat16
    assert pix_feat.dtype == jnp.bfloat16
    assert all(p.dtype == jnp.float32
               for p in jax.tree.leaves(variables["params"]))

    trainer = Trainer(cfg=cfg, stage_cfg=stage, model=model, variables=variables)
    data = _tiny_data(2, 3, 64, 2)
    l0 = trainer.do_pass(data, 0, jax.random.PRNGKey(0))
    assert np.isfinite(float(l0["total_loss"]))
    for i in range(1, 6):
        li = trainer.do_pass(data, i, jax.random.PRNGKey(i))
    assert float(li["total_loss"]) < float(l0["total_loss"])
    # master params stay fp32 after updates
    assert all(p.dtype == jnp.float32 for p in jax.tree.leaves(trainer.params))


def test_dryrun_multichip_8dev():
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)


def test_checkpoint_roundtrip(tmp_path):
    import jax

    from cutie_tpu.config import eval_config
    from cutie_tpu.models import CUTIE
    from cutie_tpu.training.trainer import Trainer, load_weights_npz
    from cutie_tpu.utils.get_default_model import init_variables

    cfg = eval_config("small")
    stage = _tiny_stage()
    model = CUTIE(cfg)
    variables = init_variables(model, image_size=64, num_objects=2)
    trainer = Trainer(cfg=cfg, stage_cfg=stage, model=model, variables=variables)
    data = _tiny_data(1, 3, 64, 2)
    trainer.do_pass(data, 0, jax.random.PRNGKey(0))

    ckpt = str(tmp_path / "ckpt.pkl")
    wts = str(tmp_path / "w.npz")
    trainer.save_checkpoint(ckpt)
    trainer.save_weights(wts)

    trainer2 = Trainer(cfg=cfg, stage_cfg=stage, model=model, variables=variables)
    it = trainer2.load_checkpoint(ckpt)
    # trainer.it counts COMPLETED steps: one do_pass(data, 0) -> 1, so a
    # resume continues at step 1 instead of repeating step 0
    assert it == 1
    p1 = jax.tree.leaves(trainer.params)[0]
    p2 = jax.tree.leaves(trainer2.params)[0]
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))

    tree = load_weights_npz(wts)
    assert "params" in tree and "batch_stats" in tree


def test_orbax_checkpoint_roundtrip(tmp_path):
    import jax

    from cutie_tpu.config import eval_config
    from cutie_tpu.models import CUTIE
    from cutie_tpu.training.trainer import Trainer
    from cutie_tpu.utils.get_default_model import init_variables

    cfg = eval_config("small")
    stage = _tiny_stage()
    model = CUTIE(cfg)
    variables = init_variables(model, image_size=64, num_objects=2)
    trainer = Trainer(cfg=cfg, stage_cfg=stage, model=model, variables=variables)
    trainer.it = 7
    d = str(tmp_path / "orbax_ckpt")
    trainer.save_checkpoint_orbax(d)
    trainer2 = Trainer(cfg=cfg, stage_cfg=stage, model=model, variables=variables)
    assert trainer2.load_checkpoint_orbax(d) == 7
    p1 = jax.tree.leaves(trainer.params)[0]
    p2 = jax.tree.leaves(trainer2.params)[0]
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
