"""Unit tests: RLE codec, palettes, resize parity, config system, tensor utils."""
import numpy as np


def test_rle_roundtrip():
    from cutie_tpu.utils import rle

    rng = np.random.default_rng(0)
    for shape in [(7, 5), (32, 64), (1, 1), (480, 854)]:
        mask = (rng.uniform(size=shape) > 0.7).astype(np.uint8)
        enc = rle.encode(mask)
        dec = rle.decode(enc)
        np.testing.assert_array_equal(mask, dec)
    # empty + full masks
    for mask in [np.zeros((16, 16), np.uint8), np.ones((16, 16), np.uint8)]:
        np.testing.assert_array_equal(mask, rle.decode(rle.encode(mask)))


def test_rle_matches_pycocotools_format():
    """Encode with our codec, decode with the reference algorithm transcribed
    independently? pycocotools is unavailable — instead check a hand-computed
    tiny case: column-major counts, leading zero-run."""
    from cutie_tpu.utils import rle

    mask = np.array([[1, 0], [1, 0]], np.uint8)  # F-order: 1,1,0,0 -> counts [0,2,2]
    counts = rle._counts_from_mask(mask)
    assert counts == [0, 2, 2]
    assert rle.string_to_counts(rle.counts_to_string(counts)) == counts


def test_davis_palette_matches_voc():
    from cutie_tpu.utils.palette import davis_palette_np

    # spot-check the canonical VOC entries
    np.testing.assert_array_equal(davis_palette_np[0], [0, 0, 0])
    np.testing.assert_array_equal(davis_palette_np[1], [128, 0, 0])
    np.testing.assert_array_equal(davis_palette_np[2], [0, 128, 0])
    np.testing.assert_array_equal(davis_palette_np[8], [64, 0, 0])


def test_area_downsample_matches_torch():
    import torch
    import torch.nn.functional as F

    from cutie_tpu.ops.resize import area_downsample

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 32, 48, 3)).astype(np.float32)
    ours = np.asarray(area_downsample(x, 4))
    theirs = F.interpolate(torch.tensor(np.transpose(x, (0, 3, 1, 2))),
                           scale_factor=0.25, mode="area").numpy()
    np.testing.assert_allclose(ours, np.transpose(theirs, (0, 2, 3, 1)),
                               rtol=1e-5, atol=1e-6)


def test_bilinear_resize_matches_torch():
    import torch
    import torch.nn.functional as F

    from cutie_tpu.ops.resize import bilinear_resize

    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 17, 23, 2)).astype(np.float32)
    ours = np.asarray(bilinear_resize(x, 34, 46))
    theirs = F.interpolate(torch.tensor(np.transpose(x, (0, 3, 1, 2))),
                           size=(34, 46), mode="bilinear",
                           align_corners=False).numpy()
    np.testing.assert_allclose(ours, np.transpose(theirs, (0, 2, 3, 1)),
                               rtol=1e-4, atol=1e-5)


def test_align_corners_mm_matches_gather_and_torch():
    """The matmul formulation used inside the differentiated f-BRS objective
    must agree with the gather formulation and torch align_corners=True."""
    import torch
    import torch.nn.functional as F

    from cutie_tpu.ops.resize import (bilinear_resize_align_corners,
                                      bilinear_resize_align_corners_mm)

    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 13, 21, 3)).astype(np.float32)
    mm = np.asarray(bilinear_resize_align_corners_mm(x, 52, 84))
    gather = np.asarray(bilinear_resize_align_corners(x, 52, 84))
    np.testing.assert_allclose(mm, gather, rtol=1e-5, atol=1e-5)
    theirs = F.interpolate(torch.tensor(np.transpose(x, (0, 3, 1, 2))),
                           size=(52, 84), mode="bilinear",
                           align_corners=True).numpy()
    np.testing.assert_allclose(mm, np.transpose(theirs, (0, 2, 3, 1)),
                               rtol=1e-4, atol=1e-5)
    # degenerate 1-pixel input axis
    one = rng.normal(size=(1, 1, 4, 1)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(bilinear_resize_align_corners_mm(one, 3, 8)),
        np.asarray(bilinear_resize_align_corners(one, 3, 8)),
        rtol=1e-5, atol=1e-6)


def test_nearest_exact_matches_torch():
    import torch
    import torch.nn.functional as F

    from cutie_tpu.ops.resize import nearest_exact_resize_np

    rng = np.random.default_rng(0)
    mask = rng.integers(0, 5, size=(31, 57)).astype(np.int64)
    ours = nearest_exact_resize_np(mask, 17, 29)
    theirs = F.interpolate(torch.tensor(mask)[None, None].float(),
                           size=(17, 29), mode="nearest-exact")[0, 0]
    np.testing.assert_array_equal(ours, theirs.long().numpy())


def test_pad_divide_by_matches_reference_split():
    from cutie_tpu.ops.tensor_utils import compute_pad

    # reference splits padding with the extra pixel on the upper/right side
    assert compute_pad(30, 30, 16) == (1, 1, 1, 1)
    assert compute_pad(33, 47, 16) == (0, 1, 7, 8)
    assert compute_pad(32, 32, 16) == (0, 0, 0, 0)


def test_config_overrides():
    from cutie_tpu.config import eval_config, get_dataset_cfg

    cfg = eval_config("base")
    cfg.apply_overrides(["dataset=lvos-val", "mem_every=7",
                         "long_term.max_num_tokens=5000"])
    data_cfg = get_dataset_cfg(cfg)
    assert cfg.long_term.max_num_tokens == 5000
    assert data_cfg.use_long_term is True
    assert data_cfg.mem_every == 7  # top-level override wins over dataset default


def test_aggregate_matches_reference_formula():
    import torch

    from cutie_tpu.ops.tensor_utils import aggregate

    rng = np.random.default_rng(0)
    prob = rng.uniform(size=(1, 3, 8, 8)).astype(np.float32)
    ours = np.asarray(aggregate(prob, axis=1))
    t = torch.tensor(prob)
    new_prob = torch.cat([torch.prod(1 - t, dim=1, keepdim=True), t],
                         1).clamp(1e-7, 1 - 1e-7)
    theirs = torch.log(new_prob / (1 - new_prob)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_bilinear_resize_np_matches_torch():
    """Host bilinear twin == torch F.interpolate(bilinear, no antialias) in
    BOTH directions — jax.image.resize 'linear' antialiases on downsample
    (~0.5 max diff), which is why the max_internal_size input path and the
    saver's output resize use this twin (inference_core.py / results.py)."""
    import torch
    import torch.nn.functional as F

    from cutie_tpu.ops.resize import bilinear_resize_np

    rng = np.random.RandomState(0)
    x = rng.rand(2, 3, 97, 131).astype(np.float32)
    for oh, ow in [(48, 65), (194, 262), (97, 131), (270, 480)]:
        ref = F.interpolate(torch.tensor(x), size=(oh, ow), mode="bilinear",
                            align_corners=False).numpy()
        np.testing.assert_allclose(bilinear_resize_np(x, oh, ow), ref,
                                   atol=2e-5)


def test_weight_export_roundtrip():
    """flax->torch export (checkpoint interop, the direction the reference
    can consume) is the exact inverse of the importer: export then re-import
    reproduces every leaf bit-for-bit, and with a template it reproduces the
    torch key set."""
    import jax
    import jax.numpy as jnp

    from tests.conftest import require_golden
    from cutie_tpu.config import eval_config
    from cutie_tpu.models import CUTIE
    from cutie_tpu.utils.weight_import import (convert_torch_state_dict,
                                               export_torch_state_dict)

    sd = {k: v.astype(np.float32)
          for k, v in np.load(require_golden("state_dict_small.npz")).items()}
    cfg = eval_config("small")
    model = CUTIE(cfg, dtype=jnp.float32)
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                            jnp.zeros((1, 64, 64, 3)),
                            jnp.zeros((1, 2, 64, 64)))
    zeros = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), dict(shapes))
    variables = convert_torch_state_dict(sd, zeros, strict=True)

    # template-driven export reproduces the torch dict exactly
    exp = export_torch_state_dict(variables, template_keys=sd.keys())
    for k, v in sd.items():
        if k.endswith("inv_freq"):
            assert k not in exp
            continue
        assert exp[k].shape == tuple(v.shape), k
        if "num_batches_tracked" not in k:
            np.testing.assert_array_equal(exp[k], v, err_msg=k)

    # template-free export round-trips through the strict importer
    v2 = convert_torch_state_dict(export_torch_state_dict(variables), zeros,
                                  strict=True)
    for a, b in zip(jax.tree.leaves(variables), jax.tree.leaves(v2)):
        np.testing.assert_array_equal(a, b)
