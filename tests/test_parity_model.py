"""Numerical parity of the model stack against recorded reference activations.

Fixtures are produced by tools/gen_golden.py from the reference torch
implementation (random weights, randomized frozen-BN stats, tiny inputs).
"""
import numpy as np
import pytest

from tests.conftest import require_golden

RTOL = 2e-3
ATOL = 2e-4


def assert_close(actual, desired, rtol=RTOL, atol=ATOL):
    """allclose with the absolute tolerance expressed in units of the golden
    tensor's scale: the base (R50) variant produces activations O(100), where
    a fixed 2e-4 atol is below fp32 accumulation-order noise."""
    desired = np.asarray(desired)
    scale = max(1.0, float(np.abs(desired).max()))
    np.testing.assert_allclose(np.asarray(actual), desired, rtol=rtol,
                               atol=atol * scale)

_jit_cache = {}


def jit_apply(model, method, static=()):
    """Jitted model.apply for a stage method (compile once per method)."""
    import functools
    import jax
    key = (id(model), method, static)
    if key not in _jit_cache:
        _jit_cache[key] = jax.jit(
            functools.partial(model.apply, method=method), static_argnames=static)
    return _jit_cache[key]


def to_nhwc(x):
    return np.transpose(x, (0, 2, 3, 1))


def group_to_nhwc(x):
    # [B,N,C,H,W] -> [B,N,H,W,C]
    return np.transpose(x, (0, 1, 3, 4, 2))


@pytest.fixture(scope="module", params=["small", "base"])
def small_setup(request):
    """Variant-parametrized model + reference activations. `base` runs the
    flagship R50 config (pixel_dim 256, ms_dims [1024,512,256] — reference
    cutie/config/model/base.yaml:4-26); its fixture ships fp16-rounded weights
    (identical values on both sides, fp32 compute)."""
    import jax

    from cutie_tpu.config import eval_config
    from cutie_tpu.models import CUTIE
    from cutie_tpu.utils.weight_import import convert_torch_state_dict

    variant = request.param
    sd_path = require_golden(f"state_dict_{variant}.npz")
    stages_path = require_golden(f"stages_{variant}.npz")
    sd = {k: v.astype(np.float32) for k, v in np.load(sd_path).items()}
    rec = dict(np.load(stages_path))

    cfg = eval_config(variant)
    model = CUTIE(cfg)
    image = to_nhwc(rec["image"])
    masks = rec["masks"]
    # shape-only init: no compute, just the param tree structure
    var_shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), image, masks)
    import jax.numpy as jnp
    zeros = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), dict(var_shapes))
    variables = convert_torch_state_dict(sd, zeros, strict=True)
    return model, variables, rec


def test_weight_import_strict(small_setup):
    # strict=True in the fixture already asserts full coverage
    model, variables, rec = small_setup
    assert "params" in variables and "batch_stats" in variables


def test_encode_image(small_setup):
    model, variables, rec = small_setup
    ms_feat, pix_feat = jit_apply(model, "encode_image")(variables, to_nhwc(rec["image"]))
    assert_close(np.asarray(ms_feat[0]), to_nhwc(rec["f16"]))
    assert_close(np.asarray(ms_feat[1]), to_nhwc(rec["f8"]))
    assert_close(np.asarray(ms_feat[2]), to_nhwc(rec["f4"]))
    assert_close(np.asarray(pix_feat), to_nhwc(rec["pix_feat"]))


def test_transform_key(small_setup):
    model, variables, rec = small_setup
    key, shrinkage, selection = jit_apply(model, "transform_key")(variables, to_nhwc(rec["f16"]))
    assert_close(np.asarray(key), to_nhwc(rec["key"]))
    assert_close(np.asarray(shrinkage), to_nhwc(rec["shrinkage"]),
                               atol=1e-3)
    assert_close(np.asarray(selection), to_nhwc(rec["selection"]))


def test_encode_mask(small_setup):
    model, variables, rec = small_setup
    msk_value, new_sensory, obj_summaries, _ = jit_apply(
        model, "encode_mask", static=("deep_update",))(
        variables, to_nhwc(rec["image"]), to_nhwc(rec["pix_feat"]),
        group_to_nhwc(rec["sensory"]), rec["masks"], deep_update=True)
    assert_close(np.asarray(msk_value), group_to_nhwc(rec["msk_value"]))
    # tanh-bounded GRU state: 1e-3 abs is tight for the R50-depth stack
    assert_close(np.asarray(new_sensory),
                 group_to_nhwc(rec["new_sensory"]), atol=1e-3)
    assert_close(np.asarray(obj_summaries), rec["obj_summaries"],
                               atol=2e-3)


def test_pixel_fusion(small_setup):
    model, variables, rec = small_setup
    fused = jit_apply(model, "pixel_fusion")(
        variables, to_nhwc(rec["pix_feat"]), group_to_nhwc(rec["pixel_readout_in"]),
        group_to_nhwc(rec["sensory"]), rec["masks"])
    assert_close(np.asarray(fused), group_to_nhwc(rec["fused"]))


def test_readout_query(small_setup):
    model, variables, rec = small_setup
    obj_mem = rec["obj_summaries"][:, :, None]  # add T=1
    mem_readout, aux = jit_apply(model, "readout_query")(
        variables, group_to_nhwc(rec["fused"]), obj_mem)
    assert_close(np.asarray(mem_readout),
                               group_to_nhwc(rec["mem_readout"]),
                               atol=2e-3)
    assert_close(np.asarray(aux["logits"]), rec["qt_logits"],
                               atol=2e-3)


def test_segment(small_setup):
    model, variables, rec = small_setup
    ms_feat = (to_nhwc(rec["f16"]), to_nhwc(rec["f8"]), to_nhwc(rec["f4"]))
    sensory, logits, prob = jit_apply(model, "segment")(
        variables, ms_feat, group_to_nhwc(rec["mem_readout"]),
        group_to_nhwc(rec["sensory"]))
    assert_close(np.asarray(sensory), group_to_nhwc(rec["seg_sensory"]),
                               atol=2e-3)
    assert_close(np.asarray(logits), rec["seg_logits"],
                               atol=5e-3)
    assert_close(np.asarray(prob), rec["seg_prob"],
                               atol=1e-3)


def test_read_memory_train_path(small_setup):
    model, variables, rec = small_setup
    mem_key = np.transpose(rec["mem_key_t"], (0, 2, 3, 4, 1))    # B,T,h,w,CK
    mem_shr = np.transpose(rec["mem_shr_t"], (0, 2, 3, 4, 1))    # B,T,h,w,1
    mem_val = np.transpose(rec["mem_val_t"], (0, 1, 3, 4, 5, 2))  # B,N,T,h,w,CV
    selector = np.ones(rec["masks"].shape[:2], np.float32)
    readout_t, aux_t = jit_apply(model, "read_memory")(
        variables, to_nhwc(rec["key"]), to_nhwc(rec["selection"]), mem_key, mem_shr,
        mem_val, rec["obj_memory_t"], to_nhwc(rec["pix_feat"]),
        group_to_nhwc(rec["sensory"]), rec["masks"], selector)
    assert_close(np.asarray(readout_t), group_to_nhwc(rec["readout_t"]),
                               atol=2e-3)
    aux_out = jit_apply(model, "compute_aux")(
        variables, to_nhwc(rec["pix_feat"]), aux_t, selector)
    assert_close(np.asarray(aux_out["sensory_logits"]),
                               rec["aux_sensory_logits"], atol=2e-3)
    assert_close(np.asarray(aux_out["q_logits"]),
                               rec["aux_q_logits"], atol=2e-3)


def test_resnet50_trunk_parity():
    """Bottleneck-block coverage (the full-model fixtures use resnet18)."""
    import jax
    import jax.numpy as jnp

    from cutie_tpu.models.resnet import ResNetTrunk
    from cutie_tpu.utils.weight_import import convert_torch_state_dict

    raw = dict(np.load(require_golden("resnet50_trunk.npz")))
    sd = {k[3:]: v for k, v in raw.items() if k.startswith("sd:")}

    trunk = ResNetTrunk("resnet50")
    x = to_nhwc(raw["x"])
    shapes = jax.eval_shape(trunk.init, jax.random.PRNGKey(0), jnp.asarray(x))
    zeros = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), dict(shapes))
    variables = convert_torch_state_dict(sd, zeros, strict=True)
    f4, f8, f16 = jax.jit(trunk.apply)(variables, x)
    assert_close(np.asarray(f4), to_nhwc(raw["f4"]), rtol=2e-3,
                               atol=3e-4)
    assert_close(np.asarray(f8), to_nhwc(raw["f8"]), rtol=2e-3,
                               atol=3e-4)
    assert_close(np.asarray(f16), to_nhwc(raw["f16"]), rtol=2e-3,
                               atol=5e-4)


def test_stem_matmul_form_exact():
    """The TPU fold-4 matmul stem (fwd + both grads all MXU matmuls,
    resnet.py:_stem_conv_planes) must match the plain strided conv it
    reformulates to fp accuracy — it only runs on real hardware (StemConv
    gates it off-CPU for golden bit-stability), so pin it directly here."""
    import jax
    import jax.numpy as jnp

    from cutie_tpu.models.resnet import _stem_conv_plain, _stem_conv_planes

    rng = np.random.default_rng(7)
    for c_in, hw in ((3, 64), (5, 48), (4, 32)):
        x = jnp.asarray(rng.standard_normal((2, hw, hw, c_in)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((7, 7, c_in, 64)) * 0.1,
                        jnp.float32)
        ref = _stem_conv_plain(x, k, jnp.float32)
        got = _stem_conv_planes(x, k, jnp.float32)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    # gradients route through the same reformulation: check the VJP too
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 5)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((7, 7, 5, 64)) * 0.1, jnp.float32)
    ct = jnp.asarray(rng.standard_normal((1, 16, 16, 64)), jnp.float32)
    g_ref = jax.vjp(lambda a, b: _stem_conv_plain(a, b, jnp.float32), x, k)[1](ct)
    g_got = jax.vjp(lambda a, b: _stem_conv_planes(a, b, jnp.float32), x, k)[1](ct)
    for r, g in zip(g_ref, g_got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-4, atol=1e-4)
