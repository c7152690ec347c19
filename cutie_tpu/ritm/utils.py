"""RITM model loading + click controller glue.

Behavioral parity targets: gui/ritm/inference/utils.py:20-44 (load_is_model
rebuilding the model from the checkpoint's serialized config) and
gui/click_controller.py (ClickController wrapper used by the GUI).
"""
from __future__ import annotations

import logging
from typing import Optional

import numpy as np

from cutie_tpu.ritm.inference import InteractiveController
from cutie_tpu.ritm.model import HRNetISModel
from cutie_tpu.ritm.weight_import import convert_ritm_state_dict, load_ritm_raw

log = logging.getLogger(__name__)


def _config_param(params: dict, key: str):
    """Serialized configs store {'type','value','specified'} per param
    (gui/ritm/utils/serialization.py:16-33); plain dicts store the value."""
    v = params[key]
    return v["value"] if isinstance(v, dict) and "value" in v else v


def load_is_model(checkpoint_path: Optional[str], **model_overrides):
    """Build the interactive model (+variables) from a reference RITM .pth if
    given, else random HRNet init. Dispatches on the checkpoint's serialized
    config class like gui/ritm/utils/serialization.py:load_model — HRNetModel
    -> HRNetISModel, DeeplabModel -> DeepLabISModel. Returns (model, variables)."""
    import jax
    import jax.numpy as jnp

    kwargs = dict(width=18, ocr_width=64, small=False, with_prev_mask=True,
                  use_disks=True, norm_radius=5, use_rgb_conv=False,
                  use_leaky_relu=True)
    config = None
    sd = None
    if checkpoint_path:
        try:
            raw = load_ritm_raw(checkpoint_path)
            if isinstance(raw, dict) and "config" in raw:
                import json
                config = json.loads(raw["config"]) if isinstance(
                    raw["config"], str) else raw["config"]
            sd = {k: v.numpy() for k, v in raw.get("state_dict", raw).items()
                  if hasattr(v, "numpy")}
        except Exception as e:
            log.warning("Could not load RITM checkpoint %s: %s", checkpoint_path, e)

    cls_name = ""
    params = {}
    if isinstance(config, dict):
        cls_name = str(config.get("class", ""))
        params = config.get("params", {}) or {}

    if cls_name.rsplit(".", 1)[-1] == "DeeplabModel":
        from cutie_tpu.ritm.deeplab import DeepLabISModel
        dl_kwargs = dict(deeplab_ch=256, with_prev_mask=True, use_disks=True,
                         norm_radius=5.0, use_leaky_relu=False)
        for src, dst in (("deeplab_ch", "deeplab_ch"),
                         ("with_prev_mask", "with_prev_mask"),
                         ("use_disks", "use_disks"),
                         ("norm_radius", "norm_radius"),
                         ("use_leaky_relu", "use_leaky_relu")):
            if src in params:
                dl_kwargs[dst] = _config_param(params, src)
        dl_kwargs.update({k: v for k, v in model_overrides.items()
                          if k in dl_kwargs})
        model = DeepLabISModel(**dl_kwargs)
        c_in = 3 + (1 if dl_kwargs["with_prev_mask"] else 0)
        shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                                jnp.zeros((1, 64, 64, c_in)),
                                jnp.full((1, 2, 3), -1.0))
        zeros = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), dict(shapes))
        variables = convert_ritm_state_dict(sd, zeros, strict=False)
        # device-commit once: numpy leaves re-upload per jitted click
        return model, jax.device_put(variables)

    if params:
        for k in ("width", "ocr_width", "small", "with_prev_mask", "use_disks",
                  "norm_radius", "use_rgb_conv", "use_leaky_relu"):
            if k in params:
                kwargs[k] = _config_param(params, k)
    kwargs.update(model_overrides)

    model = HRNetISModel(**kwargs)
    c_in = 3 + (1 if kwargs["with_prev_mask"] else 0)
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                            jnp.zeros((1, 64, 64, c_in)),
                            jnp.full((1, 2, 3), -1.0))
    zeros = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), dict(shapes))
    if sd is not None:
        # device-commit once: numpy leaves re-upload per jitted click
        variables = jax.device_put(convert_ritm_state_dict(sd, zeros,
                                                           strict=False))
    else:
        variables = dict(model.init(jax.random.PRNGKey(0),
                                    jnp.zeros((1, 64, 64, c_in)),
                                    jnp.full((1, 2, 3), -1.0)))
    return model, variables


class ClickController:
    """GUI-facing click controller (gui/click_controller.py).

    amp: run the HRNet forward (backbone + head reruns inside BRS) in
    bfloat16 with fp32 logits/loss — ~2x the click rate on TPU. Default
    'auto' = bf16 on accelerators, fp32 on CPU (keeps golden-parity tests
    exact). The reference runs its predictor fp32 on GPU; bf16 here shifts
    soft boundaries by O(1e-3) probability, well inside click-to-click
    variation."""

    def __init__(self, checkpoint_path: Optional[str], max_size: int = 800,
                 brs_mode: str = "f-BRS-B", amp: Optional[bool] = None):
        import jax
        import jax.numpy as jnp

        if amp is None:
            amp = jax.default_backend() not in ("cpu",)
        overrides = {"dtype": jnp.bfloat16} if amp else {}
        model, variables = load_is_model(checkpoint_path, **overrides)
        # mirrors the GUI's predictor params (gui/click_controller.py:10-33)
        predictor_params = {
            "brs_mode": brs_mode,
            "prob_thresh": 0.5,
            "net_clicks_limit": 8,
            "max_size": max_size,
            "with_flip": True,
            "zoom_in_params": {
                "skip_clicks": 1,
                "target_size": 480,
                "expansion_ratio": 1.4,
            },
            "brs_opt_func_params": {"min_iou_diff": 1e-3},
            "lbfgs_params": {"maxfun": 20},
        }
        self.controller = InteractiveController(model, variables, predictor_params)
        self.anchored = False

    def unanchor(self):
        self.anchored = False

    def interact(self, image: np.ndarray, x: int, y: int, is_positive: bool,
                 prev_mask: Optional[np.ndarray] = None) -> np.ndarray:
        """image: [C, H, W] float 0..1. Returns prob [1, 1, H, W]."""
        if not self.anchored:
            self.controller.set_image(image)
            self.controller.reset_predictor()
            self.anchored = True
        return self.controller.add_click(x, y, is_positive, prev_mask=prev_mask)

    def undo(self) -> Optional[np.ndarray]:
        self.controller.undo_click()
        if len(self.controller.probs_history) == 0:
            return None
        return (self.controller.probs_history[-1][1] > 0.5).astype(np.float32)
