"""Model construction helpers — the `get_default_model()` entry point.

Behavioral parity target: reference cutie/utils/get_default_model.py:14-28
(compose eval config, download weights, construct + load). Downloading is
gated on network availability; weight paths can also be given explicitly.
"""
from __future__ import annotations

import dataclasses
import logging
import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from cutie_tpu.config import Config, eval_config, get_dataset_cfg
from cutie_tpu.models import CUTIE

log = logging.getLogger(__name__)

_WEIGHT_URLS = {
    # mirrors reference cutie/utils/download_models.py:8-11
    "cutie-base-mega.pth":
        ("https://github.com/hkchengrex/Cutie/releases/download/v1.0/"
         "cutie-base-mega.pth", "a6071de6136982e396851903ab4c083a"),
}


@dataclasses.dataclass
class ModelBundle:
    """A CUTIE model + its variables ({'params', 'batch_stats'})."""
    model: CUTIE
    variables: Dict[str, Any]
    cfg: Config

    @property
    def num_params(self) -> int:
        return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(self.variables["params"]))


def init_variables(model: CUTIE, image_size: int = 64, num_objects: int = 2,
                   seed: int = 0) -> Dict[str, Any]:
    import jax.numpy as jnp

    img = jnp.zeros((1, image_size, image_size, 3))
    masks = jnp.zeros((1, num_objects, image_size, image_size))
    return dict(model.init(jax.random.PRNGKey(seed), img, masks))


def build_model(cfg: Config, weights: Optional[str] = None,
                single_object: bool = False) -> ModelBundle:
    """Construct CUTIE and optionally load a reference .pth / our .npz weights.

    cfg.amp=True (the reference's inference autocast flag — eval_vos.py:66,
    112 wraps the step in torch.cuda.amp.autocast; the GUI runs amp by
    default, gui_config.yaml:11) or cfg.compute_dtype='bfloat16' builds the
    conv/transformer stacks in bf16; params and the fp32 islands (attention
    read, GRUs, final logits, summarizer pooling) stay fp32 exactly as in
    training."""
    dtype = (jnp.bfloat16
             if (str(cfg.get("compute_dtype", "float32")) == "bfloat16"
                 or bool(cfg.get("amp", False)))
             else jnp.float32)
    model = CUTIE(cfg, single_object=single_object, dtype=dtype)
    if weights and os.path.exists(weights):
        from cutie_tpu.utils.weight_import import (apply_object_surgery,
                                                   convert_torch_state_dict,
                                                   load_torch_checkpoint)

        if weights.endswith(".npz"):
            sd = dict(np.load(weights))
        else:
            sd = load_torch_checkpoint(weights)
        sd = apply_object_surgery(sd, single_object, cfg.model.sensory_dim,
                                  cfg.model.value_dim)
        shapes = jax.eval_shape(
            model.init, jax.random.PRNGKey(0),
            jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 2, 64, 64)))
        zeros = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), dict(shapes))
        variables = convert_torch_state_dict(sd, zeros, strict=False)
    else:
        if weights:
            log.warning("Weights %s not found; using random init.", weights)
        variables = init_variables(model)
    return ModelBundle(model=model, variables=variables, cfg=cfg)


def download_models_if_needed(weights_path: str) -> None:
    """Download + md5-check the released weights (download_models.py:13-32).
    No-op (with a warning) when the environment has no egress."""
    import hashlib
    import urllib.request

    name = os.path.basename(weights_path)
    if os.path.exists(weights_path) or name not in _WEIGHT_URLS:
        return
    url, md5 = _WEIGHT_URLS[name]
    os.makedirs(os.path.dirname(weights_path) or ".", exist_ok=True)
    try:
        log.info("Downloading %s ...", url)
        urllib.request.urlretrieve(url, weights_path)
    except OSError as e:
        log.warning("Could not download weights (%s); continuing without.", e)
        return
    with open(weights_path, "rb") as f:
        if hashlib.md5(f.read()).hexdigest() != md5:
            raise RuntimeError(f"md5 mismatch for {weights_path}")


def get_default_model(weights: Optional[str] = None) -> ModelBundle:
    """Reference-parity default: cutie-base(-mega) at eval settings."""
    cfg = eval_config("base")
    if weights is not None:
        cfg.weights = weights
    get_dataset_cfg(cfg)
    download_models_if_needed(cfg.weights)
    return build_model(cfg, cfg.weights)
