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

        variables = None
        if weights.endswith(".npz"):
            sd = dict(np.load(weights))
            if any(k.startswith(("params/", "batch_stats/")) for k in sd):
                # our own trainer.save_weights format (flax paths, HWIO) —
                # routing it through the torch converter would match zero
                # keys and silently produce a garbage model
                from cutie_tpu.training.trainer import load_weights_npz
                variables = load_weights_npz(weights)
        else:
            sd = load_torch_checkpoint(weights)
        if variables is None:
            sd = apply_object_surgery(sd, single_object, cfg.model.sensory_dim,
                                      cfg.model.value_dim)
            # unmapped keys fall back to a REAL initialization (strict=False):
            # an eval_shape zeros tree would silently zero-fill any param the
            # key mapping misses (and zero BN variance)
            targets = init_variables(model)
            variables = convert_torch_state_dict(sd, targets, strict=False)
    else:
        if weights:
            log.warning("Weights %s not found; using random init.", weights)
        variables = init_variables(model)
    # Commit the variables to the device ONCE. The weight converters return
    # host numpy pytrees; leaving them as numpy makes every jitted step call
    # re-upload the full ~140MB parameter set (round 4's bench collapse:
    # 3.5 s/frame over the dev tunnel — 0.3 FPS in BENCH_r04.json — was
    # exactly this transfer, not compute; random-init models were immune
    # because model.init returns device arrays).
    variables = jax.device_put(variables)
    return ModelBundle(model=model, variables=variables, cfg=cfg)


def download_models_if_needed(weights_path: str) -> None:
    """Download + md5-check the released weights (download_models.py:13-32).
    No-op (with a warning) when the environment has no egress."""
    import hashlib
    import urllib.request

    if not weights_path:
        return
    name = os.path.basename(weights_path)
    if name not in _WEIGHT_URLS:
        return
    url, md5 = _WEIGHT_URLS[name]

    def md5_ok(p):
        with open(p, "rb") as f:
            return hashlib.md5(f.read()).hexdigest() == md5

    if os.path.exists(weights_path):
        # re-verify like the reference (download_models.py:19): a partial
        # download left on disk would otherwise wedge every future run
        if md5_ok(weights_path):
            return
        log.warning("md5 mismatch for existing %s; re-downloading.",
                    weights_path)
        os.remove(weights_path)
    os.makedirs(os.path.dirname(weights_path) or ".", exist_ok=True)
    tmp_path = weights_path + ".part"
    try:
        log.info("Downloading %s ...", url)
        urllib.request.urlretrieve(url, tmp_path)
    except OSError as e:
        if os.path.exists(tmp_path):
            os.remove(tmp_path)
        log.warning("Could not download weights (%s); continuing without.", e)
        return
    if not md5_ok(tmp_path):
        os.remove(tmp_path)
        raise RuntimeError(f"md5 mismatch for downloaded {weights_path}")
    os.replace(tmp_path, weights_path)


def get_default_model(weights: Optional[str] = None) -> ModelBundle:
    """Reference-parity default: cutie-base(-mega) at eval settings.

    Raises if the weights cannot be found/downloaded — the reference's
    torch.load would; silently returning a random-init model gives a
    zero-exit run producing nonsense masks."""
    cfg = eval_config("base")
    if weights is not None:
        cfg.weights = weights
    get_dataset_cfg(cfg)
    download_models_if_needed(cfg.weights)
    if not (cfg.weights and os.path.exists(str(cfg.weights))):
        raise FileNotFoundError(
            f"model weights not found at {cfg.weights!r} and could not be "
            f"downloaded; pass an explicit path (build_model(weights=None) "
            f"gives an un-trained model deliberately)")
    return build_model(cfg, cfg.weights)
