"""Trainer: optimizer groups, LR schedules, pjit data-parallel train step,
checkpointing.

Behavioral parity target: reference cutie/model/trainer.py:22-246 +
cutie/model/utils/parameter_groups.py:6-71. TPU redesign: DDP+GradScaler
become a jit-compiled train step over a `data` mesh (gradients all-reduce via
XLA collectives); AMP loss-scaling is unnecessary (bf16 on TPU keeps fp32
master params and fp32 gradient accumulation).
"""
from __future__ import annotations

import dataclasses
import logging
import os
import pickle
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cutie_tpu.models.cutie import CUTIE
from cutie_tpu.training.losses import LossComputer
from cutie_tpu.training.train_forward import train_forward

log = logging.getLogger(__name__)

# parameter_groups.py:20 — params whose names end with these get zero weight
# decay (our tree keeps query_init/query_emb as direct leaves)
_EMBED_LEAF_NAMES = ("summary_pos", "query_init", "query_emb", "obj_pe")


def param_label(path: Tuple[str, ...]) -> str:
    if path and path[0] == "pixel_encoder":
        return "backbone"
    if path and path[-1] in _EMBED_LEAF_NAMES:
        return "embed"
    return "other"


def make_lr_schedule(stage_cfg) -> optax.Schedule:
    base = stage_cfg.learning_rate
    kind = stage_cfg.lr_schedule
    if kind == "constant":
        return optax.constant_schedule(base)
    if kind == "poly":
        total = stage_cfg.num_iterations
        return lambda it: base * (1 - it / total) ** 0.9
    if kind == "step":
        steps = list(stage_cfg.lr_schedule_steps)
        gamma = stage_cfg.lr_schedule_gamma
        return optax.piecewise_constant_schedule(
            base, {int(s): gamma for s in steps})
    raise NotImplementedError(kind)


def make_optimizer(stage_cfg) -> optax.GradientTransformation:
    """AdamW with the reference's three parameter groups + global-norm clip."""
    schedule = make_lr_schedule(stage_cfg)
    eps = 1e-6 if stage_cfg.amp else 1e-8
    wd = stage_cfg.weight_decay

    def adamw(lr_ratio: float, weight_decay: float):
        return optax.adamw(lambda it: schedule(it) * lr_ratio, eps=eps,
                           weight_decay=weight_decay)

    tx = optax.multi_transform(
        {
            "backbone": adamw(stage_cfg.backbone_lr_ratio, wd),
            "embed": adamw(1.0, stage_cfg.embed_weight_decay),
            "other": adamw(1.0, wd),
        },
        lambda params: jax.tree_util.tree_map_with_path(
            lambda path, _: param_label(
                tuple(getattr(k, "key", str(k)) for k in path)), params),
    )
    return optax.chain(optax.clip_by_global_norm(stage_cfg.clip_grad_norm), tx)


@dataclasses.dataclass
class Trainer:
    """Holds model/optimizer/state and runs jitted DP train steps."""
    cfg: Any
    stage_cfg: Any
    model: CUTIE
    variables: Dict[str, Any]
    mesh: Optional[Mesh] = None

    def __post_init__(self):
        self.loss_computer = LossComputer(self.cfg, self.stage_cfg)
        self.optimizer = make_optimizer(self.stage_cfg)
        self.params = self.variables["params"]
        self.batch_stats = self.variables.get("batch_stats", {})
        self.opt_state = self.optimizer.init(self.params)
        self.it = 0
        self._build_step()

    def _build_step(self):
        model, stage_cfg = self.model, self.stage_cfg
        loss_computer = self.loss_computer
        optimizer = self.optimizer
        batch_stats = self.batch_stats

        def loss_fn(params, data, rng):
            variables = {"params": params, "batch_stats": batch_stats}
            k_fwd, k_loss = jax.random.split(rng)
            out = train_forward(model, variables, data, k_fwd, stage_cfg)
            loss_in = {"logits_low": out["logits_low"],
                       "cls_gt": data["cls_gt"][:, 1:]}
            if "sensory_logits" in out:
                loss_in["sensory_logits"] = out["sensory_logits"]
            if "q_logits" in out:
                loss_in["q_logits"] = out["q_logits"]
            losses = loss_computer.compute(k_loss, loss_in, data["selector"])
            return losses["total_loss"], (losses, out["logits"])

        def train_step(params, opt_state, data, rng):
            grads, (losses, logits) = jax.grad(
                loss_fn, has_aux=True)(params, data, rng)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, losses, logits

        if self.mesh is not None:
            repl = NamedSharding(self.mesh, P())
            dsh = NamedSharding(self.mesh, P("data"))
            self._train_step = jax.jit(
                train_step,
                in_shardings=(repl, repl, dsh, repl),
                out_shardings=(repl, repl, repl, dsh),
                donate_argnums=(0, 1))
            self.params = jax.device_put(self.params, repl)
            self.opt_state = jax.device_put(self.opt_state, repl)
        else:
            self._train_step = jax.jit(train_step, donate_argnums=(0, 1))

    def upload_batch(self, data: Dict[str, Any]) -> Dict[str, Any]:
        """Async H2D of a host batch (device_put returns immediately); use to
        prefetch batch i+1 while step i computes — the implicit transfer
        inside the jit call would otherwise serialize with compute."""
        if self.mesh is not None:
            from cutie_tpu.parallel.mesh import shard_batch
            return shard_batch(self.mesh, data)
        return jax.device_put(data)

    def do_pass(self, data: Dict[str, jnp.ndarray], it: int,
                rng: jax.Array) -> Dict[str, jnp.ndarray]:
        """One optimization step. data must contain frames / first_frame_gt /
        selector / cls_gt ([B, T, H, W] integer class map; the loss derives
        point labels from frames 1..T-1 on device — no host one-hot)."""
        if self.mesh is not None and not isinstance(data["frames"], jax.Array):
            from cutie_tpu.parallel.mesh import shard_batch
            data = shard_batch(self.mesh, data)
        self.params, self.opt_state, losses, logits = self._train_step(
            self.params, self.opt_state, data, rng)
        # vis grids every log_image_interval (reference trainer.py:113-118)
        # fetch the device array only when asked — free otherwise (async)
        self.last_logits = logits
        # completed-step count: the caller increments its `it` AFTER this
        # call, and checkpoints must record the post-increment value or a
        # resume repeats one step and shifts every save/log boundary
        self.it = it + 1
        return losses

    # ------------------------------------------------------------ checkpoints

    def save_weights(self, path: str) -> None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        flat = _flatten({"params": jax.device_get(self.params),
                         "batch_stats": jax.device_get(self.batch_stats)})
        np.savez(path, **flat)
        log.info("weights saved to %s", path)

    def save_checkpoint(self, path: str) -> None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "wb") as f:
            pickle.dump({
                "it": self.it,
                "params": jax.device_get(self.params),
                "batch_stats": jax.device_get(self.batch_stats),
                "opt_state": jax.device_get(self.opt_state),
            }, f)
        log.info("checkpoint saved to %s", path)

    def load_checkpoint(self, path: str) -> int:
        with open(path, "rb") as f:
            ckpt = pickle.load(f)
        self.params = ckpt["params"]
        self.batch_stats = ckpt["batch_stats"]
        self.opt_state = ckpt["opt_state"]
        self.it = ckpt["it"]
        self._build_step()
        log.info("checkpoint loaded from %s (it=%d)", path, self.it)
        return self.it

    def save_checkpoint_orbax(self, path_dir: str) -> None:
        """Orbax checkpoint (multi-host safe, atomic). Alternative to the
        pickle format for production runs."""
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(os.path.abspath(path_dir), {
            "it": self.it,
            "params": jax.device_get(self.params),
            "batch_stats": jax.device_get(self.batch_stats),
            "opt_state": jax.device_get(self.opt_state),
        }, force=True)
        log.info("orbax checkpoint saved to %s", path_dir)

    def load_checkpoint_orbax(self, path_dir: str) -> int:
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        ckpt = ckptr.restore(os.path.abspath(path_dir))
        self.params = ckpt["params"]
        self.batch_stats = ckpt["batch_stats"]
        self.opt_state = ckpt["opt_state"]
        self.it = int(ckpt["it"])
        self._build_step()
        log.info("orbax checkpoint loaded from %s (it=%d)", path_dir, self.it)
        return self.it

    def get_variables(self) -> Dict[str, Any]:
        return {"params": jax.device_get(self.params),
                "batch_stats": jax.device_get(self.batch_stats)}


def _flatten(tree, prefix="", out=None):
    if out is None:
        out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            _flatten(v, f"{prefix}{k}/", out)
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def load_weights_npz(path: str) -> Dict[str, Any]:
    flat = dict(np.load(path))
    tree: Dict[str, Any] = {}
    for k, v in flat.items():
        if v.dtype == np.float16:
            # fp16 is a STORAGE format (tools/train_synthetic.py halves the
            # committed artifact); params are logically fp32. Loading f16
            # leaves verbatim would trace the whole model in IEEE half —
            # numerically different from every golden stream and, on TPU,
            # an XLA compile that emulates f16 and takes tens of minutes.
            v = v.astype(np.float32)
        node = tree
        parts = k.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree
