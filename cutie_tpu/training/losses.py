"""Training losses: point-sampled CE + dice with auxiliary terms.

Behavioral parity target: reference cutie/model/losses.py:11-97. Differences
forced by jit: per-sequence losses are computed over the PADDED object-channel
axis with a channel mask instead of python-slicing to num_objects — padded
channels carry ~0 probability mass (selector-zeroed upstream), and the
channel mask restores the reference's mean-over-valid-channels dice
normalization.

TPU restructuring (round 4): the reference samples the FULL-RES main logits
(upsampled 4x in cutie/model/cutie.py:200) and a materialized one-hot soft_gt
(losses.py:53-54) — XLA lowers both as per-point row gathers costing
~65 ms/step at production shapes (round-4 device trace: 44% of step time was
zero-FLOP ops, gathers the largest block). This module instead consumes the
PRE-upsample stride-4 logits and the integer class map:

  * main-head sampling runs on the low-res map through the exactly-composed
    upsample+sample weights (ops/point_features.py:point_sample_upsampled);
  * gt labels come from the class map through exact one-hot contractions
    (point_sample_cls_onehot) — no one-hot materialization, no gather.

Both are numerically the reference computation (identity-tested against
torch grid_sample-of-interpolate in tests/test_training.py).
"""
from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp

from cutie_tpu.ops.point_features import (calculate_uncertainty,
                                          get_uncertain_point_coords_with_randomness,
                                          point_sample,
                                          point_sample_cls_onehot,
                                          point_sample_upsampled)


def ce_loss(logits: jnp.ndarray, soft_gt: jnp.ndarray) -> jnp.ndarray:
    """logits/soft_gt: [T, C, P]. Sum over T, mean over P (losses.py:11-16).
    Softmax over the padded channel axis: padded channels contribute ~0 mass
    (their logits are the aggregate() floor)."""
    logp = jax.nn.log_softmax(logits, axis=1)
    loss = -(soft_gt * logp).sum(axis=1)  # [T, P]
    return loss.sum(0).mean()


def dice_loss(mask: jnp.ndarray, soft_gt: jnp.ndarray,
              ch_mask: jnp.ndarray) -> jnp.ndarray:
    """mask/soft_gt: [T, C, P] (softmax probs / one-hot); ch_mask: [C-1]
    validity of the foreground channels (losses.py:19-29: background excluded,
    sum over T, mean over valid channels)."""
    mask = mask[:, 1:]
    gt = soft_gt[:, 1:]
    numerator = 2 * (mask * gt).sum(-1)
    denominator = mask.sum(-1) + gt.sum(-1)
    loss = 1 - (numerator + 1) / (denominator + 1)  # [T, C-1]
    loss = loss * ch_mask[None]
    return loss.sum(0).sum() / jnp.maximum(ch_mask.sum(), 1)


class LossComputer:
    """(losses.py:32-97)"""

    def __init__(self, cfg, stage_cfg):
        self.point_supervision = stage_cfg.point_supervision
        self.num_points = stage_cfg.train_num_points
        self.oversample_ratio = stage_cfg.oversample_ratio
        self.importance_sample_ratio = stage_cfg.importance_sample_ratio
        self.sensory_weight = cfg.model.aux_loss.sensory.weight
        self.query_weight = cfg.model.aux_loss.query.weight

    def mask_loss(self, rng, logits: jnp.ndarray, cls_gt: jnp.ndarray,
                  ch_mask: jnp.ndarray, up_factor: int = 1):
        """logits: [T, C, h, w] at their NATIVE resolution; the sampling
        target is the virtual `up_factor`x bilinear upsample (the reference
        upsamples main logits 4x before sampling; aux heads sample native).
        cls_gt: [T, H, W] integer class map."""
        assert self.point_supervision
        num_classes = logits.shape[1]
        if up_factor > 1:
            sample = functools.partial(point_sample_upsampled,
                                       factor=up_factor)
        else:
            sample = point_sample
        point_coords = jax.lax.stop_gradient(
            get_uncertain_point_coords_with_randomness(
                rng, jax.lax.stop_gradient(logits), calculate_uncertainty,
                self.num_points, self.oversample_ratio,
                self.importance_sample_ratio, sample_fn=sample))
        point_labels = jax.lax.stop_gradient(
            point_sample_cls_onehot(cls_gt, point_coords, num_classes))
        point_logits = sample(logits, point_coords)
        loss_ce = ce_loss(point_logits, point_labels)
        loss_dice = dice_loss(jax.nn.softmax(point_logits, axis=1), point_labels,
                              ch_mask)
        return loss_ce, loss_dice

    def compute(self, rng, data: Dict[str, jnp.ndarray],
                selector: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        """data: {'logits_low': [B, T-1, C, h, w] (stride-4, PRE-upsample),
        'cls_gt': [B, T-1, H, W] integer, 'sensory_logits' optional,
        'q_logits': [B, T-1, C, L, h, w] optional}.
        selector: [B, O] (C = O + 1). Vmapped over batch."""
        b = data["logits_low"].shape[0]
        rngs = jax.random.split(rng, b)
        has_sensory = "sensory_logits" in data
        has_q = "q_logits" in data
        aux_keys = ([("sensory_logits",)] if has_sensory else []) + \
                   ([("q_logits",)] if has_q else [])

        def per_seq(rng_i, logits_low, cls_gt, sel, *aux):
            losses = {}
            ch_mask = sel
            k = jax.random.split(rng_i, 8)
            lc, ld = self.mask_loss(k[0], logits_low, cls_gt, ch_mask,
                                    up_factor=4)
            losses["loss_ce"] = lc
            losses["loss_dice"] = ld
            ai = 0
            if has_sensory:
                lc, ld = self.mask_loss(k[1], aux[ai], cls_gt, ch_mask)
                losses["aux_sensory_ce"] = lc * self.sensory_weight
                losses["aux_sensory_dice"] = ld * self.sensory_weight
                ai += 1
            if has_q:
                aux_q = aux[ai]
                num_levels = aux_q.shape[2]
                for l in range(num_levels):
                    lc, ld = self.mask_loss(k[2 + l], aux_q[:, :, l], cls_gt,
                                            ch_mask)
                    losses[f"aux_query_ce_l{l}"] = lc * self.query_weight
                    losses[f"aux_query_dice_l{l}"] = ld * self.query_weight
            return losses

        aux_args = [data[k[0]] for k in aux_keys]
        losses = jax.vmap(per_seq)(rngs, data["logits_low"], data["cls_gt"],
                                   selector, *aux_args)
        losses = {k: v.mean() for k, v in losses.items()}
        losses["total_loss"] = sum(losses.values())
        return losses
