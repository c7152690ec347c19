"""RITM training-side losses, metrics, and initializers (jax).

Behavioral parity targets: reference gui/ritm/model/losses.py:9-185
(NormalizedFocalLossSigmoid / FocalLoss / SoftIoU /
SigmoidBinaryCrossEntropyLoss), metrics.py:29-101 (AdaptiveIoU), and
initializer.py:47-105 (Bilinear / XavierGluon). These are the substantive
pieces of RITM's training stack — functional jax losses usable under jit
plus host-side metric tracking. (RITM's exp/log/vis/distributed scaffolding
is torch/tensorboard plumbing covered by the framework-level equivalents in
cutie_tpu/utils and cutie_tpu/parallel.)

Labels may contain `ignore_label` (-1) pixels which drop out of every loss.
All losses return per-sample values [B] like the reference (reduction over
non-batch dims), so callers choose the batch reduction.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def normalized_focal_loss_sigmoid(pred: jnp.ndarray, label: jnp.ndarray, *,
                                  alpha: float = 0.25, gamma: float = 2.0,
                                  max_mult: float = -1, eps: float = 1e-12,
                                  from_sigmoid: bool = False,
                                  detach_delimeter: bool = True,
                                  ignore_label: float = -1,
                                  return_mult: bool = False):
    """NFL: focal loss whose modulation is renormalized per image so the
    total focal weight equals the pixel count (losses.py:38-85). Returns
    per-sample loss [B] (and the per-image mult if return_mult, which the
    reference tracks as its `_k_sum` monitoring EMA)."""
    one_hot = label > 0.5
    sw = (label != ignore_label).astype(pred.dtype)
    p = pred if from_sigmoid else jax.nn.sigmoid(pred)
    a = jnp.where(one_hot, alpha * sw, (1 - alpha) * sw)
    pt = jnp.where(sw > 0, 1.0 - jnp.abs(label - p), jnp.ones_like(p))
    beta = (1.0 - pt) ** gamma
    sw_sum = jnp.sum(sw, axis=(-2, -1), keepdims=True)
    beta_sum = jnp.sum(beta, axis=(-2, -1), keepdims=True)
    mult = sw_sum / (beta_sum + eps)
    if detach_delimeter:
        mult = jax.lax.stop_gradient(mult)
    beta = beta * mult
    if max_mult > 0:
        beta = jnp.minimum(beta, max_mult)
    loss = -a * beta * jnp.log(jnp.minimum(pt + eps, 1.0))
    loss = loss * sw
    rest = tuple(range(1, loss.ndim))
    bsum = jnp.sum(sw, axis=rest)
    out = jnp.sum(loss, axis=rest) / (bsum + eps)
    if return_mult:
        return out, mult.reshape(mult.shape[0], -1).mean(axis=-1)
    return out


def focal_loss_sigmoid(pred: jnp.ndarray, label: jnp.ndarray, *,
                       alpha: float = 0.25, gamma: float = 2.0,
                       eps: float = 1e-9, from_logits: bool = False,
                       scale: float = 1.0,
                       ignore_label: float = -1) -> jnp.ndarray:
    """Plain focal loss (losses.py:91-144). Returns [B]."""
    one_hot = label > 0.5
    sw = (label != ignore_label).astype(pred.dtype)
    p = pred if from_logits else jax.nn.sigmoid(pred)
    a = jnp.where(one_hot, alpha * sw, (1 - alpha) * sw)
    pt = jnp.where(sw > 0, 1.0 - jnp.abs(label - p), jnp.ones_like(p))
    beta = (1.0 - pt) ** gamma
    loss = -a * beta * jnp.log(jnp.minimum(pt + eps, 1.0)) * sw
    rest = tuple(range(1, loss.ndim))
    tsum = jnp.sum(sw, axis=rest)
    return scale * jnp.sum(loss, axis=rest) / (tsum + eps)


def soft_iou_loss(pred: jnp.ndarray, label: jnp.ndarray, *,
                  from_sigmoid: bool = False,
                  ignore_label: float = -1) -> jnp.ndarray:
    """1 - soft IoU over [C, H, W] dims (losses.py:146-162). Returns [B]."""
    sw = (label != ignore_label).astype(pred.dtype)
    p = pred if from_sigmoid else jax.nn.sigmoid(pred)
    inter = jnp.sum(p * label * sw, axis=(1, 2, 3))
    union = jnp.sum(jnp.maximum(p, label) * sw, axis=(1, 2, 3))
    return 1.0 - inter / (union + 1e-8)


def sigmoid_bce_loss(pred: jnp.ndarray, label: jnp.ndarray, *,
                     from_sigmoid: bool = False,
                     ignore_label: float = -1) -> jnp.ndarray:
    """Numerically-stable sigmoid BCE with ignore pixels (losses.py:165-185).
    Returns [B] (MEAN over non-batch dims, matching the reference)."""
    sw = (label != ignore_label).astype(pred.dtype)
    lbl = jnp.where(sw > 0, label, jnp.zeros_like(label))
    if not from_sigmoid:
        loss = (jax.nn.relu(pred) - pred * lbl
                + jax.nn.softplus(-jnp.abs(pred)))
    else:
        eps = 1e-12
        loss = -(jnp.log(pred + eps) * lbl
                 + jnp.log(1.0 - pred + eps) * (1.0 - lbl))
    loss = loss * sw
    rest = tuple(range(1, loss.ndim))
    return jnp.mean(loss, axis=rest)


class AdaptiveIoU:
    """Training IoU metric with a self-adapting binarization threshold
    (metrics.py:29-84): each update tries thresh +/- step and EMA-tracks the
    best. Host-side (numpy) like the reference's .cpu() bookkeeping."""

    def __init__(self, init_thresh: float = 0.4, thresh_step: float = 0.025,
                 thresh_beta: float = 0.99, iou_beta: float = 0.9,
                 ignore_label: float = -1, from_logits: bool = True):
        self._ignore_label = ignore_label
        self._from_logits = from_logits
        self._iou_thresh = init_thresh
        self._thresh_step = thresh_step
        self._thresh_beta = thresh_beta
        self._iou_beta = iou_beta
        self.ema_iou = 0.0
        self._epoch_iou_sum = 0.0
        self._epoch_batch_count = 0

    @property
    def iou_thresh(self) -> float:
        return self._iou_thresh

    def update(self, pred, gt) -> None:
        pred = np.asarray(pred, np.float32)
        gt = np.asarray(gt, np.float32)
        gt_mask = gt > 0.5
        if self._from_logits:
            pos = pred >= 0
            ex = np.exp(np.where(pos, -pred, pred))
            pred = np.where(pos, 1.0 / (1.0 + ex), ex / (1.0 + ex))
        if not gt_mask.reshape(gt_mask.shape[0], -1).any(axis=1).any():
            return
        ignore = gt == self._ignore_label
        best_t = self._iou_thresh
        max_iou = _compute_iou(pred > best_t, gt_mask, ignore).mean()
        for t in (best_t - self._thresh_step, best_t + self._thresh_step):
            iou = _compute_iou(pred > t, gt_mask, ignore).mean()
            if iou > max_iou:
                max_iou, best_t = iou, t
        self._iou_thresh = (self._thresh_beta * self._iou_thresh
                            + (1 - self._thresh_beta) * best_t)
        self.ema_iou = (self._iou_beta * self.ema_iou
                        + (1 - self._iou_beta) * max_iou)
        self._epoch_iou_sum += max_iou
        self._epoch_batch_count += 1

    def get_epoch_value(self) -> float:
        if self._epoch_batch_count > 0:
            return self._epoch_iou_sum / self._epoch_batch_count
        return 0.0

    def reset_epoch_stats(self) -> None:
        self._epoch_iou_sum = 0.0
        self._epoch_batch_count = 0


def _compute_iou(pred_mask, gt_mask, ignore_mask=None,
                 keep_ignore: bool = False):
    """Per-sample IoU over all non-batch dims (metrics.py:86-101)."""
    if ignore_mask is not None:
        pred_mask = np.where(ignore_mask, False, pred_mask)
    rest = tuple(range(1, gt_mask.ndim))
    union = (pred_mask | gt_mask).astype(np.float32).mean(axis=rest)
    inter = (pred_mask & gt_mask).astype(np.float32).mean(axis=rest)
    nonzero = union > 0
    iou = inter[nonzero] / union[nonzero]
    if not keep_ignore:
        return iou
    result = np.full_like(inter, -1.0)
    result[nonzero] = iou
    return result


# ----------------------------------------------------------- initializers


def bilinear_upsample_kernel(scale: int) -> np.ndarray:
    """Bilinear upsampling conv kernel [k, k] (initializer.py:66-77)."""
    k = 2 * scale - scale % 2
    s = (k + 1) // 2
    center = s - 0.5 * (1 + k % 2)
    og = np.ogrid[:k, :k]
    return ((1 - np.abs(og[0] - center) / s)
            * (1 - np.abs(og[1] - center) / s)).astype(np.float32)


def bilinear_init(scale: int, groups: int, in_channels: int):
    """flax kernel_init for a transposed conv that starts as exact bilinear
    upsampling (initializer.py:47-64). Kernel layout HWIO."""
    ker = bilinear_upsample_kernel(scale)

    def init(key, shape, dtype=jnp.float32):
        kh, kw, cin, cout = shape
        w = np.zeros(shape, np.float32)
        for i in range(in_channels):
            j = i if groups == 1 else 0
            w[:, :, j, i] = ker[:kh, :kw]
        return jnp.asarray(w, dtype)

    return init


def xavier_gluon_init(rnd_type: str = "uniform", factor_type: str = "avg",
                      magnitude: float = 3.0):
    """Gluon-style Xavier (initializer.py:79-105) as a flax kernel_init.
    fan computed like torch for HWIO conv kernels."""

    def init(key, shape, dtype=jnp.float32):
        if len(shape) == 4:
            rf = shape[0] * shape[1]
            fan_in, fan_out = shape[2] * rf, shape[3] * rf
        else:
            fan_in, fan_out = shape[0], shape[-1]
        if factor_type == "avg":
            factor = (fan_in + fan_out) / 2.0
        elif factor_type == "in":
            factor = fan_in
        elif factor_type == "out":
            factor = fan_out
        else:
            raise ValueError("Incorrect factor type")
        scale = float(np.sqrt(magnitude / factor))
        if rnd_type == "uniform":
            return jax.random.uniform(key, shape, dtype, -scale, scale)
        if rnd_type == "gaussian":
            return jax.random.normal(key, shape, dtype) * scale
        raise ValueError("Unknown random type")

    return init
