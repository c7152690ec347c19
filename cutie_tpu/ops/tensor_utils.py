"""Shape/probability utilities (NHWC, channels-last).

Behavioral parity targets: reference cutie/utils/tensor_utils.py:7-61
(pad_divide_by, unpad, aggregate, cls_to_one_hot), re-expressed for
channels-last layouts where spatial dims are axes (-3, -2).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np


def compute_pad(h: int, w: int, d: int) -> Tuple[int, int, int, int]:
    """Padding (lw, uw, lh, uh) to make (h, w) divisible by d, split evenly
    with the extra pixel on the upper/right side (reference tensor_utils.py:7-22)."""
    new_h = h + (d - h % d) % d
    new_w = w + (d - w % d) % d
    lh = (new_h - h) // 2
    uh = (new_h - h) - lh
    lw = (new_w - w) // 2
    uw = (new_w - w) - lw
    return (lw, uw, lh, uh)


def pad_divide_by(x: jnp.ndarray, d: int) -> Tuple[jnp.ndarray, Tuple[int, int, int, int]]:
    """Zero-pad spatial axes (-3, -2) of a channels-last array to multiples of d."""
    h, w = x.shape[-3], x.shape[-2]
    lw, uw, lh, uh = compute_pad(h, w, d)
    pad_width = [(0, 0)] * (x.ndim - 3) + [(lh, uh), (lw, uw), (0, 0)]
    return jnp.pad(x, pad_width), (lw, uw, lh, uh)


def pad_divide_by_2d(x: jnp.ndarray, d: int) -> Tuple[jnp.ndarray, Tuple[int, int, int, int]]:
    """Same but for arrays whose LAST TWO axes are spatial (e.g. masks [..., H, W])."""
    h, w = x.shape[-2], x.shape[-1]
    lw, uw, lh, uh = compute_pad(h, w, d)
    pad_width = [(0, 0)] * (x.ndim - 2) + [(lh, uh), (lw, uw)]
    return jnp.pad(x, pad_width), (lw, uw, lh, uh)


def unpad(x: jnp.ndarray, pad: Sequence[int], channels_last: bool = True) -> jnp.ndarray:
    """Inverse of pad_divide_by. pad = (lw, uw, lh, uh)."""
    lw, uw, lh, uh = pad
    if channels_last:
        h, w = x.shape[-3], x.shape[-2]
        return x[..., lh:h - uh, lw:w - uw, :]
    h, w = x.shape[-2], x.shape[-1]
    return x[..., lh:h - uh, lw:w - uw]


def aggregate(prob: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Soft-aggregation: per-object probs -> (num_objects+1)-way logits with an
    implicit background channel prod(1-p) (reference tensor_utils.py:47-54).
    Always computed in fp32."""
    prob = prob.astype(jnp.float32)
    bg = jnp.prod(1.0 - prob, axis=axis, keepdims=True)
    new_prob = jnp.concatenate([bg, prob], axis=axis)
    new_prob = jnp.clip(new_prob, 1e-7, 1 - 1e-7)
    return jnp.log(new_prob / (1.0 - new_prob))


def aggregate_wbg_np(prob: np.ndarray, keep_bg: bool = False,
                     hard: bool = False) -> np.ndarray:
    """Host-side soft-aggregation + softmax (reference gui/interaction.py:15-27
    and the softmax step of inference_core.py's mask merging). One
    implementation for every host path — the device analog is `aggregate`
    (logits only). prob [K, H, W] -> softmax probs, bg optional, `hard`
    applies the x1000 low-temperature trick."""
    prob = prob.astype(np.float32)
    bg = np.prod(1 - prob, axis=0, keepdims=True)
    new_prob = np.clip(np.concatenate([bg, prob], 0), 1e-7, 1 - 1e-7)
    logits = np.log(new_prob / (1 - new_prob))
    if hard:
        logits *= 1000  # very low temperature
    logits -= logits.max(0, keepdims=True)
    e = np.exp(logits)
    sm = e / e.sum(0, keepdims=True)
    return sm if keep_bg else sm[1:]


def cls_to_one_hot(cls_gt: np.ndarray, num_objects: int) -> np.ndarray:
    """Index mask [B,1,H,W] -> one-hot [B,num_objects+1,H,W] (host-side numpy;
    reference tensor_utils.py:58-61)."""
    b, _, h, w = cls_gt.shape
    one_hot = np.zeros((b, num_objects + 1, h, w), dtype=np.float32)
    np.put_along_axis(one_hot, cls_gt.astype(np.int64), 1.0, axis=1)
    return one_hot
