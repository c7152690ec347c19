"""PointRend-style point sampling (JAX).

Behavioral parity target: reference cutie/utils/point_features.py:20-111
(vendored from detectron2): bilinear grid sampling of [0,1]-normalized point
coordinates with zero padding, top-uncertainty importance sampling.
Channels-FIRST maps [N, C, H, W] like the reference (loss-side code keeps the
reference layout since logits already come out [B, C, H, W]).
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def point_sample(input_map: jnp.ndarray, point_coords: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample of [0,1]^2 points (grid_sample align_corners=False,
    zero padding). input_map [N, C, H, W]; point_coords [N, P, 2] as (x, y).
    Returns [N, C, P]."""
    n, c, h, w = input_map.shape
    x = point_coords[..., 0] * w - 0.5  # [N, P]
    y = point_coords[..., 1] * h - 0.5

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    dx = x - x0
    dy = y - y0

    def gather(yi, xi):
        inside = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        # [N, C, P]
        vals = jnp.take_along_axis(
            input_map.reshape(n, c, h * w),
            (yi_c * w + xi_c)[:, None, :], axis=2)
        return vals * inside[:, None, :]

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    dx = dx[:, None, :]
    dy = dy[:, None, :]
    return (v00 * (1 - dx) * (1 - dy) + v01 * dx * (1 - dy) +
            v10 * (1 - dx) * dy + v11 * dx * dy)


def calculate_uncertainty(sem_seg_logits: jnp.ndarray) -> jnp.ndarray:
    """-(top1 - top2) logit margin (point_features.py:20-35). [N,C,P] -> [N,1,P]."""
    if sem_seg_logits.shape[1] == 2:
        return -jnp.abs(sem_seg_logits[:, 1:2])
    top2 = jax.lax.top_k(sem_seg_logits.swapaxes(1, 2), 2)[0]  # [N,P,2]
    return (top2[..., 1] - top2[..., 0])[:, None, :]


def get_uncertain_point_coords_with_randomness(
        rng: jax.Array, coarse_logits: jnp.ndarray,
        uncertainty_func: Callable, num_points: int, oversample_ratio: float,
        importance_sample_ratio: float) -> jnp.ndarray:
    """(point_features.py:62-111). Returns [N, num_points, 2] coords in [0,1]."""
    n = coarse_logits.shape[0]
    num_sampled = int(num_points * oversample_ratio)
    k1, k2 = jax.random.split(rng)
    point_coords = jax.random.uniform(k1, (n, num_sampled, 2))
    point_logits = point_sample(coarse_logits, point_coords)
    point_uncertainties = uncertainty_func(point_logits)  # [N,1,S]
    num_uncertain = int(importance_sample_ratio * num_points)
    num_random = num_points - num_uncertain
    idx = jax.lax.top_k(point_uncertainties[:, 0, :], num_uncertain)[1]  # [N,K]
    picked = jnp.take_along_axis(point_coords, idx[..., None], axis=1)
    if num_random > 0:
        picked = jnp.concatenate(
            [picked, jax.random.uniform(k2, (n, num_random, 2))], axis=1)
    return picked
