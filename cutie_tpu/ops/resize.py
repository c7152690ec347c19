"""Resize primitives matching the reference's torch.nn.functional.interpolate modes.

- bilinear, align_corners=False  -> half-pixel-centered linear resize
  (jax.image.resize 'linear' uses the same convention).
- area downsample with an integer factor -> exact average pooling
  (the reference only ever area-downsamples by integer factors: 2, 4, 16 —
   cutie/model/modules.py:59-60, cutie/model/cutie.py:149,
   cutie/model/transformer/object_summarizer.py:63).
- nearest-exact lives host-side in the inference shell (numpy).

All functions operate on channels-last arrays [..., H, W, C]; leading axes
are treated as batch.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def bilinear_resize(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Half-pixel bilinear resize of the (-3, -2) spatial axes.
    Matches torch F.interpolate(mode='bilinear', align_corners=False)."""
    out_shape = x.shape[:-3] + (out_h, out_w) + x.shape[-1:]
    return jax.image.resize(x, out_shape, method="linear")


def upsample_2x(x: jnp.ndarray) -> jnp.ndarray:
    return bilinear_resize(x, x.shape[-3] * 2, x.shape[-2] * 2)


def upsample_4x(x: jnp.ndarray) -> jnp.ndarray:
    return bilinear_resize(x, x.shape[-3] * 4, x.shape[-2] * 4)


def area_downsample(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Average-pool by an integer factor over the (-3, -2) spatial axes.
    Exactly equals torch F.interpolate(mode='area') for integer ratios."""
    *lead, h, w, c = x.shape
    assert h % factor == 0 and w % factor == 0, (h, w, factor)
    x = x.reshape(*lead, h // factor, factor, w // factor, factor, c)
    return x.mean(axis=(-4, -2))


def _align_corners_matrix(n_in: int, n_out: int):
    """[n_out, n_in] align-corners bilinear interpolation matrix (numpy,
    trace-time constant). Row i holds the two taps of output coordinate i."""
    import numpy as np

    m = np.zeros((n_out, n_in), np.float32)
    if n_out == 1 or n_in == 1:
        m[:, 0] = 1.0
        return m
    ys = np.arange(n_out, dtype=np.float64) * ((n_in - 1) / (n_out - 1))
    y0 = np.clip(np.floor(ys).astype(np.int64), 0, n_in - 1)
    y1 = np.clip(y0 + 1, 0, n_in - 1)
    wy = (ys - y0).astype(np.float32)
    np.add.at(m, (np.arange(n_out), y0), 1.0 - wy)
    np.add.at(m, (np.arange(n_out), y1), wy)
    return m


def bilinear_resize_align_corners_mm(x: jnp.ndarray, out_h: int,
                                     out_w: int) -> jnp.ndarray:
    """align_corners=True bilinear resize as two small matmuls (separable
    interpolation). Same weights as bilinear_resize_align_corners up to fp
    summation order; unlike the gather formulation its VJP is again two
    matmuls (MXU) instead of a scatter-add — use wherever the resize sits
    inside a differentiated graph (the f-BRS objective re-runs it on every
    L-BFGS evaluation)."""
    wy = jnp.asarray(_align_corners_matrix(x.shape[-3], out_h))
    wx = jnp.asarray(_align_corners_matrix(x.shape[-2], out_w))
    t = jnp.einsum("Oh,...hwc->...Owc", wy, x.astype(jnp.float32),
                   precision=jax.lax.Precision.HIGHEST)
    return jnp.einsum("Ww,...Owc->...OWc", wx, t,
                      precision=jax.lax.Precision.HIGHEST)


def bilinear_resize_align_corners(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Bilinear resize with align_corners=True (corner-pixel-aligned sampling;
    used by the RITM HRNet stack). Spatial axes (-3, -2), channels-last."""
    h, w = x.shape[-3], x.shape[-2]

    def coords(n_in, n_out):
        if n_out == 1 or n_in == 1:
            return jnp.zeros((n_out,), jnp.float32)
        return jnp.arange(n_out, dtype=jnp.float32) * ((n_in - 1) / (n_out - 1))

    ys = coords(h, out_h)
    xs = coords(w, out_w)
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, h - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, w - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    wy = (ys - y0).reshape(-1, 1, 1)
    wx = (xs - x0).reshape(1, -1, 1)

    def gather(yi, xi):
        out = jnp.take(x, yi, axis=-3)
        return jnp.take(out, xi, axis=-2)

    v00 = gather(y0, x0)
    v01 = gather(y0, x1)
    v10 = gather(y1, x0)
    v11 = gather(y1, x1)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def nearest_exact_resize_np(mask, out_h: int, out_w: int):
    """Host-side numpy equivalent of torch F.interpolate(mode='nearest-exact')
    for 2D index masks (reference cutie/inference/inference_core.py:221-223)."""
    import numpy as np

    h, w = mask.shape[-2:]
    # nearest-exact: sample at half-pixel centers, round-half-down via floor(x+0.5)
    ys = np.floor((np.arange(out_h) + 0.5) * h / out_h).astype(np.int64)
    xs = np.floor((np.arange(out_w) + 0.5) * w / out_w).astype(np.int64)
    ys = np.clip(ys, 0, h - 1)
    xs = np.clip(xs, 0, w - 1)
    return mask[..., ys[:, None], xs[None, :]]


def bilinear_resize_np(x, out_h: int, out_w: int):
    """Host-side numpy bilinear resize over the LAST TWO axes, exactly
    matching torch F.interpolate(mode='bilinear', align_corners=False,
    antialias=False): half-pixel-centered point sampling, NO antialiasing.

    NOTE: this differs from `bilinear_resize` (jax.image.resize 'linear')
    on DOWNsampling — jax.image.resize antialiases by default (max diff
    ~0.5 on a 2x downsample). The reference never antialiases, so the
    max_internal_size input path must use this twin.
    """
    import numpy as np

    x = np.asarray(x, np.float32)
    h, w = x.shape[-2], x.shape[-1]
    if h == out_h and w == out_w:
        return x

    def coords(n_in, n_out):
        s = np.float32(n_in / n_out)
        c = (np.arange(n_out, dtype=np.float32) + np.float32(0.5)) * s \
            - np.float32(0.5)
        return np.clip(c, 0.0, n_in - 1)

    ys, xs = coords(h, out_h), coords(w, out_w)
    y0 = np.floor(ys).astype(np.int64)
    y1 = np.minimum(y0 + 1, h - 1)
    x0 = np.floor(xs).astype(np.int64)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = (ys - y0).astype(np.float32)[:, None]
    wx = (xs - x0).astype(np.float32)[None, :]
    v00 = x[..., y0[:, None], x0[None, :]]
    v01 = x[..., y0[:, None], x1[None, :]]
    v10 = x[..., y1[:, None], x0[None, :]]
    v11 = x[..., y1[:, None], x1[None, :]]
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy
