"""PointRend-style point sampling (JAX).

Behavioral parity target: reference cutie/utils/point_features.py:20-111
(vendored from detectron2): bilinear grid sampling of [0,1]-normalized point
coordinates with zero padding, top-uncertainty importance sampling.
Channels-FIRST maps [N, C, H, W] like the reference (loss-side code keeps the
reference layout since logits already come out [B, C, H, W]).

TPU notes (round 3): a device trace of the training step showed the two
zero-FLOP hotspots of this file — the backward scatter of `point_sample`
(28.5 ms/step, the single biggest op: XLA lowers the VJP of a per-pixel
gather as millions of scalar scatter-adds) and the `lax.top_k` bitonic sort
over the oversampled uncertainty scores (~13 ms). Both are restructured:

  * `point_sample` carries a custom VJP whose input_map gradient is a dense
    separable-interpolation matmul (grad[c,h,w] = sum_p Wy[p,h] Wx[p,w]
    g[c,p]), chunked over points to bound the intermediate — MXU work
    instead of serialized scatter. On TPU the contraction runs bf16 with
    fp32 accumulation (weights are in [0,1]; ~0.4% relative rounding on one
    gradient path), elsewhere fp32-exact. `POINT_SAMPLE_EXACT_BWD` forces
    the fp32 path everywhere (parity tests).
  * top-uncertainty selection is plain `lax.top_k`: a round-3 sort-free
    variant (radix threshold + searchsorted compaction) lowered as serial
    s32 while-loops costing ~470 ms/step — reverted in round 4 after a
    fresh device trace.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

# Force the exact fp32 scatter-free backward on every backend (tests).
POINT_SAMPLE_EXACT_BWD = False

_BWD_CHUNK = 2048  # points per backward-matmul chunk ([N,C,chunk,W] interm.)


# Maps at or below this pixel count sample via the separable-interpolation
# matmul instead of a gather (the aux-loss logit maps are 30x30=900; the
# round-4 train trace showed their XLA gathers costing ~95 ms/step while the
# equivalent MXU contraction is <2 GFLOP).
_SMALL_MAP_PIXELS = 4096


def _point_sample_gather(input_map: jnp.ndarray,
                         point_coords: jnp.ndarray) -> jnp.ndarray:
    n, c, h, w = input_map.shape
    x = point_coords[..., 0] * w - 0.5  # [N, P]
    y = point_coords[..., 1] * h - 0.5

    if h * w <= _SMALL_MAP_PIXELS:
        # separable interpolation: out[n,c,p] = sum_hw Wy[p,h] Wx[p,w] v[c,h,w]
        # (exactly the 4-corner bilinear blend — each weight row has <=2
        # nonzeros; out-of-range rows are all-zero, reproducing zero padding)
        wx = _axis_weights(x, w).astype(jnp.float32)  # [N, P, W]
        wy = _axis_weights(y, h).astype(jnp.float32)  # [N, P, H]
        tmp = jnp.einsum("nph,nchw->ncpw", wy, input_map.astype(jnp.float32),
                         precision=jax.lax.Precision.HIGHEST)
        out = jnp.einsum("npw,ncpw->ncp", wx, tmp,
                         precision=jax.lax.Precision.HIGHEST)
        return out.astype(input_map.dtype)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    dx = (x - x0)[:, None, :]
    dy = (y - y0)[:, None, :]

    # one channels-minor gather for all 4 corners: rows of C contiguous
    # elements, 4P rows — instead of 4 separate per-channel-broadcast
    # gathers (XLA lowers those as 4x C times the rows)
    im_rows = jnp.swapaxes(input_map.reshape(n, c, h * w), 1, 2)  # [N, HW, C]

    def lin_idx(yi, xi):
        inside = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        return yi_c * w + xi_c, inside

    corners = [lin_idx(y0, x0), lin_idx(y0, x0 + 1),
               lin_idx(y0 + 1, x0), lin_idx(y0 + 1, x0 + 1)]
    idx = jnp.concatenate([i for i, _ in corners], axis=1)      # [N, 4P]
    vals = jnp.take_along_axis(im_rows, idx[..., None], axis=1)  # [N, 4P, C]
    v00, v01, v10, v11 = [
        jnp.swapaxes(v, 1, 2) * corners[k][1][:, None, :]       # [N, C, P]
        for k, v in enumerate(jnp.split(vals, 4, axis=1))]
    return (v00 * (1 - dx) * (1 - dy) + v01 * dx * (1 - dy) +
            v10 * (1 - dx) * dy + v11 * dx * dy)


def _axis_weights(t: jnp.ndarray, size: int) -> jnp.ndarray:
    """Dense 1D interpolation matrix [..., P, size] for pixel coords t
    (<=2 nonzeros per row: (1-dt) at floor(t), dt at floor(t)+1). Out-of-
    range corners match no column -> weight 0, which reproduces the gather
    path's zero-padding (a corner needs BOTH axes in range; the row/col
    weight product is zero whenever either axis is outside)."""
    t0 = jnp.floor(t)
    dt = (t - t0)[..., None]
    i = jnp.arange(size, dtype=t.dtype)
    t0 = t0[..., None]
    return (i == t0) * (1.0 - dt) + (i == t0 + 1.0) * dt


@jax.custom_vjp
def point_sample(input_map: jnp.ndarray, point_coords: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample of [0,1]^2 points (grid_sample align_corners=False,
    zero padding). input_map [N, C, H, W]; point_coords [N, P, 2] as (x, y).
    Returns [N, C, P]."""
    return _point_sample_gather(input_map, point_coords)


def _point_sample_fwd(input_map, point_coords):
    out = _point_sample_gather(input_map, point_coords)
    return out, (input_map, point_coords)


def _point_sample_bwd(res, g):
    input_map, coords = res
    n, c, h, w = input_map.shape
    p = coords.shape[1]
    x = coords[..., 0].astype(jnp.float32) * w - 0.5
    y = coords[..., 1].astype(jnp.float32) * h - 0.5
    g32 = g.astype(jnp.float32)

    use_bf16 = (not POINT_SAMPLE_EXACT_BWD
                and jax.default_backend() == "tpu")
    mm_dtype = jnp.bfloat16 if use_bf16 else jnp.float32

    # pad P up to a chunk multiple with zero-gradient points
    cs = min(_BWD_CHUNK, p)
    pp = -(-p // cs) * cs
    if pp != p:
        x = jnp.pad(x, ((0, 0), (0, pp - p)))
        y = jnp.pad(y, ((0, 0), (0, pp - p)))
        g32 = jnp.pad(g32, ((0, 0), (0, 0), (0, pp - p)))

    # [N, chunks, cs] views
    xc = x.reshape(n, -1, cs)
    yc = y.reshape(n, -1, cs)
    gc = g32.reshape(n, c, -1, cs).transpose(2, 0, 1, 3)  # [chunks, N, C, cs]

    def chunk_grad(carry, inputs):
        xk, yk, gk = inputs          # [N,cs], [N,cs], [N,C,cs]
        wx = _axis_weights(xk, w).astype(mm_dtype)   # [N, cs, W]
        wy = _axis_weights(yk, h).astype(mm_dtype)   # [N, cs, H]
        t = gk.astype(mm_dtype)[..., None] * wx[:, None]  # [N, C, cs, W]
        gm = jnp.einsum("nph,ncpw->nchw", wy, t,
                        preferred_element_type=jnp.float32)
        return carry + gm, None

    zero = jnp.zeros((n, c, h, w), jnp.float32)
    grad_map, _ = jax.lax.scan(
        chunk_grad, zero,
        (xc.transpose(1, 0, 2), yc.transpose(1, 0, 2), gc))

    # coordinate gradient (d out / d coords), needed because callers may
    # differentiate through coords in principle; computed via the analytic
    # bilinear derivative with the same gather the forward uses.
    x0 = jnp.floor(x[:, :p])
    y0 = jnp.floor(y[:, :p])
    dx = (x[:, :p] - x0)[:, None, :]
    dy = (y[:, :p] - y0)[:, None, :]

    def gather(yi, xi):
        inside = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        vals = jnp.take_along_axis(
            input_map.reshape(n, c, h * w).astype(jnp.float32),
            (yi_c * w + xi_c)[:, None, :], axis=2)
        return vals * inside[:, None, :]

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    gp = g.astype(jnp.float32)
    # d/ddx, d/ddy of the bilinear blend, summed over channels
    ddx = ((v01 - v00) * (1 - dy) + (v11 - v10) * dy) * gp
    ddy = ((v10 - v00) * (1 - dx) + (v11 - v01) * dx) * gp
    grad_coords = jnp.stack([ddx.sum(1) * w, ddy.sum(1) * h], axis=-1)
    return (grad_map.astype(input_map.dtype),
            grad_coords.astype(coords.dtype))


point_sample.defvjp(_point_sample_fwd, _point_sample_bwd)


_UP_CHUNK = 8192   # points per chunk of the composed-upsample sampler
_CLS_CHUNK = 8192  # points per chunk of the class-map one-hot sampler


def _up_axis_weights(t_up: jnp.ndarray, size_low: int,
                     factor: int) -> jnp.ndarray:
    """[..., P, size_low] fp32 weight rows for sampling a VIRTUAL `factor`x
    half-pixel bilinear upsample (edge-clamped, torch F.interpolate
    align_corners=False semantics — ops/resize.py:20-32) at up-space pixel
    coords t_up, with the zero padding point_sample applies to points whose
    up-space corners fall outside the map. The two interpolations compose
    exactly: each row has <=4 taps on the LOW-res axis."""
    c0 = jnp.floor(t_up)
    dt = (t_up - c0)[..., None]
    i = jnp.arange(size_low, dtype=t_up.dtype)

    def corner_row(c):  # c: [..., P] integer-valued up-space corner index
        valid = ((c >= 0) & (c < size_low * factor)).astype(t_up.dtype)
        s = (c + 0.5) / factor - 0.5       # source coord of up pixel c
        s0 = jnp.floor(s)
        e = (s - s0)[..., None]
        i0 = jnp.clip(s0, 0, size_low - 1)[..., None]   # edge clamp (both
        i1 = jnp.clip(s0 + 1, 0, size_low - 1)[..., None]  # taps -> border px)
        return valid[..., None] * ((i == i0) * (1.0 - e) + (i == i1) * e)

    return corner_row(c0) * (1.0 - dt) + corner_row(c0 + 1.0) * dt


def point_sample_upsampled(low_map: jnp.ndarray, point_coords: jnp.ndarray,
                           factor: int) -> jnp.ndarray:
    """point_sample(upsample_{factor}x(low_map), coords) WITHOUT materializing
    the upsampled map and WITHOUT a gather: the composed per-axis weight rows
    contract against the low-res map on the MXU (chunked over points to bound
    the [N, C, chunk, w] intermediate).

    Motivation: the reference upsamples stride-4 logits to full res
    (cutie/model/cutie.py:200) and the loss point-samples the full-res map
    (cutie/model/losses.py:54). XLA lowers that sample as a per-point row
    gather costing ~20 ns/row — ~27 ms/step at production shapes (round-4
    train trace) — while this exact reformulation is a few GFLOP of matmul.

    low_map [N, C, h, w]; point_coords [N, P, 2] in [0,1] -> [N, C, P].
    factor=1 degenerates to plain separable point_sample."""
    n, c, h, w = low_map.shape
    p = point_coords.shape[1]
    x = point_coords[..., 0].astype(jnp.float32) * (w * factor) - 0.5
    y = point_coords[..., 1].astype(jnp.float32) * (h * factor) - 0.5
    m32 = low_map.astype(jnp.float32)

    cs = min(_UP_CHUNK, p)
    pp = -(-p // cs) * cs
    if pp != p:  # pad with out-of-range points (sample to 0, then sliced off)
        x = jnp.pad(x, ((0, 0), (0, pp - p)), constant_values=-10.0)
        y = jnp.pad(y, ((0, 0), (0, pp - p)), constant_values=-10.0)
    xc = x.reshape(n, -1, cs).transpose(1, 0, 2)  # [chunks, N, cs]
    yc = y.reshape(n, -1, cs).transpose(1, 0, 2)

    def chunk(xk_yk):
        xk, yk = xk_yk
        wx = _up_axis_weights(xk, w, factor)  # [N, cs, w]
        wy = _up_axis_weights(yk, h, factor)  # [N, cs, h]
        tmp = jnp.einsum("nph,nchw->ncpw", wy, m32,
                         precision=jax.lax.Precision.HIGHEST)
        return jnp.einsum("npw,ncpw->ncp", wx, tmp,
                          precision=jax.lax.Precision.HIGHEST)

    out = jax.lax.map(chunk, (xc, yc))              # [chunks, N, C, cs]
    out = jnp.moveaxis(out, 0, 2).reshape(n, c, pp)[:, :, :p]
    return out.astype(low_map.dtype)


def point_sample_cls_onehot(cls_map: jnp.ndarray, point_coords: jnp.ndarray,
                            num_classes: int) -> jnp.ndarray:
    """Exact equivalent of point_sample(one_hot(cls_map), coords) — the
    bilinear zero-padded blend of the C-channel one-hot of an integer class
    map — WITHOUT materializing the one-hot map and WITHOUT a gather.

    The 4 corner CLASS VALUES are selected by exact 0/1 contractions: a
    one-hot row matmul over H picks the two corner image rows (bf16 is exact
    for 0/1 weights and small-integer class ids; each output element is a
    sum of zeros plus one class value), then a one-hot mask-reduce over W
    picks the corner columns on the VPU. Corners are one-hot encoded and
    blended with the same fp32 weight expression as the gather path, so the
    result is bit-identical to sampling the materialized one-hot.

    Replaces the reference's soft_gt = cls_to_one_hot(...) + point_sample
    (cutie/model/losses.py:53,75) whose XLA gather cost ~38 ms/step at
    production shapes (round-4 train trace).

    cls_map [N, H, W] integer; point_coords [N, P, 2] -> [N, num_classes, P]
    float32."""
    n, h, w = cls_map.shape
    p = point_coords.shape[1]
    x = point_coords[..., 0].astype(jnp.float32) * w - 0.5
    y = point_coords[..., 1].astype(jnp.float32) * h - 0.5
    cls_bf = cls_map.astype(jnp.bfloat16)  # exact for class ids < 256

    cs = min(_CLS_CHUNK, p)
    pp = -(-p // cs) * cs
    if pp != p:
        x = jnp.pad(x, ((0, 0), (0, pp - p)), constant_values=-10.0)
        y = jnp.pad(y, ((0, 0), (0, pp - p)), constant_values=-10.0)
    xc = x.reshape(n, -1, cs).transpose(1, 0, 2)
    yc = y.reshape(n, -1, cs).transpose(1, 0, 2)
    ih = jnp.arange(h, dtype=jnp.float32)
    iw = jnp.arange(w, dtype=jnp.float32)
    classes = jnp.arange(num_classes, dtype=jnp.float32)

    def chunk(xk_yk):
        xk, yk = xk_yk                      # [N, cs]
        x0 = jnp.floor(xk)
        y0 = jnp.floor(yk)
        dx = xk - x0
        dy = yk - y0

        def rows_for(yr):  # [N, cs] -> exact class values [N, cs, w] f32
            wy = (ih == yr[..., None]).astype(jnp.bfloat16)  # 0/1 exact
            return jnp.einsum("nph,nhw->npw", wy, cls_bf,
                              preferred_element_type=jnp.float32)

        r0 = rows_for(y0)       # all-zero rows when y0 out of range
        r1 = rows_for(y0 + 1.0)

        def col(rows, xcol):    # corner class value [N, cs]
            sel = (iw == xcol[..., None]).astype(jnp.float32)
            return (rows * sel).sum(-1)

        def valid(yi, xi):
            return ((yi >= 0) & (yi < h) & (xi >= 0) &
                    (xi < w)).astype(jnp.float32)

        # same corner order and weight expression as _point_sample_gather
        corners = [
            (col(r0, x0), valid(y0, x0), (1 - dx) * (1 - dy)),
            (col(r0, x0 + 1), valid(y0, x0 + 1), dx * (1 - dy)),
            (col(r1, x0), valid(y0 + 1, x0), (1 - dx) * dy),
            (col(r1, x0 + 1), valid(y0 + 1, x0 + 1), dx * dy),
        ]
        out = None
        for val, v, wgt in corners:
            onehot = (val[..., None] == classes).astype(jnp.float32)
            term = onehot * (v * wgt)[..., None]        # [N, cs, C]
            out = term if out is None else out + term
        return jnp.moveaxis(out, -1, 1)                 # [N, C, cs]

    out = jax.lax.map(chunk, (xc, yc))                  # [chunks, N, C, cs]
    return jnp.moveaxis(out, 0, 2).reshape(n, num_classes, pp)[:, :, :p]


def calculate_uncertainty(sem_seg_logits: jnp.ndarray) -> jnp.ndarray:
    """-(top1 - top2) logit margin (point_features.py:20-35). [N,C,P] -> [N,1,P].
    Sort-free: top1 via max, top2 via max with the first argmax masked (ties
    at the max give margin 0, matching torch.topk's (m, m))."""
    if sem_seg_logits.shape[1] == 2:
        return -jnp.abs(sem_seg_logits[:, 1:2])
    m1 = jnp.max(sem_seg_logits, axis=1, keepdims=True)          # [N,1,P]
    am = jnp.argmax(sem_seg_logits, axis=1)                      # [N,P]
    c = sem_seg_logits.shape[1]
    not_first = jnp.arange(c)[None, :, None] != am[:, None, :]
    m2 = jnp.max(jnp.where(not_first, sem_seg_logits, -jnp.inf),
                 axis=1, keepdims=True)
    return m2 - m1


def _top_uncertain_indices(u: jnp.ndarray, k: int) -> jnp.ndarray:
    """Indices of the k most-uncertain points per row. u: [N, S] -> [N, k].

    Plain lax.top_k. A round-3 "sort-free" variant (radix-select threshold +
    vmap(searchsorted) compaction) turned out to lower the 9408-query
    searchsorted as serial s32 while-loops costing ~470 ms/step on TPU —
    36x the ~13 ms bitonic sort it replaced (round-4 device trace). The sort
    is the fast path here."""
    _, idx = jax.lax.top_k(u, min(k, u.shape[-1]))
    return idx.astype(jnp.int32)


def get_uncertain_point_coords_with_randomness(
        rng: jax.Array, coarse_logits: jnp.ndarray,
        uncertainty_func: Callable, num_points: int, oversample_ratio: float,
        importance_sample_ratio: float,
        sample_fn: Callable = point_sample) -> jnp.ndarray:
    """(point_features.py:62-111). Returns [N, num_points, 2] coords in [0,1].
    sample_fn customizes how coarse_logits are probed (e.g. a composed-
    upsample sampler when the loss target is a virtual full-res map)."""
    n = coarse_logits.shape[0]
    num_sampled = int(num_points * oversample_ratio)
    k1, k2 = jax.random.split(rng)
    point_coords = jax.random.uniform(k1, (n, num_sampled, 2))
    point_logits = sample_fn(coarse_logits, point_coords)
    point_uncertainties = uncertainty_func(point_logits)  # [N,1,S]
    num_uncertain = int(importance_sample_ratio * num_points)
    num_random = num_points - num_uncertain
    idx = _top_uncertain_indices(point_uncertainties[:, 0, :], num_uncertain)
    picked = jnp.take_along_axis(point_coords, idx[..., None], axis=1)
    if num_random > 0:
        picked = jnp.concatenate(
            [picked, jax.random.uniform(k2, (n, num_random, 2))], axis=1)
    return picked
