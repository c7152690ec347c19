"""Host-side training augmentations (PIL/cv2/numpy, explicit RNG).

Re-implements the torchvision transform semantics the reference training
pipeline uses (cutie/dataset/{static_dataset,vos_dataset,tps}.py):
RandomAffine (degrees/scale/shear, bilinear vs nearest), RandomResizedCrop,
RandomCrop(pad_if_needed), ColorJitter (randomly ordered ops), hflip,
RandomGrayscale, and a from-scratch thin-plate-spline warp. Instead of the
reference's reseed()-twice trick, dual image/mask transforms sample their
parameters ONCE from an explicit np.random.Generator and apply them to both
modalities with the appropriate interpolation.
"""
from __future__ import annotations

import math
from typing import Optional, Tuple

import cv2
import numpy as np
from PIL import Image, ImageEnhance

cv2.setNumThreads(0)  # avoid thread/fork interactions in loader workers

IM_MEAN = (124, 116, 104)


# ------------------------------------------------------------------ affine

def sample_affine_params(rng: np.random.Generator, degrees: float,
                         scale_range: Optional[Tuple[float, float]] = None,
                         shear: float = 0.0):
    angle = rng.uniform(-degrees, degrees) if degrees > 0 else 0.0
    scale = rng.uniform(*scale_range) if scale_range else 1.0
    shear_x = rng.uniform(-shear, shear) if shear > 0 else 0.0
    return angle, scale, shear_x


def _affine_matrix(angle, scale, shear_x, center):
    """torchvision convention: M = T(center) R(angle) Shear Scale T(-center)."""
    rot = math.radians(angle)
    sx = math.radians(shear_x)
    cx, cy = center
    # RSS (rotation-shear-scale) matrix as in torchvision _get_inverse_affine_matrix
    a = math.cos(rot - 0) / math.cos(0)
    # simple compose: R @ Shear @ S
    r = np.array([[math.cos(rot), -math.sin(rot)], [math.sin(rot), math.cos(rot)]])
    sh = np.array([[1.0, -math.tan(sx)], [0.0, 1.0]])
    m = r @ sh * scale
    t = np.eye(3)
    t[:2, :2] = m
    t[:2, 2] = [cx - m[0, 0] * cx - m[0, 1] * cy, cy - m[1, 0] * cx - m[1, 1] * cy]
    return t[:2]


def apply_affine(img: np.ndarray, angle, scale, shear_x, *, fill, nearest: bool
                 ) -> np.ndarray:
    h, w = img.shape[:2]
    m = _affine_matrix(angle, scale, shear_x, ((w - 1) * 0.5, (h - 1) * 0.5))
    flags = cv2.INTER_NEAREST if nearest else cv2.INTER_LINEAR
    if np.isscalar(fill):
        border = (fill,) * (1 if img.ndim == 2 else img.shape[2])
    else:
        border = tuple(fill)
    return cv2.warpAffine(img, m, (w, h), flags=flags,
                          borderMode=cv2.BORDER_CONSTANT, borderValue=border)


# ------------------------------------------------------ crops and resizes

def sample_resized_crop(rng: np.random.Generator, h: int, w: int,
                        scale=(0.36, 1.0), ratio=(3 / 4, 4 / 3)):
    """torchvision RandomResizedCrop.get_params: 10 area attempts + fallback."""
    area = h * w
    log_ratio = (math.log(ratio[0]), math.log(ratio[1]))
    for _ in range(10):
        target_area = area * rng.uniform(*scale)
        aspect = math.exp(rng.uniform(*log_ratio))
        cw = int(round(math.sqrt(target_area * aspect)))
        ch = int(round(math.sqrt(target_area / aspect)))
        if 0 < cw <= w and 0 < ch <= h:
            top = int(rng.integers(0, h - ch + 1))
            left = int(rng.integers(0, w - cw + 1))
            return top, left, ch, cw
    # fallback: center crop at the closest valid ratio
    in_ratio = w / h
    if in_ratio < ratio[0]:
        cw, ch = w, int(round(w / ratio[0]))
    elif in_ratio > ratio[1]:
        ch, cw = h, int(round(h * ratio[1]))
    else:
        cw, ch = w, h
    return (h - ch) // 2, (w - cw) // 2, ch, cw


def apply_resized_crop(img: np.ndarray, top, left, ch, cw, out_size: int,
                       nearest: bool) -> np.ndarray:
    crop = img[top:top + ch, left:left + cw]
    interp = cv2.INTER_NEAREST if nearest else cv2.INTER_LINEAR
    return cv2.resize(crop, (out_size, out_size), interpolation=interp)


def resize_shorter_np(img: np.ndarray, size: int, nearest: bool) -> np.ndarray:
    h, w = img.shape[:2]
    if h < w:
        nh, nw = size, max(1, round(w * size / h))
    else:
        nh, nw = max(1, round(h * size / w)), size
    interp = cv2.INTER_NEAREST if nearest else cv2.INTER_LINEAR
    return cv2.resize(img, (nw, nh), interpolation=interp)


def sample_crop(rng: np.random.Generator, h: int, w: int, size: int):
    """RandomCrop offsets for an image already padded to >= size."""
    top = int(rng.integers(0, h - size + 1)) if h > size else 0
    left = int(rng.integers(0, w - size + 1)) if w > size else 0
    return top, left


def pad_to_min(img: np.ndarray, size: int, fill) -> np.ndarray:
    h, w = img.shape[:2]
    ph, pw = max(0, size - h), max(0, size - w)
    if ph == 0 and pw == 0:
        return img
    # symmetric pad like torchvision pad_if_needed (pads fully on each side
    # in two steps; symmetric is equivalent in distribution)
    pads = [(ph // 2, ph - ph // 2), (pw // 2, pw - pw // 2)]
    if img.ndim == 3:
        pads.append((0, 0))
        value = np.asarray(fill, img.dtype) if not np.isscalar(fill) else fill
        out = np.stack([
            np.pad(img[..., c], pads[:2], constant_values=np.atleast_1d(value)[
                min(c, np.atleast_1d(value).size - 1)]) for c in range(img.shape[2])
        ], axis=-1)
        return out
    return np.pad(img, pads, constant_values=fill)


# --------------------------------------------------------------- color ops

def color_jitter(rng: np.random.Generator, img: Image.Image, brightness, contrast,
                 saturation, hue) -> Image.Image:
    """torchvision ColorJitter: factors uniform around 1, ops in random order."""
    ops = []
    if brightness > 0:
        f = rng.uniform(max(0, 1 - brightness), 1 + brightness)
        ops.append(lambda im, f=f: ImageEnhance.Brightness(im).enhance(f))
    if contrast > 0:
        f = rng.uniform(max(0, 1 - contrast), 1 + contrast)
        ops.append(lambda im, f=f: ImageEnhance.Contrast(im).enhance(f))
    if saturation > 0:
        f = rng.uniform(max(0, 1 - saturation), 1 + saturation)
        ops.append(lambda im, f=f: ImageEnhance.Color(im).enhance(f))
    if hue > 0:
        shift = rng.uniform(-hue, hue)

        def hue_op(im, shift=shift):
            hsv = np.array(im.convert("HSV"))
            hsv[..., 0] = (hsv[..., 0].astype(np.int16)
                           + int(shift * 255)) % 256
            return Image.fromarray(hsv, "HSV").convert("RGB")

        ops.append(hue_op)
    order = rng.permutation(len(ops))
    for i in order:
        img = ops[i](img)
    return img


def maybe_grayscale(rng: np.random.Generator, img: Image.Image,
                    p: float) -> Image.Image:
    if rng.uniform() < p:
        return img.convert("L").convert("RGB")
    return img


# ------------------------------------------------------------------- TPS

def _tps_kernel(r2):
    return np.where(r2 == 0, 0.0, r2 * np.log(np.maximum(r2, 1e-12)) * 0.5)


def _tps_fit(c_src: np.ndarray, c_dst: np.ndarray) -> np.ndarray:
    """Solve thin-plate-spline coefficients mapping c_dst -> displacement.
    Standard closed-form system [[K, P], [P^T, 0]] w = v (one solve per axis)."""
    n = c_src.shape[0]
    d2 = np.sum((c_dst[:, None] - c_dst[None]) ** 2, axis=-1)
    k = _tps_kernel(d2)
    p = np.concatenate([np.ones((n, 1)), c_dst], axis=1)
    a = np.zeros((n + 3, n + 3))
    a[:n, :n] = k
    a[:n, n:] = p
    a[n:, :n] = p.T
    v = np.zeros((n + 3, 2))
    v[:n] = c_src - c_dst
    return np.linalg.solve(a, v)  # [n+3, 2]


def tps_warp_grid(c_src: np.ndarray, c_dst: np.ndarray, h: int, w: int):
    """Backward-warp sampling grid: for each output pixel, where to sample."""
    theta = _tps_fit(c_src, c_dst)
    n = c_src.shape[0]
    # control points are normalized as index/h (pick_random_points), so the
    # grid uses the same convention — identity then maps pixel i to i exactly
    ys, xs = np.meshgrid(np.arange(h) / h, np.arange(w) / w, indexing="ij")
    pts = np.stack([ys.ravel(), xs.ravel()], axis=1)  # normalized (y, x)
    d2 = np.sum((pts[:, None] - c_dst[None]) ** 2, axis=-1)
    k = _tps_kernel(d2)
    disp = k @ theta[:n] + theta[n] + pts @ theta[n + 1:]
    sample = pts + disp
    mapy = (sample[:, 0].reshape(h, w) * h).astype(np.float32)
    mapx = (sample[:, 1].reshape(h, w) * w).astype(np.float32)
    return mapx, mapy


def random_tps_warp(rng: np.random.Generator, img: np.ndarray, mask: np.ndarray,
                    scale: float = 0.02, n_ctrl_pts: int = 12):
    """(parity: cutie/dataset/tps.py:8-36)"""
    h, w = mask.shape[:2]
    y_idx = rng.choice(h, size=n_ctrl_pts, replace=False) / h
    x_idx = rng.choice(w, size=n_ctrl_pts, replace=False) / w
    c_src = np.stack([y_idx, x_idx], axis=1)
    c_dst = c_src + rng.normal(scale=scale, size=c_src.shape)
    mapx, mapy = tps_warp_grid(c_src, c_dst, h, w)
    warp_im = cv2.remap(img, mapx, mapy, cv2.INTER_LINEAR)
    warp_gt = cv2.remap(mask, mapx, mapy, cv2.INTER_NEAREST)
    return warp_im, warp_gt
