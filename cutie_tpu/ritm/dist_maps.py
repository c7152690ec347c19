"""Click-encoding distance maps for interactive segmentation.

Two paths, mirroring the reference (gui/ritm/model/ops.py:38-102):
  - a vectorized XLA path (meshgrid min over clicks) — ideal for TPU, used
    inside the jitted RITM forward;
  - a native C++ BFS kernel (csrc/dist_maps.cpp, ctypes-loaded) replacing the
    reference's Cython kernel for CPU mode.

Point layout (reference convention): [n_points, 3] rows of (row, col, index);
first half are positive clicks, second half negative; rows with x < 0 are
padding.
"""
from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import Optional

import jax.numpy as jnp
import numpy as np

log = logging.getLogger(__name__)

_LIB_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "csrc")
_LIB_PATH = os.path.join(_LIB_DIR, "libdistmaps.so")
_SRC_PATH = os.path.join(_LIB_DIR, "dist_maps.cpp")
_lib = None


def _build_library() -> Optional[str]:
    if os.path.exists(_LIB_PATH) and (os.path.getmtime(_LIB_PATH)
                                      >= os.path.getmtime(_SRC_PATH)):
        return _LIB_PATH
    try:
        subprocess.run(["g++", "-O3", "-shared", "-fPIC", "-o", _LIB_PATH,
                        _SRC_PATH], check=True, capture_output=True)
        return _LIB_PATH
    except (OSError, subprocess.CalledProcessError) as e:
        log.warning("could not build libdistmaps.so (%s); CPU path disabled", e)
        return None


def _get_lib():
    global _lib
    if _lib is None:
        path = _build_library()
        if path is None:
            return None
        _lib = ctypes.CDLL(path)
        _lib.get_dist_maps.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_float, ctypes.POINTER(ctypes.c_float),
        ]
        _lib.get_dist_maps.restype = None
    return _lib


def get_dist_maps_cpu(points: np.ndarray, height: int, width: int,
                      norm_delimiter: float) -> np.ndarray:
    """Native kernel: points [P, 3] -> [2, H, W] squared normalized distances."""
    lib = _get_lib()
    if lib is None:  # fall back to the vectorized path on numpy
        return np.asarray(get_dist_maps_xla(jnp.asarray(points), height, width,
                                            norm_delimiter))
    points = np.ascontiguousarray(points, np.float32)
    out = np.empty((2, height, width), np.float32)
    lib.get_dist_maps(points.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                      points.shape[0], height, width,
                      ctypes.c_float(norm_delimiter),
                      out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out


def get_dist_maps_xla(points: jnp.ndarray, height: int, width: int,
                      norm_delimiter: float) -> jnp.ndarray:
    """Vectorized path: min over clicks of squared normalized distance.
    points [P, 3] (row, col, idx); returns [2, H, W]."""
    p = points.shape[0]
    half = p // 2
    rows = jnp.arange(height, dtype=jnp.float32)[:, None]
    cols = jnp.arange(width, dtype=jnp.float32)[None, :]
    dy = (rows[None] - points[:, 0][:, None, None]) / norm_delimiter
    dx = (cols[None] - points[:, 1][:, None, None]) / norm_delimiter
    d2 = dy * dy + dx * dx  # [P, H, W]
    invalid = points[:, 0] < 0
    d2 = jnp.where(invalid[:, None, None], 1e6, d2)
    pos = d2[:half].min(axis=0) if half > 0 else jnp.full((height, width), 1e6)
    neg = d2[half:].min(axis=0) if p - half > 0 else jnp.full((height, width), 1e6)
    return jnp.stack([pos, neg])


def encode_clicks(coords: jnp.ndarray, height: int, width: int, *,
                  norm_radius: float, spatial_scale: float = 1.0,
                  use_disks: bool = False) -> jnp.ndarray:
    """Full DistMaps.get_coord_features equivalent for a batch
    (ops.py:49-99). coords [B, 2*K, 3] -> features [B, 2, H, W]."""
    norm = 1.0 if use_disks else norm_radius * spatial_scale

    def one(points):
        scaled = points.at[:, :2].multiply(spatial_scale)
        return get_dist_maps_xla(scaled, height, width, norm)

    coords_maps = jnp.stack([one(coords[b]) for b in range(coords.shape[0])])
    if use_disks:
        return (coords_maps <= (norm_radius * spatial_scale) ** 2).astype(
            jnp.float32)
    return jnp.tanh(2.0 * jnp.sqrt(coords_maps))
