"""2D sine/cos positional encoding (Mask2Former-style).

Behavioral parity target: reference
cutie/model/transformer/positional_encoding.py:12-97. Pure function of the
spatial shape — computed with numpy at trace time (shapes are static under
jit, so this constant-folds; no runtime cache needed).
"""
from __future__ import annotations

import functools
import math

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=64)
def _pos_enc_np(h: int, w: int, dim: int, scale: float, temperature: float,
                normalize: bool = True) -> np.ndarray:
    """Returns [H, W, 2*ceil(dim/4)*2] == [H, W, dim] for dim % 4 == 0."""
    d = int(np.ceil(dim / 4) * 2)
    inv_freq = 1.0 / (temperature ** (np.arange(0, d, 2, dtype=np.float32) / d))
    pos_y = np.arange(h, dtype=np.float32)
    pos_x = np.arange(w, dtype=np.float32)
    if normalize:
        eps = 1e-6
        pos_y = pos_y / (pos_y[-1] + eps) * scale
        pos_x = pos_x / (pos_x[-1] + eps) * scale
    sin_inp_y = np.einsum("i,j->ij", pos_y, inv_freq)
    sin_inp_x = np.einsum("i,j->ij", pos_x, inv_freq)

    def get_emb(sin_inp):
        emb = np.stack([np.sin(sin_inp), np.cos(sin_inp)], axis=-1)
        return emb.reshape(*emb.shape[:-2], -1)

    emb_y = get_emb(sin_inp_y)[:, None, :]  # [H,1,d]
    emb_x = get_emb(sin_inp_x)[None, :, :]  # [1,W,d]
    emb = np.zeros((h, w, d * 2), dtype=np.float32)
    emb[:, :, :d] = emb_x
    emb[:, :, d:] = np.broadcast_to(emb_y, (h, w, d))
    return emb


def positional_encoding(h: int, w: int, dim: int, scale: float = 2 * math.pi,
                        temperature: float = 10000.0) -> jnp.ndarray:
    """[H, W, dim] fp32 channels-last positional encoding."""
    return jnp.asarray(_pos_enc_np(h, w, dim, float(scale), float(temperature)))
