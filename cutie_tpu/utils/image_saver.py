"""Training visualization grids.

Behavioral parity target: reference cutie/utils/image_saver.py — per-batch
grids of image / GT / prediction rows for TensorBoard or disk dumps. Rebuilt
compactly (numpy only): rows = [rgb, gt overlay, pred overlay] x sequence.
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from cutie_tpu.utils.palette import davis_palette_np


def _overlay(image: np.ndarray, cls_mask: np.ndarray, alpha=0.5) -> np.ndarray:
    """image [H,W,3] float 0-1; cls_mask [H,W] ints -> uint8 overlay."""
    colors = davis_palette_np[np.clip(cls_mask, 0, 255)]
    fg = (cls_mask > 0)[..., None]
    out = image * 255.0
    out = np.where(fg, out * (1 - alpha) + colors * alpha, out)
    return out.astype(np.uint8)


def vis_sequence(data: Dict[str, np.ndarray], logits: Optional[np.ndarray],
                 bi: int = 0, max_frames: int = 8) -> np.ndarray:
    """Build a [rows x T] grid for sequence `bi` of a training batch.

    data: frames [B,T,H,W,3], cls_gt [B,T,H,W]; logits: [B,T-1,C,H,W] or None.
    Returns HWC uint8 grid (rows: rgb / gt / pred).
    """
    frames = np.asarray(data["frames"][bi])
    cls_gt = np.asarray(data["cls_gt"][bi])
    t = min(frames.shape[0], max_frames)

    rows = []
    rows.append(np.concatenate([(frames[ti] * 255).astype(np.uint8)
                                for ti in range(t)], axis=1))
    rows.append(np.concatenate([_overlay(frames[ti], cls_gt[ti])
                                for ti in range(t)], axis=1))
    if logits is not None:
        logits = np.asarray(logits[bi])
        preds = [cls_gt[0]]  # first frame is the given GT
        preds += [logits[ti - 1].argmax(0) for ti in range(1, t)]
        rows.append(np.concatenate([_overlay(frames[ti], preds[ti])
                                    for ti in range(t)], axis=1))
    return np.concatenate(rows, axis=0)
