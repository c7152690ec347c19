"""Video / binary-mask export.

Behavioral parity target: reference gui/exporter.py:10-57 (PyAV h264 mp4 of
saved visualizations + binary mask export). When PyAV is importable the
exporter uses it with REAL bitrate control exactly like the reference;
otherwise (this environment ships neither PyAV nor an ffmpeg binary) mp4
encoding falls back to cv2.VideoWriter (mp4v, no bitrate dial).
"""
from __future__ import annotations

import logging
import os
from os import path

import cv2
import numpy as np
from PIL import Image

try:  # optional: reference-exact h264 encode with bitrate control
    import av  # type: ignore
except ImportError:
    av = None

log = logging.getLogger(__name__)


def _list_frames(input_dir: str):
    frames = sorted(os.listdir(input_dir))
    return [f for f in frames if f.lower().endswith((".jpg", ".png"))]


def _convert_frames_to_video_av(input_dir: str, output_path: str, fps: int,
                                bitrate_mbps: int,
                                progress_callback=None) -> bool:
    """PyAV h264 path (reference gui/exporter.py:10-36): yuv420p stream with
    the Mbps dial applied as the encoder bit_rate."""
    frames = _list_frames(input_dir)
    if not frames:
        log.warning("No frames in %s", input_dir)
        return False
    first = np.array(Image.open(path.join(input_dir, frames[0])).convert("RGB"))
    h, w = first.shape[:2]
    os.makedirs(path.dirname(output_path) or ".", exist_ok=True)
    with av.open(output_path, mode="w") as container:
        stream = container.add_stream("h264", rate=int(fps))
        # even dims required by yuv420p
        stream.width = w - (w % 2)
        stream.height = h - (h % 2)
        stream.pix_fmt = "yuv420p"
        stream.bit_rate = int(bitrate_mbps * 1e6)
        for i, name in enumerate(frames):
            arr = np.array(Image.open(path.join(input_dir, name))
                           .convert("RGB"))[:stream.height, :stream.width]
            frame = av.VideoFrame.from_ndarray(arr, format="rgb24")
            for packet in stream.encode(frame):
                container.mux(packet)
            if progress_callback is not None and i % 10 == 0:
                progress_callback(i / len(frames))
        for packet in stream.encode():  # flush
            container.mux(packet)
    log.info("Wrote %s (%d frames, h264 @ %d Mbps)", output_path, len(frames),
             bitrate_mbps)
    return True


def convert_frames_to_video(input_dir: str, output_path: str, fps: int = 24,
                            bitrate_mbps: int = 1,
                            progress_callback=None) -> bool:
    """bitrate_mbps mirrors the reference PyAV exporter's Mbps dial
    (gui/exporter.py:10-36). Applied for real when PyAV is available;
    cv2.VideoWriter (fallback) has no bitrate control, so there it is
    accepted for API parity and recorded in the log line."""
    if av is not None:
        return _convert_frames_to_video_av(input_dir, output_path, fps,
                                           bitrate_mbps, progress_callback)
    frames = _list_frames(input_dir)
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
    log.info("Wrote %s (%d frames; cv2 fallback, bitrate dial %d Mbps "
             "not applied)", output_path, len(frames), bitrate_mbps)
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
