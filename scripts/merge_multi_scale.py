"""Multi-scale score merging.

Behavioral parity target: reference scripts/merge_multi_scale.py:27-71 —
sum per-scale probability dumps, argmax, remap object ids via the saved
backward mapping, save palette PNGs, zip the result.

Score-dump formats: `.npz` (our ResultSaver's native format) and, when the
`hickle` package is importable, the reference's `.hkl` HDF5 dumps — so dumps
produced by the reference eval harness can be merged with ours in one run.

Usage:
  python scripts/merge_multi_scale.py --dataset Y --list scoreDir1 scoreDir2 \
      --output out_dir
"""
import os
import shutil
import sys
from argparse import ArgumentParser
from multiprocessing import Pool
from os import path

import numpy as np
from PIL import Image

sys.path.insert(0, path.join(path.dirname(__file__), ".."))

from cutie_tpu.utils.palette import davis_palette, youtube_palette  # noqa: E402

try:  # optional: read reference-produced HDF5 score dumps
    import hickle  # type: ignore
except ImportError:
    hickle = None

SCORE_EXTS = (".npz",) + ((".hkl",) if hickle is not None else ())


def _load_prob(file_path: str) -> np.ndarray:
    """One frame's uint8 probability dump [K, H, W], either format."""
    if file_path.endswith(".npz"):
        return np.load(file_path)["prob"]
    return np.asarray(hickle.load(file_path))


def _load_backward_mapping(vid_dir: str):
    """{object_id -> tmp_index} saved with the video's last frame, or None."""
    npz = path.join(vid_dir, "backward.npz")
    if path.exists(npz):
        raw = dict(np.load(npz))
        return {int(k): int(v) for k, v in raw.items()}
    hkl = path.join(vid_dir, "backward.hkl")
    if hickle is not None and path.exists(hkl):
        raw = hickle.load(hkl)
        return {int(k): int(v) for k, v in raw.items()}
    return None


def _first_existing(score_dirs, name):
    for d in score_dirs:
        if path.exists(path.join(d, name)):
            return path.join(d, name)
    return None


def _frame_names(vid_dir: str):
    return sorted(f for f in os.listdir(vid_dir)
                  if f.endswith(SCORE_EXTS) and not f.startswith("backward"))


def merge_video(vid: str, score_dirs, out_root: str, dataset: str, palette):
    """Sum this video's per-scale dumps, argmax, remap ids, write PNGs."""
    vid_dir = _first_existing(score_dirs, vid)
    backward = _load_backward_mapping(vid_dir) if vid_dir else None

    out_dir = (path.join(out_root, "Annotations", vid)
               if "Y" in dataset else path.join(out_root, vid))
    os.makedirs(out_dir, exist_ok=True)

    for frame in _frame_names(path.join(score_dirs[0], vid)):
        stem = frame[:frame.rfind(".")]
        total = None
        for d in score_dirs:
            # a scale may store the frame under either extension
            for ext in SCORE_EXTS:
                p = path.join(d, vid, stem + ext)
                if path.exists(p):
                    prob = _load_prob(p).astype(np.float32)
                    total = prob if total is None else total + prob
                    break
        winner = np.argmax(total, axis=0)
        if backward is not None:
            mask = np.zeros_like(winner, dtype=np.uint8)
            for obj_id, tmp_idx in backward.items():
                mask[winner == tmp_idx] = obj_id
        else:
            mask = winner.astype(np.uint8)
        png = Image.fromarray(mask)
        png.putpalette(palette)
        png.save(path.join(out_dir, stem + ".png"))


def _worker(vid):
    merge_video(vid, _g["dirs"], _g["out"], _g["dataset"], _g["palette"])


_g = {}

if __name__ == "__main__":
    parser = ArgumentParser()
    parser.add_argument("--dataset", default="Y",
                        help="D/Y: D for DAVIS, Y for YouTubeVOS")
    parser.add_argument("--list", nargs="+", help="score directories to merge")
    parser.add_argument("--output", required=True)
    parser.add_argument("--num_proc", type=int, default=8)
    args = parser.parse_args()

    _g.update(dirs=args.list, out=args.output, dataset=args.dataset,
              palette=youtube_palette if "Y" in args.dataset else davis_palette)
    videos = sorted(os.listdir(args.list[0]))
    os.makedirs(args.output, exist_ok=True)

    with Pool(args.num_proc) as pool:
        pool.map(_worker, videos)

    if "Y" in args.dataset:
        print("Making zip for YouTubeVOS...")
        shutil.make_archive(args.output, "zip", args.output, "Annotations")
    else:
        print("Making zip for DAVIS...")
        shutil.make_archive(args.output, "zip", args.output)
