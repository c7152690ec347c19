"""Multi-scale score merging.

Behavioral parity target: reference scripts/merge_multi_scale.py:27-71 —
sum per-scale probability dumps, argmax, remap via the saved backward mapping,
save palette PNGs, zip. Score dumps are .npz (our ResultSaver's format;
hickle/HDF5 is not in this environment).

Usage:
  python scripts/merge_multi_scale.py --dataset Y --list scoreDir1 scoreDir2 \
      --output out_dir [--pattern subset.txt]
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


def search_options(options, name):
    for option in options:
        if path.exists(path.join(option, name)):
            return path.join(option, name)
    return None


def process_vid(vid):
    vid_path = search_options(all_options, vid)
    backward_mapping = None
    if vid_path is not None and path.exists(path.join(vid_path, "backward.npz")):
        raw = dict(np.load(path.join(vid_path, "backward.npz")))
        backward_mapping = {int(k): int(v) for k, v in raw.items()}

    frames = [f for f in os.listdir(path.join(all_options[0], vid))
              if "backward" not in f]

    if "Y" in args.dataset:
        this_out_path = path.join(out_path, "Annotations", vid)
    else:
        this_out_path = path.join(out_path, vid)
    os.makedirs(this_out_path, exist_ok=True)

    for f in frames:
        result_sum = None
        for option in all_options:
            p = path.join(option, vid, f)
            if not path.exists(p):
                continue
            result = np.load(p)["prob"]
            result_sum = (result.astype(np.float32) if result_sum is None
                          else result_sum + result)
        result_sum = np.argmax(result_sum, axis=0)
        if backward_mapping is not None:
            idx_mask = np.zeros_like(result_sum, dtype=np.uint8)
            for l, i in backward_mapping.items():
                idx_mask[result_sum == i] = l
        else:
            idx_mask = result_sum.astype(np.uint8)
        img = Image.fromarray(idx_mask)
        img.putpalette(pal)
        img.save(path.join(this_out_path, f[:-4] + ".png"))


if __name__ == "__main__":
    parser = ArgumentParser()
    parser.add_argument("--dataset", default="Y",
                        help="D/Y: D for DAVIS, Y for YouTubeVOS")
    parser.add_argument("--list", nargs="+", help="score directories to merge")
    parser.add_argument("--output", required=True)
    parser.add_argument("--num_proc", type=int, default=8)
    args = parser.parse_args()

    all_options = args.list
    out_path = args.output
    pal = youtube_palette if "Y" in args.dataset else davis_palette
    videos = sorted(os.listdir(all_options[0]))
    os.makedirs(out_path, exist_ok=True)

    with Pool(args.num_proc) as pool:
        pool.map(process_vid, videos)

    if "Y" in args.dataset:
        print("Making zip for YouTubeVOS...")
        shutil.make_archive(out_path, "zip", out_path, "Annotations")
    else:
        print("Making zip for DAVIS...")
        shutil.make_archive(out_path, "zip", out_path)
