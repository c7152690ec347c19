"""Convert BURST RLE-JSON annotations into DAVIS-format PNG training data.

Behavioral parity target: reference scripts/convert_burst_to_vos_train.py:35-79
(per-sequence mask decode + frame copy, '<dataset>_-_<seq>' naming, optional
all-frames copy, multiprocessing Pool).

Usage:
  python scripts/convert_burst_to_vos_train.py --json_path train.json \
      --frames_path BURST/frames/train --output_path vos_train [--save_all_image]
"""
import json
import os
import sys
from argparse import ArgumentParser
from multiprocessing import Pool
from os import path
from shutil import copy2

import numpy as np
from PIL import Image

sys.path.insert(0, path.join(path.dirname(path.abspath(__file__)), ".."))

from cutie_tpu.utils import rle as rle_codec  # noqa: E402
from cutie_tpu.utils.palette import davis_palette  # noqa: E402

parser = ArgumentParser()
parser.add_argument("--json_path")
parser.add_argument("--frames_path")
parser.add_argument("--output_path")
parser.add_argument("--save_all_image", action="store_true")
parser.add_argument("--num_proc", type=int, default=16)
args = parser.parse_args()


def process_video(sequence):
    dataset = sequence["dataset"]
    seq_name = sequence["seq_name"]
    width, height = sequence["width"], sequence["height"]
    new_seq_name = f"{dataset}_-_{seq_name}"

    out_img = path.join(args.output_path, "JPEGImages", new_seq_name)
    out_mask = path.join(args.output_path, "Annotations", new_seq_name)
    os.makedirs(out_img, exist_ok=True)
    os.makedirs(out_mask, exist_ok=True)

    for segmentation, image_path in zip(sequence["segmentations"],
                                        sequence["annotated_image_paths"]):
        output_mask = np.zeros((height, width), np.uint8)
        for object_id, obj in segmentation.items():
            mask = rle_codec.decode({"size": [height, width],
                                     "counts": obj["rle"]}).astype(bool)
            output_mask[mask] = int(object_id)
        img = Image.fromarray(output_mask)
        img.putpalette(davis_palette)
        img.save(path.join(out_mask, image_path[:-4] + ".png"))
        copy2(path.join(args.frames_path, dataset, seq_name, image_path), out_img)

    if args.save_all_image:
        out_all = path.join(args.output_path, "JPEGImages_all_frames", new_seq_name)
        os.makedirs(out_all, exist_ok=True)
        for image_path in sequence["all_image_paths"]:
            copy2(path.join(args.frames_path, dataset, seq_name, image_path),
                  out_all)


if __name__ == "__main__":
    with open(args.json_path) as f:
        global_json = json.load(f)
    with Pool(args.num_proc) as p:
        list(p.imap_unordered(process_video, global_json["sequences"]))
