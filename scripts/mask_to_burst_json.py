"""Convert predicted PNG masks to a BURST-format RLE JSON.

Behavioral parity target: reference scripts/mask_to_burst_json.py (same CLI:
gt_json input_mask_dir output_json). RLE via cutie_tpu.utils.rle.

Usage: python scripts/mask_to_burst_json.py gt.json mask_dir out.json
"""
import json
import os
import sys
from collections import defaultdict
from os import path

import numpy as np
from PIL import Image

sys.path.insert(0, path.join(path.dirname(__file__), ".."))

from cutie_tpu.utils import rle as rle_codec  # noqa: E402


def main():
    gt_json_path, input_mask_path, output_json_path = sys.argv[1:4]
    with open(gt_json_path) as f:
        json_dict = json.load(f)

    videos = defaultdict(list)
    for video_name in os.listdir(input_mask_path):
        dataset, video = video_name.split("_-_")
        videos[dataset].append(video)

    for seq in json_dict["sequences"]:
        dataset, seq_name = seq["dataset"], seq["seq_name"]
        assert dataset in videos and seq_name in videos[dataset], (dataset, seq_name)
        segmentations = []
        for image_path in seq["annotated_image_paths"]:
            this_segment = {}
            mask_path = path.join(input_mask_path, f"{dataset}_-_{seq_name}",
                                  image_path[:-4] + ".png")
            if path.exists(mask_path):
                mask = np.array(Image.open(mask_path))
                labels = np.unique(mask)
                for label in labels[labels != 0].tolist():
                    this_mask = (mask == label).astype(np.uint8)
                    if this_mask.sum() == 0:
                        continue
                    enc = rle_codec.encode(this_mask)
                    this_segment[label] = {"rle": enc["counts"]}
            segmentations.append(this_segment)
        seq["segmentations"] = segmentations

    with open(output_json_path, "w") as f:
        json.dump(json_dict, f)


if __name__ == "__main__":
    main()
