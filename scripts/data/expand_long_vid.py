"""Ping-pong extend a video N times (long-video stress testing).

Behavioral parity target: reference scripts/data/expand_long_vid.py.
Usage: python scripts/data/expand_long_vid.py in_root out_root multiplier

PROVENANCE: compatibility port. This offline host utility follows the
reference script's control flow closely on purpose -- its outputs must be
format-compatible with the reference tooling ecosystem. It is not TPU
compute-path code; no kernel or model code follows this pattern.
"""
import os
import sys
from os import path
from shutil import copy2

input_path, output_path, multiplier = sys.argv[1], sys.argv[2], int(sys.argv[3])
image_path = path.join(input_path, "JPEGImages")
gt_path = path.join(input_path, "Annotations")

for vid in sorted(os.listdir(image_path)):
    os.makedirs(path.join(output_path, "JPEGImages", vid), exist_ok=True)
    os.makedirs(path.join(output_path, "Annotations", vid), exist_ok=True)
    frames = sorted(os.listdir(path.join(image_path, vid)))
    counter = 0
    output_counter = 0
    direction = 1
    for _ in range(multiplier):
        for _ in range(len(frames)):
            copy2(path.join(image_path, vid, frames[counter]),
                  path.join(output_path, "JPEGImages", vid,
                            f"{output_counter:05d}.jpg"))
            mask_file = path.join(gt_path, vid,
                                  frames[counter].replace(".jpg", ".png"))
            if path.exists(mask_file):
                copy2(mask_file, path.join(output_path, "Annotations", vid,
                                           f"{output_counter:05d}.png"))
            counter += direction
            output_counter += 1
            if counter == 0 or counter == len(frames) - 1:
                direction *= -1
