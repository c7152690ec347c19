"""Keep only the FIRST annotation of every object (LVOS test-format prep).

Behavioral parity target: reference scripts/data/preprocess_lvos.py.
Usage: python scripts/data/preprocess_lvos.py input_annotations out_dir

PROVENANCE: compatibility port. This offline host utility follows the
reference script's control flow closely on purpose -- its outputs must be
format-compatible with the reference tooling ecosystem. It is not TPU
compute-path code; no kernel or model code follows this pattern.
"""
import os
import sys
from multiprocessing import Pool

import numpy as np
from PIL import Image

input_dir = sys.argv[1]
output_dir = sys.argv[2]


def process_vid(video_name):
    os.makedirs(os.path.join(output_dir, video_name), exist_ok=True)
    frames = sorted(os.listdir(os.path.join(input_dir, video_name)))
    existing = set()
    for f in frames:
        mask_img = Image.open(os.path.join(input_dir, video_name, f))
        palette = mask_img.getpalette()
        mask = np.array(mask_img).astype(np.uint8)
        labels = np.unique(mask)
        new_labels = [l for l in labels[labels != 0].tolist()
                      if l not in existing]
        if new_labels:
            existing.update(new_labels)
            out = np.zeros_like(mask)
            for l in new_labels:
                out[mask == l] = l
            out_img = Image.fromarray(out)
            if palette is not None:
                out_img.putpalette(palette)
            out_img.save(os.path.join(output_dir, video_name, f))


if __name__ == "__main__":
    videos = sorted(os.listdir(input_dir))
    with Pool(8) as p:
        list(p.imap(process_vid, videos))
