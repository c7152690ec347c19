"""List videos whose FIRST mask is empty (they cannot seed training samples).

Behavioral parity target: reference scripts/data/find_empty_video.py.
Usage: python scripts/data/find_empty_video.py annotations_dir

PROVENANCE: compatibility port. This offline host utility follows the
reference script's control flow closely on purpose -- its outputs must be
format-compatible with the reference tooling ecosystem. It is not TPU
compute-path code; no kernel or model code follows this pattern.
"""
import os
import sys
from os import path

import numpy as np
from PIL import Image

data_path = sys.argv[1]

for v in sorted(os.listdir(data_path)):
    frames = sorted(os.listdir(path.join(data_path, v)))
    if not frames:
        print(v, "(no masks)")
        continue
    im = np.array(Image.open(path.join(data_path, v, frames[0])))
    if im.max() == 0:
        print(v)
