"""Generate the bundled demo clips (synthetic stand-ins for the reference's
examples/ — reference README.md + examples/: 'bike' 4 frames + 1 first-frame
mask, 'judo' 16 frames + 4 annotated frames for the add/delete demo).

Run from the repo root: python examples/make_examples.py
"""
import os
import sys
from os import path

import numpy as np
from PIL import Image

sys.path.insert(0, path.dirname(path.dirname(path.abspath(__file__))))


def moving_squares(t, h, w, seed, squares):
    """Frames with textured background + moving colored squares, and per-frame
    index masks for the squares."""
    rng = np.random.default_rng(seed)
    bg = rng.integers(40, 140, size=(h, w, 3), dtype=np.uint8)
    frames, masks = [], []
    sq = h // 5
    for ti in range(t):
        f = bg.copy()
        m = np.zeros((h, w), np.uint8)
        for oid, (y0, x0, dy, dx, color) in enumerate(squares, start=1):
            y = int(np.clip(y0 + ti * dy, 0, h - sq - 1))
            x = int(np.clip(x0 + ti * dx, 0, w - sq - 1))
            f[y:y + sq, x:x + sq] = color
            m[y:y + sq, x:x + sq] = oid
        frames.append(f)
        masks.append(m)
    return frames, masks


def save_clip(root, name, frames, masks, annotated):
    from cutie_tpu.utils.palette import davis_palette

    img_dir = path.join(root, name, "images")
    msk_dir = path.join(root, name, "masks")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(msk_dir, exist_ok=True)
    for ti, f in enumerate(frames):
        Image.fromarray(f).save(path.join(img_dir, f"{ti:05d}.jpg"), quality=95)
    for ti in annotated:
        pm = Image.fromarray(masks[ti], mode="P")
        pm.putpalette(davis_palette)
        pm.save(path.join(msk_dir, f"{ti:05d}.png"))


def main():
    root = path.dirname(path.abspath(__file__))
    # 'bike'-style: 4 frames, one object, first-frame mask only
    frames, masks = moving_squares(
        4, 96, 160, seed=5,
        squares=[(20, 20, 3, 6, (220, 60, 40))])
    save_clip(root, "bike", frames, masks, annotated=[0])
    # 'judo'-style: 16 frames, two objects, masks on frames 0/4/8/12
    frames, masks = moving_squares(
        16, 96, 160, seed=9,
        squares=[(10, 10, 2, 4, (230, 50, 50)), (50, 90, 1, -3, (40, 90, 230))])
    save_clip(root, "judo", frames, masks, annotated=[0, 4, 8, 12])
    print("examples written under", root)


if __name__ == "__main__":
    main()
