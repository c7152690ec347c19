"""Canonical scripting-API usage (parity: reference scripting_demo.py:12-67).

Feeds a directory of frames + a first-frame palette mask through
InferenceCore and writes predicted masks. With no arguments, a tiny synthetic
demo video is generated under /tmp so the demo is self-contained.
"""
import argparse
import os
from os import path

import numpy as np
from PIL import Image


def make_synthetic_example(root: str, t: int = 8, h: int = 240, w: int = 320):
    os.makedirs(path.join(root, "images"), exist_ok=True)
    os.makedirs(path.join(root, "masks"), exist_ok=True)
    rng = np.random.default_rng(0)
    bg = rng.uniform(50, 130, size=(h, w, 3)).astype(np.uint8)
    sq = h // 4
    for ti in range(t):
        f = bg.copy()
        y, x = h // 8 + ti * 4, w // 8 + ti * 6
        f[y:y + sq, x:x + sq] = [220, 60, 40]
        Image.fromarray(f).save(path.join(root, "images", f"{ti:05d}.jpg"))
        if ti == 0:
            m = np.zeros((h, w), np.uint8)
            m[y:y + sq, x:x + sq] = 1
            from cutie_tpu.utils.palette import davis_palette
            img = Image.fromarray(m, mode="P")
            img.putpalette(davis_palette)
            img.save(path.join(root, "masks", "00000.png"))
    return path.join(root, "images"), path.join(root, "masks", "00000.png")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--images", default=None, help="directory of jpg frames")
    parser.add_argument("--mask", default=None, help="first-frame palette png")
    parser.add_argument("--output", default="./output/demo")
    parser.add_argument("--weights", default=None)
    parser.add_argument("--model", default="base", choices=["base", "small"])
    args = parser.parse_args()

    from cutie_tpu.config import eval_config, get_dataset_cfg
    from cutie_tpu.inference import InferenceCore
    from cutie_tpu.utils.get_default_model import build_model

    if args.images is None:
        args.images, args.mask = make_synthetic_example("/tmp/cutie_tpu_demo")

    cfg = eval_config(args.model)
    get_dataset_cfg(cfg)
    bundle = build_model(cfg, weights=args.weights)
    processor = InferenceCore(bundle, cfg)

    mask_img = Image.open(args.mask)
    palette = mask_img.getpalette()
    mask = np.array(mask_img)
    objects = np.unique(mask)
    objects = objects[objects != 0].tolist()

    frames = sorted(os.listdir(args.images))
    os.makedirs(args.output, exist_ok=True)
    for ti, frame_name in enumerate(frames):
        image = Image.open(path.join(args.images, frame_name)).convert("RGB")
        image_np = np.transpose(np.asarray(image, np.float32) / 255.0, (2, 0, 1))

        if ti == 0:
            # first frame: provide the ground-truth mask to start tracking
            output_prob = processor.step(image_np, mask, objects=objects)
        else:
            output_prob = processor.step(image_np)

        out_mask = processor.output_prob_to_mask(output_prob).astype(np.uint8)
        out = Image.fromarray(out_mask, mode="P")
        if palette is not None:
            out.putpalette(palette)
        out.save(path.join(args.output, frame_name.rsplit(".", 1)[0] + ".png"))
        print(f"{frame_name}: objects present "
              f"{np.unique(out_mask)[np.unique(out_mask) != 0].tolist()}")


if __name__ == "__main__":
    main()
