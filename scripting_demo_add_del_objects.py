"""Mid-video object addition/deletion demo
(parity: reference scripting_demo_add_del_objects.py:28-73).

Adds a second object at t=4 (its new mask merges with the propagated
prediction of the first object) and deletes object 1 at t=10 via
processor.delete_objects([1]).
"""
import argparse
import os
from os import path

import numpy as np
from PIL import Image


def make_two_object_video(root: str, t: int = 14, h: int = 240, w: int = 320):
    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(1)
    bg = rng.uniform(40, 120, size=(h, w, 3)).astype(np.uint8)
    sq = h // 5
    frames, masks = [], {}
    for ti in range(t):
        f = bg.copy()
        y1, x1 = h // 8 + ti * 3, w // 8 + ti * 4
        y2, x2 = h // 2, w // 2 + ti * 2
        f[y1:y1 + sq, x1:x1 + sq] = [220, 60, 40]
        f[y2:y2 + sq, x2:x2 + sq] = [40, 80, 220]
        frames.append(f)
        if ti == 0:
            m = np.zeros((h, w), np.uint8)
            m[y1:y1 + sq, x1:x1 + sq] = 1
            masks[0] = m
        if ti == 4:
            m = np.zeros((h, w), np.uint8)
            m[y2:y2 + sq, x2:x2 + sq] = 2
            masks[4] = m
    return frames, masks


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--output", default="./output/demo_add_del")
    parser.add_argument("--weights", default=None)
    parser.add_argument("--model", default="small", choices=["base", "small"])
    args = parser.parse_args()

    from cutie_tpu.config import eval_config, get_dataset_cfg
    from cutie_tpu.inference import InferenceCore
    from cutie_tpu.utils.get_default_model import build_model
    from cutie_tpu.utils.palette import davis_palette

    cfg = eval_config(args.model)
    get_dataset_cfg(cfg)
    bundle = build_model(cfg, weights=args.weights)
    processor = InferenceCore(bundle, cfg)

    frames, masks = make_two_object_video("/tmp/cutie_tpu_demo_add_del")
    os.makedirs(args.output, exist_ok=True)

    for ti, frame in enumerate(frames):
        image_np = np.transpose(frame.astype(np.float32) / 255.0, (2, 0, 1))

        if ti == 10:
            processor.delete_objects([1])

        if ti in masks:
            # mask may be partial: present objects keep their propagated
            # prediction, listed objects are overwritten by the mask
            m = masks[ti]
            objects = np.unique(m)
            objects = objects[objects != 0].tolist()
            output_prob = processor.step(image_np, m, objects=objects)
        else:
            output_prob = processor.step(image_np)

        out_mask = processor.output_prob_to_mask(output_prob).astype(np.uint8)
        out = Image.fromarray(out_mask, mode="P")
        out.putpalette(davis_palette)
        out.save(path.join(args.output, f"{ti:05d}.png"))
        present = np.unique(out_mask)
        print(f"t={ti}: objects {present[present != 0].tolist()}")


if __name__ == "__main__":
    main()
