"""GUI workspace resource management (no Qt dependencies).

Behavioral parity target: reference gui/resource_manager.py:25-317 —
video->frames extraction with a shorter-edge cap, image import with resizing,
LRU frame/mask caches, a multi-threaded save queue writing palette masks /
visualizations / per-object soft masks, mask/layer import helpers.
"""
from __future__ import annotations

import collections
import logging
import os
import shutil
from dataclasses import dataclass
from os import path
from queue import Queue
from threading import Thread
from typing import Optional, Tuple, Union

import cv2
import numpy as np
from PIL import Image

from cutie_tpu.utils.palette import davis_palette

log = logging.getLogger(__name__)


class LRU:
    """Tiny LRU wrapper (resource_manager.py:25-44)."""

    def __init__(self, func, maxsize=128):
        self.cache = collections.OrderedDict()
        self.func = func
        self.maxsize = maxsize

    def __call__(self, *args):
        if args in self.cache:
            self.cache.move_to_end(args)
            return self.cache[args]
        result = self.func(*args)
        self.cache[args] = result
        if len(self.cache) > self.maxsize:
            self.cache.popitem(last=False)
        return result

    def invalidate(self, key):
        self.cache.pop(key, None)


@dataclass
class SaveItem:
    type: str  # 'mask' | 'visualization_<mode>' | 'soft_mask'
    data: Union[Image.Image, np.ndarray]
    name: Optional[str] = None


class ResourceManager:

    def __init__(self, cfg):
        images = cfg["images"]
        video = cfg["video"]
        self.workspace = cfg["workspace"]
        self.max_size = cfg["max_overall_size"]
        self.palette = davis_palette

        if self.workspace is None:
            if images is not None:
                basename = path.basename(images)
            elif video is not None:
                basename = path.basename(video)[:-4]
            else:
                raise NotImplementedError(
                    "Either images, video, or workspace has to be specified")
            self.workspace = path.join("./workspace", basename)
        log.info("Workspace is in: %s", self.workspace)
        cfg["workspace"] = self.workspace

        need_decoding = need_resizing = False
        if path.exists(path.join(self.workspace, "images")):
            pass
        elif images is not None:
            need_resizing = True
        elif video is not None:
            need_decoding = True

        self.image_dir = path.join(self.workspace, "images")
        self.mask_dir = path.join(self.workspace, "masks")
        self.visualization_dir = path.join(self.workspace, "visualization")
        self.soft_mask_dir = path.join(self.workspace, "soft_masks")
        for d in (self.image_dir, self.mask_dir, self.visualization_dir,
                  self.soft_mask_dir):
            os.makedirs(d, exist_ok=True)
        for i in range(1, cfg["num_objects"] + 1):
            os.makedirs(path.join(self.soft_mask_dir, str(i)), exist_ok=True)

        self.get_image = LRU(self._get_image_unbuffered, maxsize=cfg["buffer_size"])
        self.get_mask = LRU(self._get_mask_unbuffered, maxsize=cfg["buffer_size"])

        if need_decoding:
            self._extract_frames(video)
        if need_resizing:
            self._copy_resize_frames(images)

        self._files = sorted(os.listdir(self.image_dir))
        self.names = [path.splitext(f)[0] for f in self._files]
        self.length = len(self.names)
        assert self.length > 0, \
            f"No images found! Check {self.workspace}/images."
        log.info("%d images found.", self.length)
        self.height, self.width = self.get_image(0).shape[:2]

        self.save_queue: Queue = Queue(maxsize=cfg["save_queue_size"])
        self.num_save_threads = cfg["num_save_threads"]
        self.save_threads = [Thread(target=self.save_thread,
                                    args=(self.save_queue,), daemon=True)
                             for _ in range(self.num_save_threads)]
        for t in self.save_threads:
            t.start()

    def close(self):
        for _ in range(self.num_save_threads):
            self.save_queue.put(None)
        self.save_queue.join()
        for t in self.save_threads:
            t.join()

    def save_thread(self, queue: Queue):
        while True:
            args: Optional[SaveItem] = queue.get()
            if args is None:
                queue.task_done()
                break
            if args.type == "mask":
                args.data.save(path.join(self.mask_dir, args.name + ".png"))
            elif args.type.startswith("visualization"):
                vis_mode = args.type.split("_")[-1]
                os.makedirs(path.join(self.visualization_dir, vis_mode),
                            exist_ok=True)
                if vis_mode == "rgba":
                    data = cv2.cvtColor(args.data, cv2.COLOR_RGBA2BGRA)
                    cv2.imwrite(path.join(self.visualization_dir, vis_mode,
                                          args.name + ".png"), data)
                else:
                    data = cv2.cvtColor(args.data, cv2.COLOR_RGB2BGR)
                    cv2.imwrite(path.join(self.visualization_dir, vis_mode,
                                          args.name + ".jpg"), data)
            elif args.type == "soft_mask":
                for i in range(1, args.data.shape[0]):  # channel 0 = background
                    data = (args.data[i] * 255).astype(np.uint8)
                    cv2.imwrite(path.join(self.soft_mask_dir, str(i),
                                          args.name + ".png"), data)
            else:
                raise NotImplementedError(args.type)
            queue.task_done()

    def _extract_frames(self, video: str):
        cap = cv2.VideoCapture(video)
        frame_index = 0
        log.info("Extracting frames from %s into %s...", video, self.image_dir)
        while cap.isOpened():
            _, frame = cap.read()
            if frame is None:
                break
            h, w = frame.shape[:2]
            if self.max_size > 0 and min(h, w) > self.max_size:
                new_w = w * self.max_size // min(w, h)
                new_h = h * self.max_size // min(w, h)
                frame = cv2.resize(frame, (new_w, new_h),
                                   interpolation=cv2.INTER_AREA)
            cv2.imwrite(path.join(self.image_dir, f"{frame_index:07d}.jpg"), frame)
            frame_index += 1
        cap.release()

    def _copy_resize_frames(self, images: str):
        log.info("Copying/resizing frames into %s...", self.image_dir)
        for image_name in os.listdir(images):
            if self.max_size < 0:
                shutil.copy2(path.join(images, image_name), self.image_dir)
            else:
                frame = cv2.imread(path.join(images, image_name))
                h, w = frame.shape[:2]
                if self.max_size > 0 and min(h, w) > self.max_size:
                    new_w = w * self.max_size // min(w, h)
                    new_h = h * self.max_size // min(w, h)
                    frame = cv2.resize(frame, (new_w, new_h),
                                       interpolation=cv2.INTER_AREA)
                cv2.imwrite(path.join(self.image_dir, image_name), frame)

    def add_to_queue_with_warning(self, item: SaveItem):
        if self.save_queue.full():
            log.warning("The save queue is full! You need more threads or "
                        "faster IO. Program might pause.")
        self.save_queue.put(item)

    def save_mask(self, ti: int, mask: np.ndarray):
        assert 0 <= ti < self.length
        img = Image.fromarray(mask)
        img.putpalette(self.palette)
        self.invalidate(ti)
        self.add_to_queue_with_warning(SaveItem("mask", img, self.names[ti]))

    def save_visualization(self, ti: int, vis_mode: str, image: np.ndarray):
        assert 0 <= ti < self.length
        self.add_to_queue_with_warning(
            SaveItem(f"visualization_{vis_mode}", image, self.names[ti]))

    def save_soft_mask(self, ti: int, prob: np.ndarray):
        assert 0 <= ti < self.length
        self.add_to_queue_with_warning(SaveItem("soft_mask", prob, self.names[ti]))

    def _get_image_unbuffered(self, ti: int) -> np.ndarray:
        assert 0 <= ti < self.length
        return np.array(Image.open(
            path.join(self.image_dir, self._files[ti])).convert("RGB"))

    def _get_mask_unbuffered(self, ti: int) -> Optional[np.ndarray]:
        assert 0 <= ti < self.length
        mask_path = path.join(self.mask_dir, self.names[ti] + ".png")
        if path.exists(mask_path):
            return np.array(Image.open(mask_path))
        return None

    def import_mask(self, file_name: str,
                    size: Optional[Tuple[int, int]] = None) -> np.ndarray:
        image = Image.open(file_name)
        if size is not None:
            image = image.resize((size[1], size[0]), resample=Image.NEAREST)
        return np.array(image)

    def import_layer(self, file_name: str, size: Tuple[int, int]) -> np.ndarray:
        image = Image.open(file_name).convert("RGBA")
        im_w, im_h = image.size
        im_ratio = im_w / im_h
        canvas_ratio = size[1] / size[0]
        if im_ratio < canvas_ratio:
            new_h = size[0]
            new_w = int(new_h * im_ratio)
        else:
            new_w = size[1]
            new_h = int(new_w / im_ratio)
        image = np.array(image.resize((new_w, new_h), resample=Image.BILINEAR))
        pad_h = (size[0] - new_h) // 2
        pad_w = (size[1] - new_w) // 2
        return np.pad(image, ((pad_h, size[0] - new_h - pad_h),
                              (pad_w, size[1] - new_w - pad_w), (0, 0)))

    def invalidate(self, ti: int):
        self.get_mask.invalidate((ti,))

    def __len__(self):
        return self.length

    @property
    def T(self) -> int:
        return self.length

    @property
    def h(self) -> int:
        return self.height

    @property
    def w(self) -> int:
        return self.width
