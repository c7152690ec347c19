"""RITM interactive-segmentation inference stack (host orchestration).

Behavioral parity targets:
  - gui/ritm/inference/clicker.py (Clicker/Click incl. auto-click generation
    from FN/FP distance transforms)
  - gui/ritm/inference/transforms/{zoom_in,limit_longest_side,flip,base}.py
  - gui/ritm/inference/predictors/base.py (BasePredictor)
  - gui/ritm/controller.py (InteractiveController with undo)
  - gui/ritm/utils/misc.py bbox helpers

Host code is numpy; the network call goes through a shape-bucketed jit of
HRNetISModel (images padded up to multiples of 64 so ZoomIn's variable crops
hit a handful of compiled shapes).

Latency engineering (round 3): jitted callables live in a MODULE-LEVEL cache
keyed by model identity + static config, not on predictor instances — the
GUI rebuilds the predictor on every image/object switch (reset_predictor),
which used to discard every compiled graph and recompile the full network
(~60-75 s per shape bucket on a v5e) on the next click.
"""
from __future__ import annotations

import functools
import math
from copy import deepcopy
from typing import List, Optional, Tuple

import cv2
import numpy as np

# Distinct ZoomIn crops must land on few compiled shapes: pad H/W up to this
# multiple (waste is cropped off after the forward; clicks keep unpadded
# coords). 64 halves the bucket count of the old 32 at <= 15% extra pixels.
PAD_MULTIPLE = 64


def pad_hw(h: int, w: int) -> Tuple[int, int]:
    return (int(math.ceil(h / PAD_MULTIPLE) * PAD_MULTIPLE),
            int(math.ceil(w / PAD_MULTIPLE) * PAD_MULTIPLE))


# Compiled-callable cache surviving predictor rebuilds. Values keep a strong
# ref to the model so an id() key can't alias a collected model.
_JIT_CACHE: dict = {}


def cached_jit(key, keepalive, builder):
    ent = _JIT_CACHE.get(key)
    if ent is None:
        ent = _JIT_CACHE[key] = (keepalive, builder())
    return ent[1]


# ------------------------------------------------------------------- clicks

class Click:
    def __init__(self, is_positive: bool, coords: Tuple[float, float], indx=None):
        self.is_positive = is_positive
        self.coords = coords
        self.indx = indx

    @property
    def coords_and_indx(self):
        return (*self.coords, self.indx)

    def copy(self, **kwargs):
        c = deepcopy(self)
        for k, v in kwargs.items():
            setattr(c, k, v)
        return c


class Clicker:
    """(clicker.py:6-105)"""

    def __init__(self, gt_mask=None, init_clicks=None, ignore_label=-1,
                 click_indx_offset=0):
        self.click_indx_offset = click_indx_offset
        if gt_mask is not None:
            self.gt_mask = gt_mask == 1
            self.not_ignore_mask = gt_mask != ignore_label
        else:
            self.gt_mask = None
        self.reset_clicks()
        if init_clicks is not None:
            for click in init_clicks:
                self.add_click(click)

    def make_next_click(self, pred_mask):
        assert self.gt_mask is not None
        self.add_click(self._get_next_click(pred_mask))

    def get_clicks(self, clicks_limit=None):
        return self.clicks_list[:clicks_limit]

    def _get_next_click(self, pred_mask, padding=True) -> Click:
        fn_mask = self.gt_mask & ~pred_mask & self.not_ignore_mask
        fp_mask = ~self.gt_mask & pred_mask & self.not_ignore_mask
        if padding:
            fn_mask = np.pad(fn_mask, 1)
            fp_mask = np.pad(fp_mask, 1)
        fn_dt = cv2.distanceTransform(fn_mask.astype(np.uint8), cv2.DIST_L2, 0)
        fp_dt = cv2.distanceTransform(fp_mask.astype(np.uint8), cv2.DIST_L2, 0)
        if padding:
            fn_dt = fn_dt[1:-1, 1:-1]
            fp_dt = fp_dt[1:-1, 1:-1]
        fn_dt = fn_dt * self.not_clicked_map
        fp_dt = fp_dt * self.not_clicked_map
        is_positive = fn_dt.max() > fp_dt.max()
        dt = fn_dt if is_positive else fp_dt
        ys, xs = np.where(dt == dt.max())
        return Click(is_positive=bool(is_positive), coords=(int(ys[0]), int(xs[0])))

    def add_click(self, click: Click):
        click.indx = (self.click_indx_offset + self.num_pos_clicks
                      + self.num_neg_clicks)
        if click.is_positive:
            self.num_pos_clicks += 1
        else:
            self.num_neg_clicks += 1
        self.clicks_list.append(click)
        if self.gt_mask is not None:
            self.not_clicked_map[click.coords[0], click.coords[1]] = False

    def reset_clicks(self):
        if self.gt_mask is not None:
            self.not_clicked_map = np.ones_like(self.gt_mask, dtype=bool)
        self.num_pos_clicks = 0
        self.num_neg_clicks = 0
        self.clicks_list: List[Click] = []

    def get_state(self):
        return deepcopy(self.clicks_list)

    def set_state(self, state):
        self.reset_clicks()
        for click in state:
            self.add_click(click)

    def __len__(self):
        return len(self.clicks_list)


# ------------------------------------------------------------- bbox helpers

def get_bbox_from_mask(mask):
    rows = np.any(mask, axis=1)
    cols = np.any(mask, axis=0)
    rmin, rmax = np.where(rows)[0][[0, -1]]
    cmin, cmax = np.where(cols)[0][[0, -1]]
    return rmin, rmax, cmin, cmax


def expand_bbox(bbox, expand_ratio, min_crop_size=None):
    rmin, rmax, cmin, cmax = bbox
    rcenter = 0.5 * (rmin + rmax)
    ccenter = 0.5 * (cmin + cmax)
    height = expand_ratio * (rmax - rmin + 1)
    width = expand_ratio * (cmax - cmin + 1)
    if min_crop_size is not None:
        height = max(height, min_crop_size)
        width = max(width, min_crop_size)
    rmin = int(round(rcenter - height / 2))
    rmax = int(round(rcenter + height / 2))
    cmin = int(round(ccenter - width / 2))
    cmax = int(round(ccenter + width / 2))
    return rmin, rmax, cmin, cmax


def clamp_bbox(bbox, rmin, rmax, cmin, cmax):
    return (max(rmin, bbox[0]), min(rmax, bbox[1]),
            max(cmin, bbox[2]), min(cmax, bbox[3]))


def get_bbox_iou(b1, b2):
    h_iou = _segment_iou(b1[:2], b2[:2])
    w_iou = _segment_iou(b1[2:4], b2[2:4])
    return h_iou * w_iou


def _segment_iou(s1, s2):
    a = max(s1[0], s2[0])
    b = min(s1[1], s2[1])
    inter = max(b - a + 1, 0)
    union = (s1[1] - s1[0] + 1) + (s2[1] - s2[0] + 1) - inter
    return inter / union


_torch_interp = None


def _resize_chw(image, h, w):
    """align_corners=True bilinear resize of [1, C, H, W] numpy, computed ON
    HOST (same fp32 formula as ops.resize.bilinear_resize_align_corners).
    The predictor's transform cascade calls this 3x per click; routing it
    through the device costs a ~100 ms D2H sync per call over the TPU
    tunnel (measured: warm click latency 747 ms -> ~80 ms after making the
    cascade host-side). Fast path: torch's C++ bilinear kernel — the exact
    operator the reference calls — at ~5 ms/call where the numpy gather
    formulation costs ~69 ms (cProfile round 3: 4 calls/click = 275 ms of
    the 630 ms warm click median). numpy fallback keeps torch optional."""
    x = np.asarray(image, np.float32)
    in_h, in_w = x.shape[-2], x.shape[-1]
    if in_h == h and in_w == w:
        return x

    global _torch_interp
    if _torch_interp is None:
        try:
            import torch
            import torch.nn.functional as tF

            def _torch_interp(arr, hh, ww):
                with torch.no_grad():
                    t = torch.from_numpy(np.ascontiguousarray(arr))
                    return tF.interpolate(t, size=(hh, ww), mode="bilinear",
                                          align_corners=True).numpy()
        except Exception:
            _torch_interp = False
    if _torch_interp:
        return _torch_interp(x, h, w)

    def coords(n_in, n_out):
        if n_out == 1 or n_in == 1:
            return np.zeros((n_out,), np.float32)
        return np.arange(n_out, dtype=np.float32) * ((n_in - 1) / (n_out - 1))

    ys, xs = coords(in_h, h), coords(in_w, w)
    y0 = np.clip(np.floor(ys).astype(np.int32), 0, in_h - 1)
    y1 = np.clip(y0 + 1, 0, in_h - 1)
    x0 = np.clip(np.floor(xs).astype(np.int32), 0, in_w - 1)
    x1 = np.clip(x0 + 1, 0, in_w - 1)
    wy = (ys - y0).astype(np.float32)[:, None]
    wx = (xs - x0).astype(np.float32)[None, :]
    v00 = x[..., y0[:, None], x0[None, :]]
    v01 = x[..., y0[:, None], x1[None, :]]
    v10 = x[..., y1[:, None], x0[None, :]]
    v11 = x[..., y1[:, None], x1[None, :]]
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


# --------------------------------------------------------------- transforms

class BaseTransform:
    def __init__(self):
        self.image_changed = False

    def transform(self, image_nd, clicks_lists):
        raise NotImplementedError

    def inv_transform(self, prob_map):
        raise NotImplementedError

    def reset(self):
        pass

    def get_state(self):
        return None

    def set_state(self, state):
        pass


class SigmoidForPred(BaseTransform):
    def transform(self, image_nd, clicks_lists):
        return image_nd, clicks_lists

    def inv_transform(self, prob_map):
        # numerically-safe two-branch sigmoid: np.exp(-x) overflows for
        # large-magnitude negative logits (RuntimeWarning on every click)
        pos = prob_map >= 0
        ex = np.exp(np.where(pos, -prob_map, prob_map))
        return np.where(pos, 1.0 / (1.0 + ex), ex / (1.0 + ex))


class AddHorizontalFlip(BaseTransform):
    def transform(self, image_nd, clicks_lists):
        image_nd = np.concatenate([image_nd, image_nd[:, :, :, ::-1]], axis=0)
        w = image_nd.shape[3]
        flipped = [[c.copy(coords=(c.coords[0], w - c.coords[1] - 1))
                    for c in cl] for cl in clicks_lists]
        return image_nd, clicks_lists + flipped

    def inv_transform(self, prob_map):
        assert prob_map.shape[0] % 2 == 0
        n = prob_map.shape[0] // 2
        return 0.5 * (prob_map[:n] + prob_map[n:, :, :, ::-1])


class ZoomIn(BaseTransform):
    """(zoom_in.py:9-175)"""

    def __init__(self, target_size=400, skip_clicks=1, expansion_ratio=1.4,
                 min_crop_size=200, recompute_thresh_iou=0.5, prob_thresh=0.50):
        super().__init__()
        self.target_size = target_size
        self.min_crop_size = min_crop_size
        self.skip_clicks = skip_clicks
        self.expansion_ratio = expansion_ratio
        self.recompute_thresh_iou = recompute_thresh_iou
        self.prob_thresh = prob_thresh
        self.reset()

    def reset(self):
        self._input_image_shape = None
        self._prev_probs = None
        self._object_roi = None
        self._roi_image = None
        self.image_changed = False

    def transform(self, image_nd, clicks_lists):
        assert image_nd.shape[0] == 1 and len(clicks_lists) == 1
        self.image_changed = False
        clicks_list = clicks_lists[0]
        if len(clicks_list) <= self.skip_clicks:
            return image_nd, clicks_lists
        self._input_image_shape = image_nd.shape

        current_object_roi = None
        if self._prev_probs is not None:
            current_pred_mask = (self._prev_probs > self.prob_thresh)[0, 0]
            if current_pred_mask.sum() > 0:
                current_object_roi = get_object_roi(
                    current_pred_mask, clicks_list, self.expansion_ratio,
                    self.min_crop_size)
        if current_object_roi is None:
            if self.skip_clicks >= 0:
                return image_nd, clicks_lists
            current_object_roi = (0, image_nd.shape[2] - 1, 0,
                                  image_nd.shape[3] - 1)

        update = (self._object_roi is None
                  or not check_object_roi(self._object_roi, clicks_list)
                  or get_bbox_iou(current_object_roi,
                                  self._object_roi) < self.recompute_thresh_iou)
        if update:
            self._object_roi = current_object_roi
            self.image_changed = True
        self._roi_image = get_roi_image_nd(image_nd, self._object_roi,
                                           self.target_size)
        return self._roi_image, [self._transform_clicks(clicks_list)]

    def inv_transform(self, prob_map):
        if self._object_roi is None:
            self._prev_probs = np.asarray(prob_map)
            return prob_map
        assert prob_map.shape[0] == 1
        rmin, rmax, cmin, cmax = self._object_roi
        prob_map = _resize_chw(prob_map, rmax - rmin + 1, cmax - cmin + 1)
        if self._prev_probs is not None:
            new_prob_map = np.zeros_like(self._prev_probs)
            new_prob_map[:, :, rmin:rmax + 1, cmin:cmax + 1] = prob_map
        else:
            new_prob_map = prob_map
        self._prev_probs = new_prob_map
        return new_prob_map

    def check_possible_recalculation(self):
        if (self._prev_probs is None or self._object_roi is not None
                or self.skip_clicks > 0):
            return False
        pred_mask = (self._prev_probs > self.prob_thresh)[0, 0]
        if pred_mask.sum() > 0:
            roi = get_object_roi(pred_mask, [], self.expansion_ratio,
                                 self.min_crop_size)
            image_roi = (0, self._input_image_shape[2] - 1, 0,
                         self._input_image_shape[3] - 1)
            if get_bbox_iou(roi, image_roi) < 0.50:
                return True
        return False

    def get_state(self):
        return (self._input_image_shape, self._object_roi, self._prev_probs,
                self._roi_image, self.image_changed)

    def set_state(self, state):
        (self._input_image_shape, self._object_roi, self._prev_probs,
         self._roi_image, self.image_changed) = state

    def _transform_clicks(self, clicks_list):
        if self._object_roi is None:
            return clicks_list
        rmin, rmax, cmin, cmax = self._object_roi
        ch, cw = self._roi_image.shape[2:]
        out = []
        for click in clicks_list:
            nr = ch * (click.coords[0] - rmin) / (rmax - rmin + 1)
            nc = cw * (click.coords[1] - cmin) / (cmax - cmin + 1)
            out.append(click.copy(coords=(nr, nc)))
        return out


class LimitLongestSide(ZoomIn):
    """(limit_longest_side.py)"""

    def __init__(self, max_size=800):
        super().__init__(target_size=max_size, skip_clicks=0)

    def transform(self, image_nd, clicks_lists):
        assert image_nd.shape[0] == 1 and len(clicks_lists) == 1
        self.image_changed = False
        if max(image_nd.shape[2:4]) <= self.target_size:
            return image_nd, clicks_lists
        self._input_image_shape = image_nd.shape
        self._object_roi = (0, image_nd.shape[2] - 1, 0, image_nd.shape[3] - 1)
        self._roi_image = get_roi_image_nd(image_nd, self._object_roi,
                                           self.target_size)
        self.image_changed = True
        return self._roi_image, [self._transform_clicks(clicks_lists[0])]


def get_object_roi(pred_mask, clicks_list, expansion_ratio, min_crop_size):
    pred_mask = pred_mask.copy()
    for click in clicks_list:
        if click.is_positive:
            pred_mask[int(click.coords[0]), int(click.coords[1])] = 1
    bbox = get_bbox_from_mask(pred_mask)
    bbox = expand_bbox(bbox, expansion_ratio, min_crop_size)
    h, w = pred_mask.shape
    return clamp_bbox(bbox, 0, h - 1, 0, w - 1)


def get_roi_image_nd(image_nd, object_roi, target_size):
    rmin, rmax, cmin, cmax = object_roi
    height = rmax - rmin + 1
    width = cmax - cmin + 1
    if isinstance(target_size, tuple):
        nh, nw = target_size
    else:
        scale = target_size / max(height, width)
        nh, nw = int(round(height * scale)), int(round(width * scale))
    roi = image_nd[:, :, rmin:rmax + 1, cmin:cmax + 1]
    return _resize_chw(roi, nh, nw)


def check_object_roi(object_roi, clicks_list):
    for click in clicks_list:
        if click.is_positive:
            if not (object_roi[0] <= click.coords[0] < object_roi[1]):
                return False
            if not (object_roi[2] <= click.coords[1] < object_roi[3]):
                return False
    return True


# ---------------------------------------------------------------- predictor

class Predictor:
    """(predictors/base.py:7-133). NoBRS mode; images numpy [1, C, H, W]."""

    def __init__(self, model, variables, *, net_clicks_limit=None,
                 with_flip=False, zoom_in: Optional[ZoomIn] = None,
                 max_size=None):
        import jax

        self.net_clicks_limit = net_clicks_limit
        self.with_flip = with_flip
        self.zoom_in = zoom_in
        self.original_image = None
        self.prev_prediction = None
        self.model = model
        self.variables = variables
        self.with_prev_mask = getattr(model, "with_prev_mask", True)

        self._apply = cached_jit((id(model), "apply"), model,
                                 lambda: jax.jit(model.apply))
        # fetch stride-4 logits and upsample on host when the model supports
        # it (HRNet): ~16x less D2H per click; _resize_chw is bit-identical
        # to the in-model align-corners upsample
        has_low = hasattr(type(model), "low_res_instances")

        def build_low():
            import jax.numpy as jnp

            def _fwd(variables, rgb, mask, pts):
                img = rgb if mask is None else jnp.concatenate([rgb, mask], -1)
                return model.apply(variables, img, pts,
                                   method="low_res_instances")

            return jax.jit(_fwd)

        def build_low_flip():
            import jax.numpy as jnp

            def _fwd_flip(variables, rgb, mask, pts, w):
                # reconstruct the horizontally-flipped batch member ON DEVICE
                # (halves the per-click H2D upload, the dominant latency term
                # over a TPU tunnel). Exact: content occupies cols [0, w) of
                # the zero-padded canvas; full-width reverse puts it at
                # [wp-w, wp) and the roll realigns it to [0, w) — identical
                # values to the host flip-then-pad, zeros elsewhere.
                img1 = rgb if mask is None else jnp.concatenate([rgb, mask], -1)
                rev = img1[:, :, ::-1, :]
                img2 = jnp.roll(rev, w - img1.shape[2], axis=2)
                img = jnp.concatenate([img1, img2], axis=0)
                return model.apply(variables, img, pts,
                                   method="low_res_instances")

            return jax.jit(_fwd_flip)

        self._apply_low = (cached_jit((id(model), "low"), model, build_low)
                           if has_low else None)
        self._apply_low_flip = (cached_jit((id(model), "low_flip"), model,
                                           build_low_flip) if has_low else None)
        # device-resident RGB crop cache: the 3 static image channels upload
        # once per ROI change; per click only prev-mask + points move H2D
        self._rgb_dev = None
        self._rgb_tag = None
        self._transforms_changed = True

        self.transforms: List[BaseTransform] = []
        if zoom_in is not None:
            self.transforms.append(zoom_in)
        if max_size is not None:
            self.transforms.append(LimitLongestSide(max_size=max_size))
        self.transforms.append(SigmoidForPred())
        if with_flip:
            self.transforms.append(AddHorizontalFlip())

    def set_input_image(self, image: np.ndarray):
        """image: [C, H, W] or [1, C, H, W] float 0..1."""
        for t in self.transforms:
            t.reset()
        if image.ndim == 3:
            image = image[None]
        self.original_image = np.asarray(image, np.float32)
        self.prev_prediction = np.zeros_like(self.original_image[:, :1])
        self._rgb_dev = None
        self._rgb_tag = None
        self._transforms_changed = True

    def get_prediction(self, clicker: Clicker, prev_mask=None) -> np.ndarray:
        clicks_list = clicker.get_clicks()
        input_image = self.original_image
        if prev_mask is None:
            prev_mask = self.prev_prediction
        else:
            prev_mask = np.asarray(prev_mask, np.float32)
            if prev_mask.ndim == 2:
                prev_mask = prev_mask[None, None]
        if self.with_prev_mask:
            input_image = np.concatenate([input_image, prev_mask], axis=1)

        image_nd, clicks_lists, changed = self._apply_transforms(
            input_image, [clicks_list])
        self._transforms_changed = changed
        points_nd = self._get_points_nd(clicks_lists)
        pred_logits = self._run_model(image_nd, points_nd,
                                      clicks_lists=clicks_lists)

        prediction = _resize_chw(pred_logits, image_nd.shape[2], image_nd.shape[3])
        for t in reversed(self.transforms):
            prediction = t.inv_transform(prediction)

        if self.zoom_in is not None and self.zoom_in.check_possible_recalculation():
            return self.get_prediction(clicker)

        self.prev_prediction = prediction
        return prediction

    def _split_upload(self, image_nd, hp, wp):
        """Pad + NHWC-ify and move to device, splitting static RGB channels
        (uploaded once per ROI change — cached on device) from the per-click
        prev-mask channel. Returns (rgb_dev [b,hp,wp,3], mask_dev or None)."""
        import jax.numpy as jnp

        b, c, h, w = image_nd.shape
        tag = (b, c, h, w, hp, wp)
        if (self._rgb_dev is None or self._rgb_tag != tag
                or self._transforms_changed):
            rgb = np.zeros((b, hp, wp, 3), np.float32)
            rgb[:, :h, :w] = np.transpose(image_nd[:, :3], (0, 2, 3, 1))
            self._rgb_dev = jnp.asarray(rgb)
            self._rgb_tag = tag
            self._transforms_changed = False
        if c == 3:
            return self._rgb_dev, None
        m = np.zeros((b, hp, wp, c - 3), np.float32)
        m[:, :h, :w] = np.transpose(image_nd[:, 3:], (0, 2, 3, 1))
        return self._rgb_dev, jnp.asarray(m)

    @staticmethod
    def _pad_points(points_nd):
        """Pad clicks to powers of two so click count doesn't multiply the
        compiled-shape set."""
        b = points_nd.shape[0]
        k = points_nd.shape[1] // 2
        kp = max(1, 1 << (k - 1).bit_length())
        pts = np.full((b, 2 * kp, 3), -1.0, np.float32)
        pts[:, :k] = points_nd[:, :k]
        pts[:, kp:kp + k] = points_nd[:, k:]
        return pts

    def _run_model(self, image_nd, points_nd, clicks_lists=None) -> np.ndarray:
        """Pad image to PAD_MULTIPLE buckets and clicks to powers of two so
        the jit sees a handful of shapes; crop the logits back. clicks_lists
        is used by the f-BRS subclass."""
        b, c, h, w = image_nd.shape
        hp, wp = pad_hw(h, w)
        pts = self._pad_points(points_nd)

        if self._apply_low is not None:
            if b == 2 and self.with_flip and self._apply_low_flip is not None:
                # batch member 1 is the horizontal flip (AddHorizontalFlip is
                # the last transform) — rebuild it on device, upload only
                # member 0's mask channel (RGB is device-cached)
                rgb, mask = self._split_upload(image_nd[:1], hp, wp)
                low = self._apply_low_flip(self.variables, rgb, mask, pts,
                                           np.int32(w))
            else:
                rgb, mask = self._split_upload(image_nd, hp, wp)
                low = self._apply_low(self.variables, rgb, mask, pts)
            low = np.transpose(np.asarray(low), (0, 3, 1, 2))  # [B,1,Hp/4,Wp/4]
            inst = _resize_chw(low, hp, wp)          # host upsample (exact)
            return inst[:, :, :h, :w]
        img = np.zeros((b, hp, wp, c), np.float32)
        img[:, :h, :w] = np.transpose(image_nd, (0, 2, 3, 1))
        out = self._apply(self.variables, img, pts)
        inst = np.asarray(out["instances"])  # [B, Hp, Wp, 1]
        return np.transpose(inst, (0, 3, 1, 2))[:, :, :h, :w]

    def _apply_transforms(self, image_nd, clicks_lists):
        changed = False
        for t in self.transforms:
            image_nd, clicks_lists = t.transform(image_nd, clicks_lists)
            changed |= t.image_changed
        return image_nd, clicks_lists, changed

    def _get_points_nd(self, clicks_lists) -> np.ndarray:
        total_clicks = []
        num_pos = [sum(c.is_positive for c in cl) for cl in clicks_lists]
        num_neg = [len(cl) - p for cl, p in zip(clicks_lists, num_pos)]
        num_max = max(num_pos + num_neg)
        if self.net_clicks_limit is not None:
            num_max = min(self.net_clicks_limit, num_max)
        num_max = max(1, num_max)
        for cl in clicks_lists:
            cl = cl[:self.net_clicks_limit]
            pos = [c.coords_and_indx for c in cl if c.is_positive]
            pos = pos + (num_max - len(pos)) * [(-1, -1, -1)]
            neg = [c.coords_and_indx for c in cl if not c.is_positive]
            neg = neg + (num_max - len(neg)) * [(-1, -1, -1)]
            total_clicks.append(pos[:num_max] + neg[:num_max])
        return np.asarray(total_clicks, np.float32)

    def get_states(self):
        return {"transform_states": [t.get_state() for t in self.transforms],
                "prev_prediction": self.prev_prediction.copy()}

    def set_states(self, states):
        for s, t in zip(states["transform_states"], self.transforms):
            t.set_state(s)
        self.prev_prediction = states["prev_prediction"]


def get_predictor(model, variables, brs_mode: str = "NoBRS", *,
                  prob_thresh=0.49, with_flip=True, zoom_in_params=None,
                  predictor_params=None, brs_opt_func_params=None,
                  lbfgs_params=None):
    """Predictor factory (gui/ritm/inference/predictors/__init__.py:8-108).
    brs_mode: 'NoBRS' | 'f-BRS-A' | 'f-BRS-B' | 'f-BRS-C' (HRNet feature
    insertion: A/B -> mode 'A', C -> mode 'C', like the reference's HRNetModel
    remap at __init__.py:68-74) | 'RGB-BRS' | 'DistMap-BRS' (input-bias
    optimization through the full forward)."""
    zoom_in = ZoomIn(**zoom_in_params) if zoom_in_params is not None else None
    params = {"with_flip": with_flip, "zoom_in": zoom_in}
    if predictor_params:
        params.update(predictor_params)

    if brs_mode == "NoBRS":
        return Predictor(model, variables, **params)
    if brs_mode.startswith("f-BRS"):
        from cutie_tpu.ritm.brs import HRNetFeatureBRSPredictor, ScaleBiasOptimizer
        params.setdefault("net_clicks_limit", 8)
        opt_functor = ScaleBiasOptimizer(
            optimizer_params=lbfgs_params, prob_thresh=prob_thresh,
            with_flip=with_flip, **(brs_opt_func_params or {}))
        insertion_mode = "C" if brs_mode == "f-BRS-C" else "A"
        return HRNetFeatureBRSPredictor(model, variables,
                                        opt_functor=opt_functor,
                                        insertion_mode=insertion_mode, **params)
    if brs_mode in ("RGB-BRS", "DistMap-BRS"):
        from cutie_tpu.ritm.brs import InputBRSPredictor, InputOptimizer
        params.setdefault("net_clicks_limit", 5)
        opt_functor = InputOptimizer(
            optimizer_params=lbfgs_params, prob_thresh=prob_thresh,
            with_flip=with_flip, **(brs_opt_func_params or {}))
        target = "dmaps" if brs_mode == "DistMap-BRS" else "rgb"
        return InputBRSPredictor(model, variables, opt_functor=opt_functor,
                                 optimize_target=target, **params)
    raise NotImplementedError(brs_mode)


# --------------------------------------------------------------- controller

class InteractiveController:
    """Click state machine with undo (gui/ritm/controller.py:12-110)."""

    def __init__(self, model, variables, predictor_params, prob_thresh=0.5):
        self.model = model
        self.variables = variables
        self.prob_thresh = prob_thresh
        self.clicker = Clicker()
        self.states = []
        self.probs_history = []
        self.object_count = 0
        self._result_mask = None
        self.image = None
        self.predictor = None
        self.predictor_params = predictor_params
        self.reset_predictor()

    def set_image(self, image: np.ndarray):
        """image: [C, H, W] float 0..1."""
        self.image = np.asarray(image, np.float32)
        self._result_mask = np.zeros(image.shape[-2:], np.uint8)
        self.object_count = 0
        self.reset_last_object()

    def add_click(self, x, y, is_positive, prev_mask=None):
        self.states.append({"clicker": self.clicker.get_state(),
                            "predictor": self.predictor.get_states()})
        self.clicker.add_click(Click(is_positive=is_positive, coords=(y, x)))
        pred = self.predictor.get_prediction(self.clicker, prev_mask=prev_mask)
        if self.probs_history:
            self.probs_history.append((self.probs_history[-1][0], pred))
        else:
            self.probs_history.append((np.zeros_like(pred), pred))
        return pred

    def undo_click(self):
        if not self.states:
            return
        prev = self.states.pop()
        self.clicker.set_state(prev["clicker"])
        self.predictor.set_states(prev["predictor"])
        self.probs_history.pop()

    def partially_finish_object(self):
        object_prob = self.current_object_prob
        if object_prob is None:
            return
        self.probs_history.append((object_prob, np.zeros_like(object_prob)))
        self.states.append(self.states[-1])
        self.clicker.reset_clicks()
        self.reset_predictor()

    def finish_object(self):
        object_prob = self.current_object_prob
        if object_prob is None:
            return
        self.object_count += 1
        self._result_mask[object_prob[0, 0] > self.prob_thresh] = self.object_count
        self.reset_last_object()

    def reset_last_object(self):
        self.states = []
        self.probs_history = []
        self.clicker.reset_clicks()
        self.reset_predictor()

    def reset_predictor(self, predictor_params=None):
        if predictor_params is not None:
            self.predictor_params = predictor_params
        params = dict(self.predictor_params)
        brs_mode = params.pop("brs_mode", "NoBRS")
        zoom_in_params = params.pop("zoom_in_params", None)
        inner = params.pop("predictor_params", None)
        brs_opt_func_params = params.pop("brs_opt_func_params", None)
        lbfgs_params = params.pop("lbfgs_params", None)
        self.predictor = get_predictor(
            self.model, self.variables, brs_mode,
            prob_thresh=params.pop("prob_thresh", 0.49),
            with_flip=params.pop("with_flip", True),
            zoom_in_params=zoom_in_params,
            predictor_params={**params, **(inner or {})},
            brs_opt_func_params=brs_opt_func_params,
            lbfgs_params=lbfgs_params)
        if self.image is not None:
            self.predictor.set_input_image(self.image)

    @property
    def current_object_prob(self):
        if self.probs_history:
            total, additive = self.probs_history[-1]
            return np.maximum(total, additive)
        return None

    @property
    def is_incomplete_mask(self):
        return len(self.probs_history) > 0

    @property
    def result_mask(self):
        return self._result_mask.copy()
