"""f-BRS: online scale/bias optimization for click consistency.

Behavioral parity targets: reference
gui/ritm/inference/predictors/{brs,brs_functors,brs_losses}.py —
HRNetFeatureBRSPredictor (insertion mode 'A': scale/bias on the aggregated
HRNet features before the OCR heads), ScaleBiasOptimizer driven by scipy
fmin_l_bfgs_b (maxfun 20), BRSMaskLoss (squared click-consistency error),
early termination on satisfied clicks or converged IoU.

The loss+gradient evaluation is one jitted jax.value_and_grad call over the
cached backbone features; scipy L-BFGS runs on host.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from scipy.optimize import fmin_l_bfgs_b

from cutie_tpu.ritm.inference import Clicker, Predictor

DEFAULT_LBFGS_PARAMS = {"m": 20, "factr": 0, "pgtol": 1e-8, "maxfun": 20,
                        "maxiter": 40}


class ScaleBiasOptimizer:
    """(brs_functors.py BaseOptimizer + ScaleBiasOptimizer)."""

    def __init__(self, optimizer_params=None, prob_thresh=0.49, reg_weight=1e-3,
                 min_iou_diff=0.01, with_flip=False, flip_average=False,
                 scale_act: Optional[str] = None, reg_bias_weight=10.0):
        self.optimizer_params = dict(DEFAULT_LBFGS_PARAMS)
        if optimizer_params:
            self.optimizer_params.update(optimizer_params)
        self.prob_thresh = prob_thresh
        self.reg_weight = reg_weight
        self.min_iou_diff = min_iou_diff
        self.with_flip = with_flip
        self.flip_average = flip_average
        self.scale_act = scale_act
        self.reg_bias_weight = reg_bias_weight
        self.best_prediction = None
        self._eval = None
        self._best_loss = None
        self._last_mask = None

    def init_click(self, eval_fn):
        """eval_fn(x_flat) -> (loss, grad, logits, f_max_pos, f_max_neg)."""
        self.best_prediction = None
        self._eval = eval_fn
        self._best_loss = None
        self._last_mask = None

    def __call__(self, x):
        loss, grad, logits, f_max_pos, f_max_neg = self._eval(x)
        f_val = float(loss)
        if self.best_prediction is None or f_val < self._best_loss:
            self.best_prediction = np.asarray(logits)
            self._best_loss = f_val

        # clicks already satisfied -> zero gradient stops L-BFGS
        if (float(f_max_pos) < (1 - self.prob_thresh)
                and float(f_max_neg) < self.prob_thresh):
            return [f_val, np.zeros_like(x)]

        current_mask = np.asarray(logits) > 0  # logit>0 == prob>0.5
        if self._last_mask is not None and self.min_iou_diff > 0:
            inter = np.logical_and(current_mask, self._last_mask).sum()
            union = np.logical_or(current_mask, self._last_mask).sum()
            if union > 0 and inter / union > 1 - self.min_iou_diff:
                return [f_val, np.zeros_like(x)]
        self._last_mask = current_mask

        return [f_val, np.asarray(grad, np.float64)]

    def unpack_scale_bias(self, x: jnp.ndarray, bs: int):
        scale, bias = jnp.split(x, 2)
        reg = self.reg_weight * (jnp.sum(scale ** 2)
                                 + self.reg_bias_weight * jnp.sum(bias ** 2))
        if self.scale_act == "tanh":
            scale = jnp.tanh(scale)
        elif self.scale_act == "sin":
            scale = jnp.sin(scale)
        return 1 + scale.reshape(bs, 1, 1, -1), bias.reshape(bs, 1, 1, -1), reg


def brs_mask_loss(result, pos_mask, neg_mask, eps=1e-5):
    """(brs_losses.py BRSMaskLoss). result/masks: [B, H, W]."""
    pos_diff = (1 - result) * pos_mask
    pos_target = jnp.sum(pos_diff ** 2) / (jnp.sum(pos_mask) + eps)
    neg_diff = result * neg_mask
    neg_target = jnp.sum(neg_diff ** 2) / (jnp.sum(neg_mask) + eps)
    loss = pos_target + neg_target
    return loss, jnp.max(jnp.abs(pos_diff)), jnp.max(jnp.abs(neg_diff))


def device_lbfgs_drive(objective, x0, *, maxfun, thresh, min_iou_diff):
    """The WHOLE BRS optimization as one traced graph: optax L-BFGS (zoom
    linesearch, memory 20 like the reference's scipy m=20) under a
    lax.while_loop carrying the reference driver's early exits — clicks
    satisfied (brs_functors.py zero-grad stop), IoU-converged (min_iou_diff),
    maxfun budget — and best-loss tracking.

    objective(x) -> (loss_plus_reg, (track, mask, f_max_pos, f_max_neg)):
    `track` is the tensor returned for the best-loss iterate (the predictors
    pass the LOW-RES head logits — the host upsamples them bit-identically,
    cutting the per-click D2H fetch ~16x vs full-resolution logits); `mask`
    is the full-res boolean prediction driving the IoU exit (reference
    brs_functors.py:46-66 computes IoU on the full-res thresholded mask).
    Returns (x_final, best_track, n_iterations).

    The scipy host loop this replaces costs one tunnel round-trip PLUS a
    multi-MB logits fetch per function evaluation (<=maxfun per click): the
    round-2 bench measured 611 ms/click of almost pure host<->device
    ping-pong. One fused dispatch brings the warm click under the interactive
    budget; the optimization endpoint matches the host path (same objective,
    same exits) without being trajectory-identical (zoom vs scipy's
    More-Thuente-style linesearch).

    Budget semantics: scipy's maxfun caps FUNCTION EVALUATIONS, not
    iterations. The zoom linesearch evaluates value+grad once per
    linesearch step, so this loop accumulates `num_linesearch_steps` from
    the linesearch state and stops once `maxfun` evaluations are spent —
    an iteration-count cap would quietly run 2-3x the reference's
    optimization budget (and 2-3x its latency; observed 476 ms/click
    before this fix, round 3).
    """
    import optax

    loss_only = lambda x: objective(x)[0]  # noqa: E731
    opt = optax.lbfgs(
        memory_size=20,
        linesearch=optax.scale_by_zoom_linesearch(max_linesearch_steps=8))
    value_and_grad = optax.value_and_grad_from_state(loss_only)

    def ls_steps(st):
        """Evaluations the zoom linesearch spent in this update."""
        for s in st:
            info = getattr(s, "info", None)
            if info is not None and hasattr(info, "num_linesearch_steps"):
                return info.num_linesearch_steps
        return jnp.asarray(1, jnp.int32)  # unknown optax layout: count 1

    loss0, (track0, mask0, fmp0, fmn0) = objective(x0)
    clicks_ok0 = (fmp0 < (1 - thresh)) & (fmn0 < thresh)

    def cond(c):
        x, st, best_loss, best_track, last_mask, evals, done = c
        return (~done) & (evals < maxfun)

    def body(c):
        x, st, best_loss, best_track, last_mask, evals, _ = c
        value, grad = value_and_grad(x, state=st)
        updates, st = opt.update(grad, st, x, value=value, grad=grad,
                                 value_fn=loss_only)
        x = optax.apply_updates(x, updates)
        loss, (track, mask, fmp, fmn) = objective(x)
        better = loss < best_loss
        best_loss = jnp.where(better, loss, best_loss)
        best_track = jnp.where(better, track, best_track)
        # reference exits (brs_functors.py:46-66): satisfied clicks, or
        # prediction mask converged within min_iou_diff
        clicks_ok = (fmp < (1 - thresh)) & (fmn < thresh)
        inter = jnp.sum(mask & last_mask)
        union = jnp.sum(mask | last_mask)
        iou_ok = (union > 0) & (inter / jnp.maximum(union, 1)
                                > 1 - min_iou_diff)
        done = clicks_ok | (iou_ok if min_iou_diff > 0 else False)
        return (x, st, best_loss, best_track, mask,
                evals + jnp.maximum(ls_steps(st), 1), done)

    init = (x0, opt.init(x0), loss0, track0, mask0,
            jnp.asarray(0, jnp.int32), clicks_ok0)
    x, _, _, best_track, _, n_evals, _ = jax.lax.while_loop(cond, body, init)
    return x, best_track, n_evals


def click_maps_from_points(pts, h, w, radius: int = 1):
    """Build the BRS click-consistency maps ON DEVICE from the (tiny, already
    uploaded) padded points array instead of uploading two full-resolution
    masks per click (~4 MB H2D at 480p over the TPU tunnel).

    pts: [b, 2k, 3] — positive block then negative block, -1-padded (the
    predictor's _pad_points layout). Exact match to the host _clicks_maps:
    a pixel is set iff |row - round(y)| <= radius and |col - round(x)| <=
    radius (host's clamped y1:y+radius+1 slice is the same intersection
    with the image bounds)."""
    k = pts.shape[1] // 2
    rows = jnp.arange(h, dtype=jnp.float32)
    cols = jnp.arange(w, dtype=jnp.float32)

    def block(p):  # [b, k, 3] -> [b, h, w]
        y = jnp.round(p[..., 0])[:, :, None]
        x = jnp.round(p[..., 1])[:, :, None]
        valid = (p[..., 0] >= 0)[:, :, None]
        ry = ((jnp.abs(rows[None, None, :] - y) <= radius) & valid)
        rx = (jnp.abs(cols[None, None, :] - x) <= radius)
        m = jnp.einsum("bkh,bkw->bhw", ry.astype(jnp.float32),
                       rx.astype(jnp.float32))
        return jnp.minimum(m, 1.0)

    return block(pts[:, :k]), block(pts[:, k:])


def _functor_statics(f: "ScaleBiasOptimizer"):
    """The functor fields that change compiled behavior — part of the jit
    cache key so a predictor rebuilt with different BRS params can't reuse a
    stale graph."""
    return (type(f).__name__, f.prob_thresh, f.reg_weight, f.reg_bias_weight,
            f.min_iou_diff, f.with_flip, f.flip_average, f.scale_act)


class HRNetFeatureBRSPredictor(Predictor):
    """(brs.py:157-252). insertion_mode 'A' = scale/bias on the aggregated
    HRNet features before the OCR heads (f-BRS-A / f-BRS-B); 'C' = on the
    OCR-refined features before cls_head (f-BRS-C). NoBRS falls back
    automatically when no optimization is needed (first click)."""

    def __init__(self, model, variables, *, opt_functor: ScaleBiasOptimizer,
                 optimize_after_n_clicks=1, insertion_mode: str = "A",
                 host_lbfgs: bool = False, **kwargs):
        super().__init__(model, variables, **kwargs)
        self.opt_functor = opt_functor
        self.optimize_after_n_clicks = optimize_after_n_clicks
        self.insertion_mode = insertion_mode
        # False (default): whole optimization fused on device (one dispatch
        # per click). True: reference-trajectory scipy loop (one device
        # round-trip per L-BFGS evaluation) — for parity testing.
        self.host_lbfgs = host_lbfgs
        if insertion_mode == "A":
            self.num_channels = sum(k * model.width for k in (1, 2, 4, 8))
        elif insertion_mode == "C":
            self.num_channels = 2 * model.ocr_width
        else:
            raise NotImplementedError(insertion_mode)
        self.opt_data = None
        self.input_data = None

        from cutie_tpu.ritm.inference import cached_jit
        functor = opt_functor
        with_flip = self.with_flip
        fkey = _functor_statics(functor)

        def build_head_input():
            return jax.jit(functools.partial(
                model.apply, method="get_head_input",
                insertion_mode=insertion_mode))

        def build_head_input_flip():
            def _head_input_flip(variables, rgb, mask, pts, w):
                # reconstruct the horizontally-flipped batch member ON DEVICE
                # (same exactness argument as Predictor._fwd_flip: content
                # occupies cols [0, w) of the zero-padded canvas; reverse+
                # roll realigns it) — with the predictor's RGB device cache,
                # per-click H2D is just the prev-mask channel + points
                img1 = rgb if mask is None else jnp.concatenate([rgb, mask], -1)
                rev = img1[:, :, ::-1, :]
                img2 = jnp.roll(rev, w - img1.shape[2], axis=2)
                img = jnp.concatenate([img1, img2], axis=0)
                return model.apply(variables, img, pts,
                                   method="get_head_input",
                                   insertion_mode=insertion_mode)

            return jax.jit(_head_input_flip)

        def _objective_from(variables, feats, pos, neg, out_h, out_w, bs):
            """Shared f-BRS objective (reference brs_functors ScaleBias +
            BRSMaskLoss over the head rerun): returns loss + aux for
            device_lbfgs_drive."""
            from cutie_tpu.ops.resize import bilinear_resize_align_corners_mm

            def objective(x):
                scale, bias, reg = functor.unpack_scale_bias(x, bs)
                if with_flip:
                    scale = jnp.concatenate([scale, scale], axis=0)
                    bias = jnp.concatenate([bias, bias], axis=0)
                mod = feats * scale + bias
                low = model.apply(variables, mod,
                                  insertion_mode=insertion_mode,
                                  method="head_from_feats_low")
                # matmul-VJP resize: differentiated every L-BFGS eval (scatter-free)
                logits = bilinear_resize_align_corners_mm(low, out_h, out_w)[..., 0]
                result = jax.nn.sigmoid(logits)
                pm, nm = pos, neg
                if with_flip and functor.flip_average:
                    n = result.shape[0] // 2
                    result = 0.5 * (result[:n] + result[n:, :, ::-1])
                    pm, nm = pm[:n], nm[:n]
                loss, fmp, fmn = brs_mask_loss(result, pm, nm)
                return loss + reg, (low[..., 0], logits > 0, fmp, fmn)

            return objective

        def build_loss_grad():
            def fn(variables, feats, pos, neg, x, *, out_h, out_w, bs):
                objective = _objective_from(variables, feats, pos, neg,
                                            out_h, out_w, bs)

                def total(xf):
                    loss, (low, _mask, fmp, fmn) = objective(xf)
                    return loss, (low, fmp, fmn)

                (loss, (low, fmp, fmn)), grad = jax.value_and_grad(
                    total, has_aux=True)(x)
                return loss, grad, low, fmp, fmn

            return jax.jit(fn, static_argnames=("out_h", "out_w", "bs"))

        def build_device_brs():
            def fn(variables, feats, map_pts, x0, *, out_h, out_w, bs, maxfun):
                pos, neg = click_maps_from_points(map_pts, out_h, out_w)
                objective = _objective_from(variables, feats, pos, neg,
                                            out_h, out_w, bs)
                return device_lbfgs_drive(
                    objective, x0, maxfun=maxfun, thresh=functor.prob_thresh,
                    min_iou_diff=functor.min_iou_diff)

            return jax.jit(fn, static_argnames=("out_h", "out_w", "bs",
                                                "maxfun"))

        def build_head_low():
            def fn(variables, feats, x, *, bs):
                scale, bias, _reg = functor.unpack_scale_bias(x, bs)
                if with_flip:
                    scale = jnp.concatenate([scale, scale], axis=0)
                    bias = jnp.concatenate([bias, bias], axis=0)
                return model.apply(variables, feats * scale + bias,
                                   insertion_mode=insertion_mode,
                                   method="head_from_feats_low")

            return jax.jit(fn, static_argnames=("bs",))

        mk = (id(model), insertion_mode)
        self._head_input = cached_jit(mk + ("head_input",), model,
                                      build_head_input)
        self._head_input_flip = cached_jit(mk + ("head_input_flip",), model,
                                           build_head_input_flip)
        self._loss_grad = cached_jit(mk + ("brs_loss_grad", with_flip, fkey),
                                     model, build_loss_grad)
        self._device_brs = cached_jit(mk + ("device_brs", with_flip, fkey),
                                      model, build_device_brs)
        self._head_low = cached_jit(mk + ("brs_head_low", with_flip, fkey),
                                    model, build_head_low)

    def set_input_image(self, image):
        super().set_input_image(image)
        self.opt_data = None
        self.input_data = None

    def get_states(self):
        states = super().get_states()
        states["opt_data"] = None if self.opt_data is None else self.opt_data.copy()
        return states

    def set_states(self, states):
        super().set_states(states)
        self.opt_data = states.get("opt_data")

    # ------------------------------------------------------------- brs core

    @staticmethod
    def _map_points(clicks_lists):
        """ALL clicks (no net_clicks_limit) as a [b, 2kp, 3] padded array for
        the on-device click-map builder — the BRS consistency maps cover every
        click (reference brs.py:23-43) even when the network input is
        limited."""
        b = len(clicks_lists)
        k = max(1, max(len(cl) for cl in clicks_lists))
        kp = 1 << (k - 1).bit_length()
        pts = np.full((b, 2 * kp, 3), -1.0, np.float32)
        for i, cl in enumerate(clicks_lists):
            pi = ni = 0
            for c in cl:
                if c.is_positive:
                    pts[i, pi, :2] = c.coords
                    pts[i, pi, 2] = 0
                    pi += 1
                else:
                    pts[i, kp + ni, :2] = c.coords
                    pts[i, kp + ni, 2] = 0
                    ni += 1
        return pts

    def _clicks_maps(self, clicks_lists, h, w, radius=1):
        """(brs.py:23-43)"""
        n = len(clicks_lists)
        pos = np.zeros((n, h, w), np.float32)
        neg = np.zeros((n, h, w), np.float32)
        for li, clicks in enumerate(clicks_lists):
            for click in clicks:
                y, x = int(round(click.coords[0])), int(round(click.coords[1]))
                y1, x1 = max(0, y - radius), max(0, x - radius)
                tgt = pos if click.is_positive else neg
                tgt[li, y1:y + radius + 1, x1:x + radius + 1] = 1.0
        return pos, neg

    def _run_model(self, image_nd, points_nd, clicks_lists=None):
        from cutie_tpu.ritm.inference import _resize_chw, pad_hw

        if clicks_lists is None:
            return super()._run_model(image_nd, points_nd)
        num_clicks = len(clicks_lists[0])
        b, c, h, w = image_nd.shape
        bs = b // 2 if self.with_flip else b

        if (self.opt_data is None
                or self.opt_data.shape[0] != bs * 2 * self.num_channels):
            self.opt_data = np.zeros((bs * 2 * self.num_channels,), np.float32)

        hp, wp = pad_hw(h, w)
        pts = self._pad_points(points_nd)

        if (num_clicks <= (self.net_clicks_limit or 1 << 30)
                or self.input_data is None):
            if b == 2 and self.with_flip:
                # batch member 1 is the horizontal flip of member 0
                # (AddHorizontalFlip is the last transform): rebuild it on
                # device; with the RGB device cache only the prev-mask
                # channel + points upload per click
                rgb, mask = self._split_upload(image_nd[:1], hp, wp)
                self.input_data = self._head_input_flip(
                    self.variables, rgb, mask, pts, np.int32(w))
            else:
                img = np.zeros((b, hp, wp, c), np.float32)
                img[:, :h, :w] = np.transpose(image_nd, (0, 2, 3, 1))
                self.input_data = self._head_input(self.variables, img, pts)

        if num_clicks > self.optimize_after_n_clicks and not self.host_lbfgs:
            # fused path: click maps built on device from coords; best
            # logits come back LOW-RES and are upsampled on host
            maxfun = int(self.opt_functor.optimizer_params.get("maxfun", 20))
            x, best_low, _ = self._device_brs(
                self.variables, self.input_data,
                jnp.asarray(self._map_points(clicks_lists)),
                jnp.asarray(self.opt_data), out_h=hp, out_w=wp, bs=bs,
                maxfun=maxfun)
            # keep the opt vector DEVICE-RESIDENT: it only feeds the next
            # device call, and every D2H fetch costs a full tunnel round-trip
            # (cProfile round 3: 11 fetches = 1.4 s of the 6-click pass)
            self.opt_data = x
            low = np.asarray(best_low)[:, None]  # [B, 1, Hp/4, Wp/4]
            return _resize_chw(low, hp, wp)[:, :, :h, :w]

        if num_clicks > self.optimize_after_n_clicks:
            # reference-trajectory scipy loop (host_lbfgs=True parity path):
            # one device round-trip per L-BFGS evaluation
            pos_mask, neg_mask = self._clicks_maps(clicks_lists, h, w)
            pos_p = np.zeros((b, hp, wp), np.float32)
            neg_p = np.zeros((b, hp, wp), np.float32)
            pos_p[:, :h, :w] = pos_mask
            neg_p[:, :h, :w] = neg_mask
            # upload the click maps ONCE per click — inside eval_fn they
            # would re-upload on every L-BFGS evaluation (<= maxfun=20 times)
            pos_j, neg_j = jnp.asarray(pos_p), jnp.asarray(neg_p)

            def eval_fn(xv):
                loss, grad, low, fmp, fmn = self._loss_grad(
                    self.variables, self.input_data, pos_j, neg_j,
                    jnp.asarray(xv, jnp.float32), out_h=hp, out_w=wp, bs=bs)
                logits = _resize_chw(np.asarray(low)[:, None], hp, wp)[:, 0]
                return loss, grad, logits, fmp, fmn

            self.opt_functor.init_click(eval_fn)
            opt_result = fmin_l_bfgs_b(func=self.opt_functor,
                                       x0=np.asarray(self.opt_data, np.float64),
                                       **self.opt_functor.optimizer_params)
            self.opt_data = opt_result[0].astype(np.float32)
            if self.opt_functor.best_prediction is not None:
                # [B, Hp, Wp] -> [B, 1, H, W] (flip inverse happens in the
                # transform cascade like the reference)
                return self.opt_functor.best_prediction[:, None, :h, :w]

        # not optimizing (first click, or undo back below the threshold):
        # head with the current scale/bias (zeros after reset -> identity)
        low = self._head_low(self.variables, self.input_data,
                             jnp.asarray(self.opt_data), bs=bs)
        low = np.transpose(np.asarray(low), (0, 3, 1, 2))
        return _resize_chw(low, hp, wp)[:, :, :h, :w]


class InputOptimizer(ScaleBiasOptimizer):
    """(brs_functors.py:83-91): the opt vector IS an additive bias map; only
    the unpack/regularization differs from ScaleBias (the L-BFGS driver,
    click-satisfaction early-out, and IoU convergence are shared)."""

    def unpack_bias(self, x: jnp.ndarray, shape):
        bias = x.reshape(shape)  # [bs, H, W, C]
        reg = self.reg_weight * jnp.sum(bias ** 2)
        if self.with_flip:
            bias = jnp.concatenate([bias, bias[:, :, ::-1]], axis=0)
        return bias, reg


class InputBRSPredictor(Predictor):
    """(brs.py:257-317): optimizes an additive bias on the network INPUT —
    the normalized RGB planes ('rgb', RGB-BRS) or the click dist-map channels
    ('dmaps', DistMap-BRS) — through the full forward."""

    def __init__(self, model, variables, *, opt_functor: InputOptimizer,
                 optimize_after_n_clicks=1, optimize_target: str = "rgb",
                 host_lbfgs: bool = False, **kwargs):
        super().__init__(model, variables, **kwargs)
        self.opt_functor = opt_functor
        self.optimize_after_n_clicks = optimize_after_n_clicks
        self.optimize_target = optimize_target
        self.num_channels = 3 if optimize_target == "rgb" else 2
        # False (default): whole optimization fused on device (one dispatch
        # per click). True: reference-trajectory scipy loop — parity testing.
        self.host_lbfgs = host_lbfgs
        self.opt_data = None

        from cutie_tpu.ritm.inference import cached_jit
        functor = opt_functor
        with_flip = self.with_flip
        num_channels = self.num_channels
        target = optimize_target
        fkey = _functor_statics(functor)

        def _objective_from(variables, img, pts, pos, neg, out_h, out_w, bs):
            from cutie_tpu.ops.resize import bilinear_resize_align_corners_mm

            def objective(xf):
                bias, reg = functor.unpack_bias(
                    xf, (bs, out_h, out_w, num_channels))
                low = model.apply(variables, img, pts, bias, target=target,
                                  method="low_res_instances_with_input_bias")
                # matmul-VJP resize: differentiated every L-BFGS eval (scatter-free)
                logits = bilinear_resize_align_corners_mm(low, out_h, out_w)[..., 0]
                result = jax.nn.sigmoid(logits)
                pm, nm = pos, neg
                if with_flip and functor.flip_average:
                    n = result.shape[0] // 2
                    result = 0.5 * (result[:n] + result[n:, :, ::-1])
                    pm, nm = pm[:n], nm[:n]
                loss, fmp, fmn = brs_mask_loss(result, pm, nm)
                return loss + reg, (low[..., 0], logits > 0, fmp, fmn)

            return objective

        def build_loss_grad():
            def fn(variables, img, pts, pos, neg, x, *, out_h, out_w, bs):
                objective = _objective_from(variables, img, pts, pos, neg,
                                            out_h, out_w, bs)

                def total(xf):
                    loss, (low, _mask, fmp, fmn) = objective(xf)
                    return loss, (low, fmp, fmn)

                (loss, (low, fmp, fmn)), grad = jax.value_and_grad(
                    total, has_aux=True)(x)
                return loss, grad, low, fmp, fmn

            return jax.jit(fn, static_argnames=("out_h", "out_w", "bs"))

        def build_device_brs():
            def fn(variables, img, pts, map_pts, x0, *, out_h, out_w, bs,
                   maxfun):
                pos, neg = click_maps_from_points(map_pts, out_h, out_w)
                objective = _objective_from(variables, img, pts, pos, neg,
                                            out_h, out_w, bs)
                return device_lbfgs_drive(
                    objective, x0, maxfun=maxfun, thresh=functor.prob_thresh,
                    min_iou_diff=functor.min_iou_diff)

            return jax.jit(fn, static_argnames=("out_h", "out_w", "bs",
                                                "maxfun"))

        mk = (id(model), "input_brs", target, with_flip, fkey)
        self._loss_grad = cached_jit(mk + ("loss_grad",), model,
                                     build_loss_grad)
        self._device_brs = cached_jit(mk + ("device_brs",), model,
                                      build_device_brs)

    def set_input_image(self, image):
        super().set_input_image(image)
        self.opt_data = None

    def get_states(self):
        states = super().get_states()
        states["opt_data"] = None if self.opt_data is None else self.opt_data.copy()
        return states

    def set_states(self, states):
        super().set_states(states)
        self.opt_data = states.get("opt_data")

    _clicks_maps = HRNetFeatureBRSPredictor._clicks_maps
    _map_points = staticmethod(HRNetFeatureBRSPredictor._map_points)

    def _run_model(self, image_nd, points_nd, clicks_lists=None):
        from cutie_tpu.ritm.inference import _resize_chw, pad_hw

        if clicks_lists is None:
            return super()._run_model(image_nd, points_nd)
        num_clicks = len(clicks_lists[0])
        b, c, h, w = image_nd.shape
        bs = b // 2 if self.with_flip else b

        hp, wp = pad_hw(h, w)
        n_opt = bs * hp * wp * self.num_channels
        if self.opt_data is None or self.opt_data.shape[0] != n_opt:
            self.opt_data = np.zeros((n_opt,), np.float32)

        img = np.zeros((b, hp, wp, c), np.float32)
        img[:, :h, :w] = np.transpose(image_nd, (0, 2, 3, 1))
        pts = self._pad_points(points_nd)
        img_j, pts_j = jnp.asarray(img), jnp.asarray(pts)

        if num_clicks > self.optimize_after_n_clicks and not self.host_lbfgs:
            # fused path: one dispatch per click, low-res best-logits fetch
            maxfun = int(self.opt_functor.optimizer_params.get("maxfun", 20))
            x, best_low, _ = self._device_brs(
                self.variables, img_j, pts_j,
                jnp.asarray(self._map_points(clicks_lists)),
                jnp.asarray(self.opt_data), out_h=hp, out_w=wp, bs=bs,
                maxfun=maxfun)
            # device-resident opt vector (for RGB/DistMap-BRS it is a full
            # [bs*Hp*Wp*C] image — fetching it per click costs a multi-MB D2H)
            self.opt_data = x
            low = np.asarray(best_low)[:, None]
            return _resize_chw(low, hp, wp)[:, :, :h, :w]

        pos_mask, neg_mask = self._clicks_maps(clicks_lists, h, w)
        pos_p = np.zeros((b, hp, wp), np.float32)
        neg_p = np.zeros((b, hp, wp), np.float32)
        pos_p[:, :h, :w] = pos_mask
        neg_p[:, :h, :w] = neg_mask
        pos_j, neg_j = jnp.asarray(pos_p), jnp.asarray(neg_p)

        def eval_fn(xv):
            loss, grad, low, fmp, fmn = self._loss_grad(
                self.variables, img_j, pts_j, pos_j, neg_j,
                jnp.asarray(xv, jnp.float32), out_h=hp, out_w=wp, bs=bs)
            logits = _resize_chw(np.asarray(low)[:, None], hp, wp)[:, 0]
            return loss, grad, logits, fmp, fmn

        self.opt_functor.init_click(eval_fn)
        if num_clicks > self.optimize_after_n_clicks:
            opt_result = fmin_l_bfgs_b(func=self.opt_functor,
                                       x0=np.asarray(self.opt_data, np.float64),
                                       **self.opt_functor.optimizer_params)
            self.opt_data = opt_result[0].astype(np.float32)

        if self.opt_functor.best_prediction is not None:
            logits = self.opt_functor.best_prediction
        else:
            _, _, logits, _, _ = eval_fn(self.opt_data)
            logits = np.asarray(logits)
        return logits[:, None, :h, :w]
