"""Training-time unrolled sequence forward (in-graph memory).

Behavioral parity target: reference cutie/model/train_wrapper.py:25-112:
encode all T frames in one backbone pass, seed memory with the first-frame GT,
then unroll t = 1..T-1 with <=num_ref_frames randomly sampled reference
frames, full-softmax memory reads, segmentation, and re-encoding of the
predicted masks with Bernoulli(deep_update_prob) deep updates.

Pure function of (variables, data, rng) — the python loop unrolls into one
XLA graph (T is static), exactly like the reference's autograd graph.
"""
from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp

from cutie_tpu.models.cutie import CUTIE


def train_forward(model: CUTIE, variables: Dict[str, Any], data: Dict[str, jnp.ndarray],
                  rng: jax.Array, stage_cfg) -> Dict[str, jnp.ndarray]:
    """
    data:
      frames:         [B, T, H, W, 3] float in [0,1]
      first_frame_gt: [B, O, H, W] one-hot (padded object channels zero)
      selector:       [B, O] 1/0
    returns {'logits': [B, T-1, O+1, H, W],
             'logits_low': [B, T-1, O+1, H/4, W/4] (pre-upsample, loss-side),
             'aux_sensory_logits', 'aux_q_logits'}
    """
    raw_apply = functools.partial(model.apply, variables)
    if stage_cfg.get("remat", False):
        # rematerialize stage activations: the unrolled T-frame BPTT graph at
        # production sizes (B=16, 480^2, T=8) exceeds HBM without it
        # (jax.checkpoint trades recompute for memory)
        def apply(*args, method=None, **kwargs):
            # static python flags must bind in the closure — jax.checkpoint
            # traces every runtime kwarg (a `if flag:` inside would see a
            # tracer); traced kwargs (deep_update bernoulli) pass through
            static = {k: kwargs.pop(k) for k in ("return_low_logits",)
                      if k in kwargs}
            fn = lambda *a, **k: raw_apply(*a, method=method, **static, **k)
            return jax.checkpoint(fn)(*args, **kwargs)
    else:
        apply = raw_apply
    frames = data["frames"]
    first_frame_gt = data["first_frame_gt"].astype(jnp.float32)
    selector = data["selector"]
    b, seq_length = frames.shape[:2]
    num_objects = first_frame_gt.shape[1]
    num_ref = stage_cfg.num_ref_frames
    deep_update_prob = stage_cfg.deep_update_prob

    # one backbone pass over all frames (train_wrapper.py:42-45)
    frames_flat = frames.reshape(b * seq_length, *frames.shape[2:])
    ms_feat, pix_feat = apply(frames_flat, method="encode_image")
    keys, shrinkages, selections = apply(ms_feat[0].astype(jnp.float32),
                                         method="transform_key")

    def unflat_t(x):
        return x.reshape(b, seq_length, *x.shape[1:])

    keys, shrinkages, selections = map(unflat_t, (keys, shrinkages, selections))
    ms_feat = [unflat_t(f) for f in ms_feat]
    pix_feat = unflat_t(pix_feat)
    h, w = keys.shape[2:4]

    sensory = jnp.zeros((b, num_objects, h, w, model.cfg.model.sensory_dim))
    msk_val, sensory, obj_val, _ = apply(frames[:, 0], pix_feat[:, 0], sensory,
                                         first_frame_gt, deep_update=True,
                                         method="encode_mask")
    masks = first_frame_gt

    msk_values = msk_val[:, :, None]          # [B, O, T_mem, h, w, Cv]
    obj_values = obj_val[:, :, None] if obj_val is not None else None

    all_logits, all_low, all_sensory_logits, all_q_logits = [], [], [], []

    for ti in range(1, seq_length):
        rng, k_ref, k_deep = jax.random.split(rng, 3)
        if ti <= num_ref:
            ref_msk_values = msk_values
            ref_keys = keys[:, :ti]
            ref_shrinkages = shrinkages[:, :ti]
        else:
            # per-sequence random subset of the ti stored frames
            # (train_wrapper.py:76-81)
            ridx = jax.vmap(lambda k: jax.random.permutation(k, ti)[:num_ref])(
                jax.random.split(k_ref, b))  # [B, num_ref]
            ref_msk_values = jax.vmap(lambda v, i: v[:, i])(msk_values, ridx)
            ref_keys = jax.vmap(lambda v, i: v[i])(keys, ridx)
            ref_shrinkages = jax.vmap(lambda v, i: v[i])(shrinkages, ridx)

        readout_mem, aux_input = apply(
            keys[:, ti], selections[:, ti],
            ref_keys, ref_shrinkages, ref_msk_values,
            obj_values, pix_feat[:, ti], sensory, masks, selector,
            method="read_memory")
        aux_output = apply(pix_feat[:, ti], aux_input, selector,
                           method="compute_aux")
        sensory, logits, prob, logits_low = apply(
            [f[:, ti] for f in ms_feat], readout_mem, sensory,
            selector=selector, return_low_logits=True, method="segment")
        masks = prob[:, 1:]

        if ti < seq_length - 1:  # no need to encode the last frame
            deep_update = jax.random.bernoulli(k_deep, deep_update_prob)
            msk_val, sensory, obj_val, _ = apply(
                frames[:, ti], pix_feat[:, ti], sensory, masks,
                deep_update=deep_update, method="encode_mask")
            msk_values = jnp.concatenate([msk_values, msk_val[:, :, None]], axis=2)
            if obj_values is not None:
                obj_values = jnp.concatenate([obj_values, obj_val[:, :, None]],
                                             axis=2)

        all_logits.append(logits)
        all_low.append(logits_low)
        if "sensory_logits" in aux_output:
            all_sensory_logits.append(aux_output["sensory_logits"])
        if aux_output.get("q_logits") is not None:
            all_q_logits.append(aux_output["q_logits"])

    out = {"logits": jnp.stack(all_logits, axis=1),
           "logits_low": jnp.stack(all_low, axis=1)}
    if all_sensory_logits:
        out["sensory_logits"] = jnp.stack(all_sensory_logits, axis=1)
    if all_q_logits:
        out["q_logits"] = jnp.stack(all_q_logits, axis=1)
    return out
