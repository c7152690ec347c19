"""Streaming per-frame inference engine — the public API shell.

Behavioral parity target: reference cutie/inference/inference_core.py:18-345
(step / output_prob_to_mask / delete_objects / clear_* / update_config, with
mem_every cadence, staggered sensory updates, partial-mask merging,
force_permanent commits, max_internal_size resizing).

TPU redesign: the shell holds only host bookkeeping (object ids, cadence
counters, host mirrors of the device memory counters) and dispatches
jit-compiled pure step functions over a fixed-shape MemoryState. All cadence
decisions are host-deterministic, so each compiled graph is branch-free.

Inputs follow the reference convention: image is CHW float in [0,1]
(numpy or jax array); masks are HW index masks or [num_objects, H, W]
channel masks. Output is a (num_objects+1, H, W) probability array.
"""
from __future__ import annotations

import logging
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from cutie_tpu.inference.image_feature_store import ImageFeatureStore
from cutie_tpu.inference.object_manager import ObjectManager
from cutie_tpu.inference.state import (MemoryState, grow_perm, init_state,
                                       pad_objects, resize_lt_capacity,
                                       resize_work_ring)
from cutie_tpu.inference.steps import StepFunctions
from cutie_tpu.ops.resize import (bilinear_resize, bilinear_resize_np,
                                  nearest_exact_resize_np)
from cutie_tpu.ops.tensor_utils import aggregate_wbg_np, compute_pad

log = logging.getLogger(__name__)

_OBJ_BUCKETS = (1, 2, 4, 8, 16, 32, 64)


def _obj_capacity(n: int) -> int:
    for b in _OBJ_BUCKETS:
        if n <= b:
            return b
    return n




class InferenceCore:

    def __init__(self, network, cfg):
        """network: ModelBundle (model + variables); cfg: eval-style Config."""
        self.model = network.model
        self.variables = network.variables
        self.cfg = cfg
        self.mem_every = cfg.mem_every
        stagger_updates = cfg.stagger_updates
        self.save_aux = cfg.save_aux
        self.max_internal_size = cfg.max_internal_size
        self.flip_aug = cfg.flip_aug
        self.use_long_term = bool(cfg.use_long_term)

        self.curr_ti = -1
        self.last_mem_ti = 0
        if stagger_updates >= self.mem_every:
            self.stagger_ti = set(range(1, self.mem_every + 1))
        else:
            self.stagger_ti = set(
                np.round(np.linspace(1, self.mem_every, stagger_updates)).astype(int))
        self.object_manager = ObjectManager()
        self.steps = StepFunctions.get(self.model, cfg)
        self.image_feature_store = ImageFeatureStore(self.steps, self.variables)

        # memory budgets (memory_manager.py:29-38: -1 because the first frame
        # becomes permanent memory)
        if self.use_long_term:
            self.max_mem_frames = cfg.long_term.max_mem_frames - 1
            self.min_mem_frames = cfg.long_term.min_mem_frames - 1
            self.num_prototypes = cfg.long_term.num_prototypes
            self.max_long_tokens = cfg.long_term.max_num_tokens
            self.buffer_tokens = cfg.long_term.buffer_tokens
            # +1 slack slot: consolidation runs after the ring holds
            # max_mem_frames frames, so it must never overwrite
            self.ring_frames = self.max_mem_frames + 1
            self.lt_capacity = self._round_lt_cap(
                self.max_long_tokens + self.num_prototypes)
        else:
            self.max_mem_frames = cfg.max_mem_frames - 1
            self.ring_frames = max(self.max_mem_frames, 1)
            self.lt_capacity = 8  # dummy tiny buffer (never valid)

        self.state: Optional[MemoryState] = None
        # bucket bookkeeping: objects first seen in the same step share a
        # bucket (reference kv_memory_store.py:26-40); slot i -> bucket id
        self._slot_bucket: list = []
        self._next_bucket = 0
        self._new_slots: list = []  # slots created by the current step
        self.pad = None
        # host mirrors of device counters (deterministic)
        self._perm_n = 0
        self._work_count = 0
        self._lt_count = 0
        # cached device-side constants (avoid per-frame tiny H2D transfers)
        self._dev_true = jnp.asarray(True)
        self._dev_false = jnp.asarray(False)
        self._sel_cache = None  # (num_obj, capacity) -> device selector
        self._bucket_cache = None  # (tuple(slot_bucket), capacity) -> arrays

    # ------------------------------------------------------------------ admin

    @property
    def engaged(self) -> bool:
        return self._perm_n > 0 or self._work_count > 0

    def clear_memory(self):
        self.curr_ti = -1
        self.last_mem_ti = 0
        self.state = None
        self._perm_n = self._work_count = self._lt_count = 0
        self._slot_bucket = []
        self._next_bucket = 0

    def clear_non_permanent_memory(self):
        self.curr_ti = -1
        self.last_mem_ti = 0
        if self.state is not None:
            self.state = self.state.replace(
                work_start=jnp.zeros((), jnp.int32),
                work_count=jnp.zeros((), jnp.int32),
                lt_count=jnp.zeros((), jnp.int32),
                work_obj_valid=jnp.zeros_like(self.state.work_obj_valid),
                lt_obj_valid=jnp.zeros_like(self.state.lt_obj_valid),
                work_use=jnp.zeros_like(self.state.work_use),
                work_life=jnp.zeros_like(self.state.work_life),
                lt_use=jnp.zeros_like(self.state.lt_use),
                lt_life=jnp.zeros_like(self.state.lt_life),
            )
        self._work_count = self._lt_count = 0

    def clear_sensory_memory(self):
        self.curr_ti = -1
        self.last_mem_ti = 0
        if self.state is not None:
            self.state = self.state.replace(sensory=jnp.zeros_like(self.state.sensory))

    def update_config(self, cfg) -> None:
        self.mem_every = cfg["mem_every"]
        assert self.use_long_term == bool(cfg["use_long_term"]), "cannot update this"
        if int(cfg["top_k"]) != self.steps.top_k:
            # top_k is baked into the compiled read graph — fetch/compile a
            # variant (reference updates it live: memory_manager.py:59-75)
            new_cfg = self.cfg.copy()
            new_cfg.top_k = int(cfg["top_k"])
            self.steps = StepFunctions.get(self.model, new_cfg)
        if self.use_long_term:
            self.max_mem_frames = cfg["long_term"]["max_mem_frames"] - 1
            self.min_mem_frames = cfg["long_term"]["min_mem_frames"] - 1
            self.max_long_tokens = cfg["long_term"]["max_num_tokens"]
            self.buffer_tokens = cfg["long_term"]["buffer_tokens"]
            new_ring = self.max_mem_frames + 1
        else:
            self.max_mem_frames = cfg["max_mem_frames"] - 1
            new_ring = max(self.max_mem_frames, 1)
        if self.use_long_term:
            new_lt_cap = self._round_lt_cap(
                self.max_long_tokens + self.num_prototypes)
            if new_lt_cap != self.lt_capacity:
                # the LT buffers are fixed-capacity too — a raised
                # max_num_tokens must reallocate them just like the ring,
                # or appends past the old capacity silently overwrite the
                # newest prototypes (and eviction's top_k would trace-error)
                self.lt_capacity = new_lt_cap
                if self.state is not None:
                    self.state = self.steps.place_state(
                        resize_lt_capacity(self.state, new_lt_cap))
                    self._lt_count = min(self._lt_count, new_lt_cap)
            # on a ring SHRINK, consolidate WITH THE OLD RING INTACT until the
            # surviving frames fit the new budget — the reference consolidates
            # before any trim (memory_manager.py:282-296); resizing first would
            # drop the oldest frames outright instead of absorbing them into LT
            if self.state is not None and new_ring < self.ring_frames:
                while (self._work_count > new_ring
                       and self._work_count > self.min_mem_frames):
                    prev = self._work_count
                    self._maybe_consolidate()
                    if self._work_count >= prev:
                        break  # consolidation made no progress; bail
        if new_ring != self.ring_frames:
            # re-allocate the ring so raised budgets actually take effect
            # (reference memory grows live, memory_manager.py:59-75; the GUI
            # work-memory spinboxes funnel here, main_controller.py:532-540)
            self.ring_frames = new_ring
            if self.state is not None:
                self.state = self.steps.place_state(
                    resize_work_ring(self.state, new_ring))
                self._work_count = min(self._work_count, new_ring)
        if self.use_long_term:
            # a shrink-to-exactly-full ring (count == capacity) would make the
            # next memorize FIFO-overwrite an unconsolidated frame; drain now
            if (self.state is not None
                    and self._work_count >= self.ring_frames
                    and self._work_count > self.min_mem_frames):
                self._maybe_consolidate()

    # -------------------------------------------------------------- internals

    def _round_lt_cap(self, cap: int) -> int:
        """Round the LT allocation up to a mesh multiple so the token axis
        shards evenly (capacity only — max_num_tokens still governs when
        eviction fires; extra slots just sit invalid)."""
        if self.steps.mem_mesh is None:
            return cap
        d = self.steps.mem_mesh.shape["mem"]
        return -(-cap // d) * d

    def _selector(self) -> np.ndarray:
        o = self.state.sensory.shape[1]
        sel = np.zeros((o,), np.float32)
        sel[:self.object_manager.num_obj] = 1.0
        return sel

    def _selector_dev(self):
        o = self.state.sensory.shape[1]
        key = (self.object_manager.num_obj, o)
        if self._sel_cache is None or self._sel_cache[0] != key:
            self._sel_cache = (key, jnp.asarray(self._selector()))
        return self._sel_cache[1]

    def _buckets_dev(self):
        o = self.state.sensory.shape[1]
        key = (tuple(self._slot_bucket), o)
        if self._bucket_cache is None or self._bucket_cache[0] != key:
            reps, sel = self._buckets()
            self._bucket_cache = (key, reps, jnp.asarray(sel))
        return self._bucket_cache[1], self._bucket_cache[2]

    def _flag(self, b: bool):
        return self._dev_true if b else self._dev_false

    def _buckets(self):
        """(bucket_rep static tuple, bucket_sel [num_buckets, O]) for the read."""
        o = self.state.sensory.shape[1]
        if not self._slot_bucket:
            return (0,), np.ones((1, o), np.float32)
        order = []
        groups = {}
        for slot, b in enumerate(self._slot_bucket):
            if b not in groups:
                groups[b] = []
                order.append(b)
            groups[b].append(slot)
        reps = tuple(groups[b][0] for b in order)
        sel = np.zeros((len(order), o), np.float32)
        for bi, b in enumerate(order):
            for slot in groups[b]:
                sel[bi, slot] = 1.0
        return reps, sel

    def _ensure_state(self, h16: int, w16: int, num_obj: int):
        """Allocate or grow the device state for (resolution, object count)."""
        mc = self.cfg.model
        cap = _obj_capacity(num_obj)
        if self.state is None:
            self.state = init_state(
                batch=2 if self.flip_aug else 1, max_objects=cap, h=h16, w=w16,
                sensory_dim=mc.sensory_dim, key_dim=mc.key_dim,
                value_dim=mc.value_dim,
                num_queries=mc.object_transformer.num_queries,
                embed_dim=mc.object_transformer.embed_dim,
                perm_frames=max(self.cfg.get("perm_frame_capacity", 1), 1),
                work_frames=self.ring_frames,
                lt_capacity=self.lt_capacity,
            )
            # multi-chip: long-term buffers live token-sharded on the mem
            # mesh; every jitted step pins the same sharding on its outputs
            # (steps.constrain_state), so donated buffers never reshard
            self.state = self.steps.place_state(self.state)
        elif self.state.sensory.shape[1] < cap:
            self.state = self.steps.place_state(pad_objects(self.state, cap))

    def _merge_input_mask(self, mask, objects, idx_mask: bool,
                          pred_prob_with_bg: Optional[np.ndarray],
                          h_pad: int, w_pad: int) -> np.ndarray:
        """Combine a (possibly partial) user mask with the prediction using
        mutual exclusivity (inference_core.py:258-300). Host-side numpy.
        Returns padded-slot last_mask [O, Hp, Wp]."""
        prev_n = len(self._slot_bucket)
        tmp_ids, _ = self.object_manager.add_new_objects(list(objects))
        self._ensure_state(h_pad // 16, w_pad // 16, self.object_manager.num_obj)
        self._new_slots = []
        if self.object_manager.num_obj > prev_n:
            bucket = self._next_bucket
            self._next_bucket += 1
            for slot in range(prev_n, self.object_manager.num_obj):
                self._slot_bucket.append(bucket)
                self._new_slots.append(slot)
        o = self.state.sensory.shape[1]

        mask = np.asarray(mask)
        lw, uw, lh, uh = self.pad
        if idx_mask:
            mask_p = np.zeros((h_pad, w_pad), mask.dtype)
            mask_p[lh:h_pad - uh, lw:w_pad - uw] = mask
        else:
            mask_p = np.zeros((mask.shape[0], h_pad, w_pad), np.float32)
            mask_p[:, lh:h_pad - uh, lw:w_pad - uw] = mask

        out = np.zeros((o, h_pad, w_pad), np.float32)
        if pred_prob_with_bg is not None:
            pred_no_bg = np.asarray(pred_prob_with_bg[1:o + 1], np.float32).copy()
            if idx_mask:
                pred_no_bg[:, mask_p > 0] = 0
            else:
                pred_no_bg[:, mask_p.max(0) > 0.5] = 0
            out[:pred_no_bg.shape[0]] = pred_no_bg
            for mask_id, tmp_id in enumerate(tmp_ids):
                if idx_mask:
                    this_mask = (mask_p == objects[mask_id]).astype(np.float32)
                else:
                    this_mask = mask_p[mask_id]
                out[tmp_id - 1] = this_mask
        else:
            for mask_id, tmp_id in enumerate(tmp_ids):
                if idx_mask:
                    out[tmp_id - 1] = (mask_p == objects[mask_id]).astype(np.float32)
                else:
                    out[tmp_id - 1] = mask_p[mask_id]
        return out

    def _maybe_consolidate(self):
        if not self.use_long_term:
            return
        if self._work_count >= self.max_mem_frames:
            lt_keep = None
            if self._lt_count >= self.max_long_tokens - self.num_prototypes:
                lt_keep = (self.max_long_tokens - self.num_prototypes
                           - self.buffer_tokens)
                self._lt_count = lt_keep
            n_cand = self._work_count - self.min_mem_frames
            self.state = self.steps.consolidate(
                self.variables, self.state,
                n_candidate_frames=int(n_cand), lt_keep=lt_keep)
            self._work_count -= n_cand
            self._lt_count += self.num_prototypes

    # ------------------------------------------------------------------- step

    def step(self, image, mask=None, objects: Optional[List[int]] = None, *,
             idx_mask: bool = True, end: bool = False,
             delete_buffer: bool = True, force_permanent: bool = False):
        """See reference inference_core.py:172-201 for full semantics."""
        if objects is None and mask is not None:
            assert not idx_mask
            objects = list(range(1, mask.shape[0] + 1))

        # accept either uint8 HWC (fast path: 4x fewer bytes over the link,
        # layout/normalize happen on device) or the reference's float CHW;
        # a jax.Array is treated as an already-uploaded frame (pipelined
        # device_put from the caller) — no host round-trip
        if not isinstance(image, jax.Array):
            image = np.asarray(image)
        if image.ndim == 3 and image.shape[-1] == 3 and image.dtype == np.uint8:
            input_mode = "hwc_u8"
            orig_h, orig_w = image.shape[:2]
        else:
            if not isinstance(image, jax.Array):
                image = np.asarray(image, np.float32)  # [3, H, W] in [0, 1]
            input_mode = "chw_f32"
            orig_h, orig_w = image.shape[-2:]

        resize_needed = False
        if self.max_internal_size > 0:
            min_side = min(orig_h, orig_w)
            if min_side > self.max_internal_size:
                resize_needed = True
                new_h = int(orig_h / min_side * self.max_internal_size)
                new_w = int(orig_w / min_side * self.max_internal_size)
                # host-side, non-antialiased bilinear: torch-parity (the
                # jax.image.resize 'linear' kernel ANTIALIASES on downsample,
                # ~0.5 max diff vs the reference) and no device round-trip
                # per frame
                if input_mode == "hwc_u8":
                    image = np.transpose(np.asarray(image, np.float32) / 255.0,
                                         (2, 0, 1))
                    input_mode = "chw_f32"
                image = bilinear_resize_np(np.asarray(image), new_h, new_w)
                if mask is not None:
                    if idx_mask:
                        mask = nearest_exact_resize_np(np.asarray(mask), new_h, new_w)
                    else:
                        mask = bilinear_resize_np(np.asarray(mask, np.float32),
                                                  new_h, new_w)

        self.curr_ti += 1

        h, w = ((image.shape[0], image.shape[1]) if input_mode == "hwc_u8"
                else image.shape[-2:])
        self.pad = compute_pad(h, w, 16)
        lw, uw, lh, uh = self.pad
        h_pad, w_pad = h + lh + uh, w + lw + uw

        image_d = jnp.asarray(image)

        is_mem_frame = ((self.curr_ti - self.last_mem_ti >= self.mem_every)
                        or (mask is not None)) and (not end)
        need_segment = (mask is None) or (
            self.object_manager.num_obj > 0
            and not self.object_manager.has_all(list(objects)))
        update_sensory = ((self.curr_ti - self.last_mem_ti)
                          in self.stagger_ti) and (not end)

        # fused fast path: plain propagation frame (no user mask, no commit) —
        # one device dispatch for encode+segment+conditional-memorize
        if (mask is None and self.engaged and not force_permanent
                and not self.save_aux and delete_buffer
                and self.curr_ti not in self.image_feature_store):
            bucket_rep, bucket_sel = self._buckets_dev()
            self.state, output_prob = self.steps.step_plain(
                self.variables, self.state, image_d,
                self._selector_dev(), bucket_sel,
                self._flag(update_sensory),
                self._flag(bool(is_mem_frame)), pad=self.pad,
                input_mode=input_mode, bucket_rep=bucket_rep,
                n_out=self.object_manager.num_obj + 1)
            if is_mem_frame:
                self._work_count = min(self._work_count + 1, self.ring_frames)
                self.last_mem_ti = self.curr_ti
                self._maybe_consolidate()
            if resize_needed:
                out = jnp.moveaxis(output_prob, 0, -1)
                out = bilinear_resize(out, orig_h, orig_w)
                output_prob = jnp.moveaxis(out, -1, 0)
            return output_prob

        feats = self.image_feature_store.get_features(
            self.curr_ti, image_d, pad=self.pad, input_mode=input_mode)

        pred_prob_with_bg = None
        def empty_result():
            # free the features cached above (nothing will consume them —
            # ti advances every step) and match the normal output size
            if delete_buffer:
                self.image_feature_store.delete(self.curr_ti)
            oh, ow = (orig_h, orig_w) if resize_needed else (h, w)
            return jnp.zeros((1, oh, ow), jnp.float32)

        if need_segment:
            if not self.engaged:
                log.warning("Trying to segment without any memory!")
                return empty_result()
            bucket_rep, bucket_sel = self._buckets_dev()
            seg_out = self.steps.segment(
                self.variables, self.state, feats,
                self._selector_dev(), self._flag(update_sensory),
                bucket_sel, bucket_rep=bucket_rep)
            if self.save_aux:
                self.state, prob, self.aux = seg_out
            else:
                self.state, prob = seg_out
            pred_prob_with_bg = prob[0]  # [O+1, Hp, Wp]

        if mask is not None:
            if idx_mask and len(objects) == 0:
                log.warning("Trying to insert an empty mask as memory!")
                return empty_result()
            pred_np = (np.asarray(pred_prob_with_bg)
                       if pred_prob_with_bg is not None else None)
            last_mask = self._merge_input_mask(mask, objects, idx_mask, pred_np,
                                               h_pad, w_pad)
            prob_with_bg_np = aggregate_wbg_np(last_mask, keep_bg=True)
            self.state = self.steps.set_last_mask(
                self.state, jnp.asarray(prob_with_bg_np[None, 1:]))
            pred_prob_with_bg = jnp.asarray(prob_with_bg_np)

        if is_mem_frame or force_permanent:
            hw = (h_pad // 16) * (w_pad // 16)
            if force_permanent or not self.engaged:
                mode = "all"
            elif self._new_slots:
                # objects first seen this step: their tokens become permanent
                # (reference as_permanent='first' on a fresh bucket)
                mode = "split"
            else:
                mode = "no"
            if mode in ("all", "split"):
                if self._perm_n + hw > self.state.perm_key.shape[1]:
                    self.state = grow_perm(self.state, self._perm_n + hw)
                self._perm_n += hw
            if mode in ("no", "split"):
                self._work_count = min(self._work_count + 1, self.ring_frames)
            o_cap = self.state.sensory.shape[1]
            new_mask = np.zeros((o_cap,), np.float32)
            for slot in self._new_slots:
                new_mask[slot] = 1.0
            self.state = self.steps.memorize(
                self.variables, self.state, feats,
                self._selector_dev(), jnp.asarray(new_mask),
                self._dev_true, mode=mode)
            self.last_mem_ti = self.curr_ti
            if mode in ("no", "split"):
                self._maybe_consolidate()
        self._new_slots = []
        if delete_buffer:
            self.image_feature_store.delete(self.curr_ti)

        # unpad + restore original size
        output_prob = pred_prob_with_bg[:, lh:h_pad - uh, lw:w_pad - uw]
        # trim padded object slots to the live count
        output_prob = output_prob[:self.object_manager.num_obj + 1]
        if resize_needed:
            out = jnp.moveaxis(output_prob, 0, -1)
            out = bilinear_resize(out, orig_h, orig_w)
            output_prob = jnp.moveaxis(out, -1, 0)
        return output_prob

    # ------------------------------------------------------------- public api

    def delete_objects(self, objects: List[int]) -> None:
        """Remove objects from bookkeeping + memory (inference_core.py:330-335)."""
        old_order = {obj.id: tmp for obj, tmp in self.object_manager.obj_to_tmp_id.items()}
        old_buckets = list(self._slot_bucket)
        self.object_manager.delete_objects(objects)
        if self.state is None:
            return
        o = self.state.sensory.shape[1]
        # new slot s holds the object that now has tmp id s+1
        idx = []
        for tmp_id in range(1, self.object_manager.num_obj + 1):
            obj = self.object_manager.tmp_id_to_obj[tmp_id]
            idx.append(old_order[obj.id] - 1)
        keep = len(idx)
        self._slot_bucket = [old_buckets[i] for i in idx if i < len(old_buckets)]
        idx = np.asarray(idx + [0] * (o - keep), np.int32)
        mask = np.asarray([1.0] * keep + [0.0] * (o - keep), np.float32)
        self.state = _reorder_objects(self.state, jnp.asarray(idx), jnp.asarray(mask))

    def output_prob_to_mask(self, output_prob) -> np.ndarray:
        """argmax + tmp-id -> object-id remap (inference_core.py:337-345)."""
        mask = np.asarray(jnp.argmax(output_prob, axis=0))
        return self.object_manager.tmp_to_obj_cls(mask)


@jax.jit
def _reorder_objects(state: MemoryState, idx: jnp.ndarray,
                     keep: jnp.ndarray) -> MemoryState:
    """Permute/compact the padded object axis after deletions
    (object_manager.py:56-77 re-sorting + memory purge_except)."""
    def ob(x, axis):  # object-axis take + zero the dropped slots
        moved = jnp.take(x, idx, axis=axis)
        shape = [1] * x.ndim
        shape[axis] = -1
        return moved * keep.reshape(shape).astype(moved.dtype)

    return state.replace(
        sensory=ob(state.sensory, 1),
        obj_v=ob(state.obj_v, 1),
        perm_value=ob(state.perm_value, 1),
        perm_obj_valid=ob(state.perm_obj_valid.astype(jnp.float32), 0) > 0.5,
        work_value=ob(state.work_value, 1),
        work_obj_valid=ob(state.work_obj_valid.astype(jnp.float32), 0) > 0.5,
        lt_value=ob(state.lt_value, 1),
        lt_obj_valid=ob(state.lt_obj_valid.astype(jnp.float32), 0) > 0.5,
        last_mask=ob(state.last_mask, 1),
    )
