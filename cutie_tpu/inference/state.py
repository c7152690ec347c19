"""Fixed-shape memory state for streaming inference.

TPU-native redesign of the reference's growing-tensor memory
(cutie/inference/{memory_manager,kv_memory_store}.py): every store is a
static-capacity HBM buffer with device counters + validity masks, so the
per-frame step compiles once and never reallocates:

  - permanent memory: append-only token buffer (reference: tokens prepended
    with perm_end_pt marking the prefix — kv_memory_store.py:43,119-129);
  - working memory: frame-granular ring buffer (reference: token-axis
    torch.cat growth + sieve_by_range FIFO — kv_memory_store.py:164-207);
    frame granularity is exact because insertion is always one frame (HW
    tokens) at a time;
  - long-term memory: append buffer with usage-ranked eviction
    (kv_memory_store.py:209-242);
  - sensory memory: dense [B, O, h, w, Cs] (memory_manager.py:360-375);
  - object memory: streaming-average summary accumulator [B, O, Q, E+1]
    (memory_manager.py:251-271).

Objects are a padded static axis O; per-object token validity masks replace
the reference's buckets (kv_memory_store.py:26-40): an object's tokens in a
frame slot are valid only if the object existed when the slot was written.
"""
from __future__ import annotations

from typing import Optional

import flax.struct
import jax.numpy as jnp


@flax.struct.dataclass
class MemoryState:
    # --- sensory memory (stride 16) ---
    sensory: jnp.ndarray           # [B, O, h, w, Cs] fp32

    # --- object (summary) memory: streaming average accumulator ---
    obj_v: jnp.ndarray             # [B, O, Q, E+1] fp32

    # --- permanent memory (append-only tokens) ---
    perm_key: jnp.ndarray          # [B, Pcap, Ck]
    perm_shrink: jnp.ndarray       # [B, Pcap]
    perm_value: jnp.ndarray        # [B, O, Pcap, Cv]
    perm_obj_valid: jnp.ndarray    # [O, Pcap] bool: token valid for object
    perm_n: jnp.ndarray            # [] int32: tokens used

    # --- working memory (ring of F frame slots, HW tokens each) ---
    work_key: jnp.ndarray          # [B, F, HW, Ck]
    work_shrink: jnp.ndarray       # [B, F, HW]
    work_sel: jnp.ndarray          # [B, F, HW, Ck] (selection; LT mode only — else size-0 F axis is fine)
    work_value: jnp.ndarray        # [B, O, F, HW, Cv]
    work_obj_valid: jnp.ndarray    # [O, F] bool
    work_start: jnp.ndarray        # [] int32: index of oldest frame slot
    work_count: jnp.ndarray        # [] int32: frames currently stored
    work_use: jnp.ndarray          # [B, F, HW] usage counters (LT mode)
    work_life: jnp.ndarray         # [B, F, HW]

    # --- long-term memory (append buffer of prototype tokens) ---
    lt_key: jnp.ndarray            # [B, L, Ck]
    lt_shrink: jnp.ndarray         # [B, L]
    lt_value: jnp.ndarray          # [B, O, L, Cv]
    lt_obj_valid: jnp.ndarray      # [O, L] bool
    lt_count: jnp.ndarray          # [] int32
    lt_use: jnp.ndarray            # [B, L]
    lt_life: jnp.ndarray           # [B, L]

    # [B, O, H0, W0] probabilities of the previous frame (reference last_mask)
    last_mask: jnp.ndarray


def init_state(*, batch: int, max_objects: int, h: int, w: int,
               sensory_dim: int, key_dim: int, value_dim: int,
               num_queries: int, embed_dim: int,
               perm_frames: int, work_frames: int, lt_capacity: int,
               dtype=jnp.float32) -> MemoryState:
    """Allocate an all-empty state. h/w are stride-16 dims; HW = h*w tokens/frame."""
    hw = h * w
    # token capacities round up to sublane multiples (8) so the pallas read
    # can DMA each store's tail chunk in place (Mosaic: DMA slice shapes
    # must be 8-aligned); the extra slots sit beyond perm_n / lt_count and
    # are masked invalid everywhere
    pcap = -(-perm_frames * hw // 8) * 8
    lt_capacity = -(-lt_capacity // 8) * 8
    B, O = batch, max_objects
    f32 = jnp.float32
    return MemoryState(
        sensory=jnp.zeros((B, O, h, w, sensory_dim), f32),
        obj_v=jnp.zeros((B, O, num_queries, embed_dim + 1), f32),
        perm_key=jnp.zeros((B, pcap, key_dim), dtype),
        perm_shrink=jnp.zeros((B, pcap), dtype),
        perm_value=jnp.zeros((B, O, pcap, value_dim), dtype),
        perm_obj_valid=jnp.zeros((O, pcap), bool),
        perm_n=jnp.zeros((), jnp.int32),
        work_key=jnp.zeros((B, work_frames, hw, key_dim), dtype),
        work_shrink=jnp.zeros((B, work_frames, hw), dtype),
        work_sel=jnp.zeros((B, work_frames, hw, key_dim), dtype),
        work_value=jnp.zeros((B, O, work_frames, hw, value_dim), dtype),
        work_obj_valid=jnp.zeros((O, work_frames), bool),
        work_start=jnp.zeros((), jnp.int32),
        work_count=jnp.zeros((), jnp.int32),
        work_use=jnp.zeros((B, work_frames, hw), f32),
        work_life=jnp.zeros((B, work_frames, hw), f32),
        lt_key=jnp.zeros((B, lt_capacity, key_dim), dtype),
        lt_shrink=jnp.zeros((B, lt_capacity), dtype),
        lt_value=jnp.zeros((B, O, lt_capacity, value_dim), dtype),
        lt_obj_valid=jnp.zeros((O, lt_capacity), bool),
        lt_count=jnp.zeros((), jnp.int32),
        lt_use=jnp.zeros((B, lt_capacity), f32),
        lt_life=jnp.zeros((B, lt_capacity), f32),
        last_mask=jnp.zeros((B, O, h * 16, w * 16), f32),
    )


def pad_objects(state: MemoryState, new_max_objects: int) -> MemoryState:
    """Grow the padded object axis (host-side, triggers one recompile)."""
    def grow(x, axis):
        if x.shape[axis] >= new_max_objects:
            return x
        pad = [(0, 0)] * x.ndim
        pad[axis] = (0, new_max_objects - x.shape[axis])
        return jnp.pad(x, pad)

    return state.replace(
        sensory=grow(state.sensory, 1),
        obj_v=grow(state.obj_v, 1),
        perm_value=grow(state.perm_value, 1),
        perm_obj_valid=grow(state.perm_obj_valid, 0),
        work_value=grow(state.work_value, 1),
        work_obj_valid=grow(state.work_obj_valid, 0),
        lt_value=grow(state.lt_value, 1),
        lt_obj_valid=grow(state.lt_obj_valid, 0),
        last_mask=grow(state.last_mask, 1),
    )


def resize_work_ring(state: MemoryState, new_frames: int) -> MemoryState:
    """Re-allocate the working-memory ring to `new_frames` frame slots,
    preserving FIFO order (host-side, one recompile of the step graphs).

    Supports runtime max_mem_frames updates (reference
    memory_manager.py:59-75: the GUI spinboxes grow/shrink the working-memory
    budget live). Stored frames are unrolled to chronological order (oldest at
    slot 0); on shrink the oldest frames are dropped — the same frames the
    reference's next remove_old_memory sieve would evict."""
    f = state.work_key.shape[1]
    if new_frames == f:
        return state
    start = int(state.work_start)
    count = int(state.work_count)
    keep = min(count, new_frames)
    # chronological slot order, newest `keep` kept
    src = [(start + i) % f for i in range(count)][count - keep:]
    src = src + [0] * (new_frames - keep)  # filler slots (masked invalid)
    idx = jnp.asarray(src, jnp.int32)
    live = jnp.arange(new_frames) < keep

    def take(x, axis):
        moved = jnp.take(x, idx, axis=axis)
        shape = [1] * moved.ndim
        shape[axis] = -1
        return moved * live.reshape(shape).astype(moved.dtype)

    return state.replace(
        work_key=take(state.work_key, 1),
        work_shrink=take(state.work_shrink, 1),
        work_sel=take(state.work_sel, 1),
        work_value=take(state.work_value, 2),
        work_obj_valid=take(state.work_obj_valid.astype(jnp.float32), 1) > 0.5,
        work_start=jnp.zeros((), jnp.int32),
        work_count=jnp.asarray(keep, jnp.int32),
        work_use=take(state.work_use, 1),
        work_life=take(state.work_life, 1),
    )


def resize_lt_capacity(state: MemoryState, new_cap: int) -> MemoryState:
    """Re-allocate the long-term buffers to `new_cap` tokens (host-side, one
    recompile of the step graphs).

    Supports runtime long_term.max_num_tokens updates (the GUI long-term
    spinbox funnels into InferenceCore.update_config; reference
    memory_manager.py:59-75). Grow pads with invalid tokens; shrink keeps
    the first `new_cap` tokens (the usage-ranked eviction inside
    consolidation governs which tokens matter — a shrink below the live
    count simply forces the next eviction earlier)."""
    cap = state.lt_key.shape[1]
    new_cap = -(-new_cap // 8) * 8  # sublane-aligned (DMA tail chunks)
    if new_cap == cap:
        return state

    def resize(x, axis):
        if new_cap > cap:
            pad = [(0, 0)] * x.ndim
            pad[axis] = (0, new_cap - cap)
            return jnp.pad(x, pad)
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(0, new_cap)
        return x[tuple(sl)]

    return state.replace(
        lt_key=resize(state.lt_key, 1),
        lt_shrink=resize(state.lt_shrink, 1),
        lt_value=resize(state.lt_value, 2),
        lt_obj_valid=resize(state.lt_obj_valid, 1),
        lt_use=resize(state.lt_use, 1),
        lt_life=jnp.maximum(resize(state.lt_life, 1), 1e-7),
        lt_count=jnp.minimum(state.lt_count, new_cap),
    )


def grow_perm(state: MemoryState, new_perm_tokens: int) -> MemoryState:
    """Grow the permanent buffer capacity (host-side, for repeated commits)."""
    def grow(x, axis):
        pad = [(0, 0)] * x.ndim
        pad[axis] = (0, new_perm_tokens - x.shape[axis])
        return jnp.pad(x, pad)

    new_perm_tokens = -(-new_perm_tokens // 8) * 8  # sublane-aligned (DMA)
    if state.perm_key.shape[1] >= new_perm_tokens:
        return state
    return state.replace(
        perm_key=grow(state.perm_key, 1),
        perm_shrink=grow(state.perm_shrink, 1),
        perm_value=grow(state.perm_value, 2),
        perm_obj_valid=grow(state.perm_obj_valid, 1),
    )
