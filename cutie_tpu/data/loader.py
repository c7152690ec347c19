"""Deterministic sharded training loader.

TPU-native replacement for DistributedSampler + DataLoader workers
(cutie/dataset/setup_training_data.py:18-87): a deterministic global index
stream (seeded permutation per epoch) sharded by process_index, decoded by a
thread pool ahead of the train step. Resumption is exact: the stream position
is a pure function of (seed, epoch, iteration) — train.py fast-forwards
epoch = it // batches_per_epoch() on checkpoint resume.
"""
from __future__ import annotations

import threading
from concurrent.futures import ThreadPoolExecutor
from queue import Empty, Full, Queue
from typing import Dict, Iterator, Optional

import numpy as np


def collate(samples, pad_objects: Optional[int] = None) -> Dict[str, np.ndarray]:
    """Stack per-sample dicts into a batch. cls_gt ships as uint8 [B, T, H, W]
    (4x less H2D than int32, 16x less than the one-hot soft_gt earlier rounds
    uploaded — the loss now one-hot-encodes at the sampled points on device,
    training/losses.py)."""
    out: Dict[str, np.ndarray] = {}
    out["frames"] = np.stack([s["rgb"] for s in samples])
    out["first_frame_gt"] = np.stack([s["first_frame_gt"] for s in samples])
    out["selector"] = np.stack([s["selector"] for s in samples])
    out["cls_gt"] = np.stack(
        [s["cls_gt"] for s in samples]).astype(np.uint8)  # [B, T, H, W]
    out["info"] = [s["info"] for s in samples]
    return out


class ShardedLoader:
    """Iterates (batch, iteration) pairs. Global batch is split across
    processes; each sample is decoded with a per-(epoch, index) RNG so the
    stream is reproducible and resumable."""

    def __init__(self, dataset, batch_size: int, *, seed: int = 0,
                 num_workers: int = 8, process_index: int = 0,
                 process_count: int = 1, drop_last: bool = True,
                 prefetch_batches: int = 2):
        assert batch_size % process_count == 0, \
            "global batch size must divide evenly across processes"
        self.dataset = dataset
        self.global_batch = batch_size
        self.local_batch = batch_size // process_count
        self.seed = seed
        self.num_workers = num_workers
        self.process_index = process_index
        self.process_count = process_count
        self.drop_last = drop_last
        self.prefetch_batches = prefetch_batches

    def batches_per_epoch(self) -> int:
        return len(self.dataset) // self.global_batch

    def epoch(self, epoch: int) -> Iterator[Dict[str, np.ndarray]]:
        rng = np.random.default_rng((self.seed, epoch))
        perm = rng.permutation(len(self.dataset))
        n_batches = self.batches_per_epoch()
        if n_batches == 0:
            raise ValueError(
                f"dataset of {len(self.dataset)} samples is smaller than the "
                f"global batch ({self.global_batch}): no full batch per epoch")

        def load_one(global_idx: int, sample_idx: int):
            sample_rng = np.random.default_rng((self.seed, epoch, int(sample_idx)))
            return self.dataset.get(int(global_idx), sample_rng)

        with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            # backpressure: at most prefetch_batches+1 batches decoded ahead
            # of the consumer — without it the submitter enqueues the WHOLE
            # epoch (multi-GB of decoded samples accumulate until OOM) and
            # abandoning the iterator (curriculum rebuild / end of stage)
            # would block on the executor draining every remaining task
            pending = Queue(maxsize=max(self.prefetch_batches, 1))
            stop = threading.Event()

            def submit_all():
                for b in range(n_batches):
                    if stop.is_set():
                        return
                    start = b * self.global_batch + self.process_index * self.local_batch
                    futs = [pool.submit(load_one, perm[start + i], start + i)
                            for i in range(self.local_batch)]
                    while not stop.is_set():
                        try:
                            pending.put(futs, timeout=0.2)
                            break
                        except Full:
                            continue
                    if stop.is_set():
                        return
                pending.put(None)

            t = threading.Thread(target=submit_all, daemon=True)
            t.start()
            try:
                while True:
                    futs = pending.get()
                    if futs is None:
                        break
                    yield collate([f.result() for f in futs])
            finally:
                stop.set()
                # unblock the submitter if it is waiting on a full queue,
                # then drop whatever is in flight (no wait-for-epoch stall)
                try:
                    while True:
                        pending.get_nowait()
                except Empty:
                    pass
                pool.shutdown(wait=False, cancel_futures=True)
