"""Host-side threaded frame prefetcher.

Replaces the reference's per-video DataLoader(num_workers=4)
(cutie/eval_vos.py:90): a bounded thread pool decodes JPEG/PNG ahead of the
device step. PIL decode releases the GIL, so threads overlap with dispatch;
pairs with the device-side async jit dispatch for a simple two-stage
pipeline.
"""
from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Iterator


def prefetch_iter(dataset, num_workers: int = 4, depth: int = 8,
                  transform=None) -> Iterator:
    """Yields dataset[i] in order with up to `depth` decoded frames in flight.

    transform: optional per-item fn applied INSIDE the worker threads —
    pass a device-upload hook (e.g. jax.device_put on the frame) to move
    the H2D copy off the dispatch thread (double-buffered host->HBM
    prefetch; jax array creation is thread-safe and the copy releases
    the GIL)."""
    n = len(dataset)
    if n == 0:
        return

    def fetch(i):
        item = dataset[i]
        return transform(item) if transform is not None else item

    with ThreadPoolExecutor(max_workers=num_workers) as pool:
        futures = {}
        next_submit = 0

        def top_up():
            nonlocal next_submit
            while next_submit < n and len(futures) < depth:
                futures[next_submit] = pool.submit(fetch, next_submit)
                next_submit += 1

        top_up()
        for i in range(n):
            fut = futures.pop(i)
            top_up()
            yield fut.result()
