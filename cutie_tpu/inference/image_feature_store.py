"""Per-frame feature cache.

Behavioral parity target: reference cutie/inference/image_feature_store.py:7-49
— encode once per frame index even when a frame is stepped multiple times
(interactive flows pass delete_buffer=False). Within a single step the fused
encode graph already shares features; this store covers the cross-step case.
"""
from __future__ import annotations

import logging
from typing import Dict

log = logging.getLogger(__name__)


class ImageFeatureStore:
    def __init__(self, steps, variables):
        self._steps = steps
        self._variables = variables
        self._store: Dict[int, object] = {}

    def get_features(self, ti: int, image_d, *, pad, input_mode):
        if ti not in self._store:
            self._store[ti] = self._steps.encode(self._variables, image_d,
                                                 pad=pad, input_mode=input_mode)
        return self._store[ti]

    def delete(self, ti: int) -> None:
        self._store.pop(ti, None)

    def __contains__(self, ti: int) -> bool:
        return ti in self._store

    def __len__(self):
        return len(self._store)

    def __del__(self):
        if self._store:
            log.warning("Leaking %d cached frame features; did you forget "
                        "delete_buffer/delete()?", len(self._store))
