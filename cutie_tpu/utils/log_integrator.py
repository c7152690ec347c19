"""Metric accumulation with cross-process reduction.

Behavioral parity target: reference cutie/utils/log_integrator.py:11-84
(Integrator: accumulate loss dicts, reduce across ranks, average, custom
hooks, periodic reset). The reference reduces with torch.distributed.reduce;
here cross-process averaging uses jax.experimental.multihost_utils when
process_count > 1 (in-graph psum is unnecessary for logging-rate data).
"""
from __future__ import annotations

import logging
from typing import Callable, Dict, List, Union

import jax
import numpy as np

log = logging.getLogger(__name__)

TensorOrFloat = Union[float, np.ndarray]


class Integrator:
    def __init__(self, logger, *, distributed: bool = True):
        self.values: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}
        self.hooks: List[Callable] = []
        self.logger = logger
        self.distributed = distributed and jax.process_count() > 1

    def add_dict(self, tensor_dict: Dict[str, TensorOrFloat]) -> None:
        for k, v in tensor_dict.items():
            v = float(np.asarray(v))
            if k not in self.values:
                self.values[k] = v
                self.counts[k] = 1
            else:
                self.values[k] += v
                self.counts[k] += 1

    def add_hook(self, hook: Callable) -> None:
        """hook(values) -> (name, value) computed at finalize time."""
        self.hooks.append(hook)

    def reset_except_hooks(self) -> None:
        self.values = {}
        self.counts = {}

    def finalize(self, prefix: str, it: int) -> None:
        for hook in self.hooks:
            k, v = hook(self.values)
            self.add_dict({k: v})

        avged = {k: v / self.counts[k] for k, v in self.values.items()}
        if self.distributed:
            # average across hosts (reference log_integrator.py:69-84)
            from jax.experimental import multihost_utils
            keys = sorted(avged)
            vec = np.asarray([avged[k] for k in keys], np.float32)
            vec = np.asarray(multihost_utils.process_allgather(vec)).mean(axis=0)
            avged = dict(zip(keys, vec))
        if self.logger is not None and jax.process_index() == 0:
            self.logger.log_metrics(prefix, avged, it)
