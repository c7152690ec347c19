"""Device mesh + sharding helpers.

TPU-native replacement for the reference's NCCL/DDP stack
(cutie/train.py:24-29, cutie/model/trainer.py:32-35): a 1-D `data` mesh with
batch-sharded inputs and replicated params; XLA inserts the gradient
all-reduce over ICI. Multi-host via jax.distributed.initialize():
jax.devices() spans hosts, and shard_batch assembles the global batch from
each process's LOCAL shard (jax.make_array_from_process_local_data).
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            # silent truncation would let an N-device validation "pass" on
            # one device without exercising a single collective
            raise ValueError(
                f"requested a {n_devices}-device mesh but only "
                f"{len(devices)} devices are available")
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def data_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) axis across the mesh."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis: str = "data"):
    """Upload a host batch with the leading axis sharded over the mesh.

    Single process: a plain sharded device_put. Multi-host: each process
    holds only its LOCAL rows (ShardedLoader shards the global batch by
    process_index), so the global array must be assembled from per-process
    shards — device_put with a global sharding would treat the local rows
    as the whole global batch (wrong data, and a shape error whenever
    local_batch < num_devices)."""
    sh = data_sharding(mesh, axis)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
            batch)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
