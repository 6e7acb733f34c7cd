"""Device mesh + sharding helpers (data-parallel first-class).

The reference is single-device (SURVEY.md §2.10: no distributed code at all).
Here data parallelism is first-class and TPU-native: a 1-D `jax.sharding.Mesh`
over the "data" axis, batches sharded on axis 0, parameters/optimizer state
replicated, and the gradient all-reduce emitted by XLA as a `psum` over ICI
when the jitted train step consumes the sharded batch — no NCCL-style backend,
no hand-written collectives.

Extension points (reserved axis names, not in minimum parity scope): "model"
for tensor parallelism of the widest conv/attention layers, and multi-slice
DCN via `jax.distributed.initialize()` + per-host input pipelines.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    """1-D data-parallel mesh over the first `num_devices` devices."""
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.array(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard axis 0 (batch) across the data axis."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis_name: str = "data"):
    """Device-put a (possibly nested) host batch with axis-0 sharding."""
    sharding = batch_sharding(mesh, axis_name)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def auto_data_mesh(batch_size: int, num_devices: Optional[int] = None) -> Mesh:
    """1-D data mesh sized to the largest device count dividing batch_size
    (or exactly num_devices when given)."""
    if num_devices is None:
        avail = len(jax.devices())
        num_devices = max(d for d in range(1, avail + 1)
                          if batch_size % d == 0)
    if batch_size % num_devices != 0:
        raise ValueError(
            f"batch size {batch_size} must be divisible by {num_devices} devices")
    return make_mesh(num_devices)
