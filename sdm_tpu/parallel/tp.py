"""Tensor parallelism over a 2-D ("data", "model") mesh via GSPMD.

The reference has no model parallelism (SURVEY.md §2.10 — TP "not required
for parity; mesh axis reserved in design"). This module makes the reserved
axis real: conv/dense kernels whose output-channel dimension is wide enough
are sharded over the "model" axis with `NamedSharding` annotations, and XLA's
SPMD partitioner propagates the shardings through the U-Net, inserting the
all-gather/reduce collectives over ICI. Correctness is guaranteed by SPMD
semantics (sharding annotations never change numerics) and asserted by
tests/test_tp.py on a virtual 2x4 CPU mesh.

The U-Net's widest layers (512 channels at the 16²-32² resolutions) dominate
parameter count and per-step FLOPs; channel-sharding them is the natural TP
cut for conv nets (no head/sequence axis to split).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_2d_mesh(dp: int, tp: int, devices=None) -> Mesh:
    devices = np.asarray(devices if devices is not None
                         else jax.devices()[:dp * tp])
    if devices.size != dp * tp:
        raise ValueError(f"need {dp * tp} devices, have {devices.size}")
    return Mesh(devices.reshape(dp, tp), ("data", "model"))


def tp_param_shardings(params, mesh: Mesh, *, axis: str = "model",
                       min_width: int = 256):
    """Pytree of NamedShardings: kernels with a last (output-channel) dim
    that is >= min_width and divisible by the model-axis size are sharded on
    that dim; everything else is replicated."""
    tp_size = mesh.shape[axis]

    def spec(leaf):
        shape = np.shape(leaf)
        if (len(shape) >= 2 and shape[-1] >= min_width
                and shape[-1] % tp_size == 0):
            return NamedSharding(
                mesh, P(*([None] * (len(shape) - 1)), axis))
        return NamedSharding(mesh, P())

    return jax.tree.map(spec, params)


def shard_params_tp(params, mesh: Mesh, **kw):
    shardings = tp_param_shardings(params, mesh, **kw)
    return jax.tree.map(jax.device_put, params, shardings)
