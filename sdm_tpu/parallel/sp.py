"""Spatial partitioning (SP): shard activations along the image H axis.

The reference is single-device (SURVEY.md §2.10); DP/TP/FSDP (mesh.py, tp.py,
fsdp.py) shard batch rows and weights — none of them shrinks the *per-sample*
activation footprint, which is exactly what blocks 256² SR training at large
batch (BASELINE.md: the residual peak is 2.1 GB/tensor full-res conv
activations). SP is the TPU-native answer: a "space" mesh axis over which the
H dimension of every image tensor is sharded, so each chip holds an H/sp
slab of every activation. We only annotate the *input* sharding
(P("data", "space") on (N, H, W, C) batches); XLA's SPMD partitioner
propagates it through the whole U-Net, inserting halo exchanges
(collective-permute of the 1-row borders each 3×3 conv needs), cross-shard
GroupNorm reductions, and attention-token gathers automatically — the GSPMD
spatial-partitioning recipe, with numerics unchanged by construction
(asserted vs the single-device step in tests/test_sp.py; measured there:
per-device activation temp shrinks ~3.7× at sp=4).

This is the "sequence parallelism" of a conv net: the image plane is the
sequence. Enable via config `"sp": <int>` (train loop); composes with DP on
the leading mesh axis and with FSDP (state sharded over "data" as usual).

Attention under SP is space-aware on the pure-XLA path, and sp>1 forces
that path. The Pallas kernels' `kernels/partitioning.batch_partitioned`
declares every non-batch dim need-replication, so under SP they would make
the partitioner all-gather the token axis and give every space-group member
the full attention computation redundantly (sp× work on the attention share
of the step). The XLA attention einsums, by contrast, GSPMD-shards along
the query/token axis: queries (and the q-axis softmax stats) stay H-sharded,
keys/values are all-gathered once, and each chip does S/sp × S of the S²
score work — 1× total FLOPs, same as single-device (asserted by the
per-device cost_analysis scaling test in tests/test_sp.py). The train loop
(run_training) and the generator CLIs therefore override use_pallas to
False whenever sp > 1. A fully gather-free kernel (ring attention over H)
remains the extension point if the one K/V all-gather ever shows up on a
profile; validating the kernels' gather path end-to-end needs real
multi-chip hardware (the CPU interpret-mode kernels bypass
custom_partitioning and cannot exercise it).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_dp_sp_mesh(dp: int, sp: int, devices=None) -> Mesh:
    """2-D ("data", "space") mesh: batch rows shard over dp, image H over sp."""
    devices = np.asarray(devices if devices is not None
                         else jax.devices()[:dp * sp])
    if devices.size != dp * sp:
        raise ValueError(f"need {dp * sp} devices, have {devices.size}")
    return Mesh(devices.reshape(dp, sp), ("data", "space"))


def spatial_batch_spec(ndim: int, *, leading_stack: bool = False,
                       data_axis: str = "data",
                       space_axis: str = "space") -> P:
    """PartitionSpec for one batch array.

    Image tensors (N, H, W, C) shard batch on `data_axis` and H on
    `space_axis`; non-spatial arrays (labels (N, D), scalars) shard batch
    only. `leading_stack` marks grad-accum stacks (A, N, ...) whose axis 0
    is walked by the step's lax.scan and must stay unsharded.
    """
    body = ndim - (1 if leading_stack else 0)
    spec = [data_axis, space_axis] if body >= 4 else (
        [data_axis] if body >= 1 else [])
    if leading_stack:
        spec = [None] + spec
    return P(*spec)


def validate_spatial_divisibility(shape, sp: int, *, name: str = "image",
                                  leading_stack: bool = False) -> None:
    """H (and the deepest feature map's H) must divide over the space axis.

    GSPMD stays *correct* for non-divisible shards (it pads), but the halo
    logic then moves whole padded slabs — fail fast instead, like the batch/
    devices divisibility check (mesh.py).
    """
    ndim = len(shape) - (1 if leading_stack else 0)
    if ndim < 4:
        return
    h = shape[-3]
    if h % sp:
        raise ValueError(
            f'"{name}" height {h} must be divisible by sp={sp}')


def sp_batch_shardings(batch: dict, mesh: Mesh, *, sp: int,
                       leading_stack: bool = False) -> dict:
    """NamedShardings for a host batch dict under SP (validated)."""
    out = {}
    for k, v in batch.items():
        validate_spatial_divisibility(np.shape(v), sp, name=k,
                                      leading_stack=leading_stack)
        out[k] = NamedSharding(mesh, spatial_batch_spec(
            np.ndim(v), leading_stack=leading_stack))
    return out


def put_batch_sp(batch: dict, mesh: Mesh, *, sp: int,
                 leading_stack: bool = False) -> dict:
    """Device-put a host batch with DP×SP sharding."""
    shardings = sp_batch_shardings(batch, mesh, sp=sp,
                                   leading_stack=leading_stack)
    return {k: jax.device_put(v, shardings[k]) for k, v in batch.items()}


def auto_dp_sp_mesh(batch_size: int, num_devices: Optional[int],
                    sp: int, devices=None) -> Mesh:
    """DP×SP mesh for sampling: the SP analogue of mesh.auto_data_mesh.

    With `num_devices` given, dp = num_devices / sp (must divide); otherwise
    dp is the largest count dividing batch_size such that dp·sp devices are
    available — sp=anything with batch_size=1 gives dp=1, the
    single-huge-image case DP cannot serve at all.
    """
    if sp < 1:
        raise ValueError(f"sp must be >= 1, got {sp}")
    avail = len(devices) if devices is not None else len(jax.devices())
    if num_devices is not None:
        if num_devices % sp:
            raise ValueError(
                f"--num-devices {num_devices} must be divisible by sp={sp}")
        dp = num_devices // sp
    else:
        if avail < sp:
            raise ValueError(f"sp={sp} needs {sp} devices, have {avail}")
        dp = max(d for d in range(1, avail // sp + 1) if batch_size % d == 0)
    if batch_size % dp:
        raise ValueError(
            f"batch size {batch_size} must be divisible by the data-axis "
            f"size {dp}")
    return make_dp_sp_mesh(dp, sp, devices=(
        None if devices is None else devices[:dp * sp]))


def sampling_put_fn(batch_size: int, num_devices: Optional[int], sp: int):
    """(mesh, put) for the generator CLIs.

    sp == 1 reproduces the existing data-parallel sampling path exactly
    (mesh.auto_data_mesh + batch sharding). sp > 1 builds a (data, space)
    mesh and `put` shards image tensors (ndim >= 4) over batch AND H —
    sampling one huge image then spreads every U-Net activation as H/sp
    slabs across chips, the case plain DP (batch rows) cannot split.
    H-divisibility is validated per array.
    """
    if sp <= 1:
        from sdm_tpu.parallel.mesh import auto_data_mesh, batch_sharding
        mesh = auto_data_mesh(batch_size, num_devices)
        sharding = batch_sharding(mesh)

        def put(x):
            return jax.device_put(x, sharding) if x is not None else None
        return mesh, put

    mesh = auto_dp_sp_mesh(batch_size, num_devices, sp)

    def put(x):
        if x is None:
            return None
        validate_spatial_divisibility(np.shape(x), sp)
        return jax.device_put(
            x, NamedSharding(mesh, spatial_batch_spec(np.ndim(x))))
    return mesh, put
