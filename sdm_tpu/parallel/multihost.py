"""Multi-host (multi-process) data parallelism.

The reference is single-process, single-device (SURVEY.md §2.10). This module
supplies the TPU-native scale-out path: `jax.distributed.initialize()` joins
the processes of a pod slice (or an explicit coordinator for CPU/GPU-style
launches), every process runs the same SPMD program over the global "data"
mesh, each host feeds only its own shard of the dataset, and batches are
assembled into global arrays with `jax.make_array_from_process_local_data`.
Parameters and optimizer state are replicated, so checkpoint/preview I/O runs
on process 0 only, from its process-local copy.

Launch contract (any one of):
  - TPU pod slice: set config "multihost": true — argless
    jax.distributed.initialize() auto-detects coordinator/topology.
  - Explicit (CPU/GPU-style): env SDM_COORDINATOR_ADDRESS, SDM_NUM_PROCESSES,
    SDM_PROCESS_ID (used verbatim; also how the 2-process CPU test runs).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

_initialized = False


def maybe_initialize(config_dict: Optional[dict] = None) -> bool:
    """Join the distributed runtime if requested. Returns True when running
    multi-process. Safe to call more than once (e.g. run_training invoked
    repeatedly in one process)."""
    global _initialized
    import jax

    explicit = os.environ.get("SDM_COORDINATOR_ADDRESS")
    wanted = bool((config_dict or {}).get("multihost", False)) or bool(explicit)
    if not wanted or _initialized:
        return jax.process_count() > 1
    try:
        if explicit:
            jax.distributed.initialize(
                coordinator_address=explicit,
                num_processes=int(os.environ["SDM_NUM_PROCESSES"]),
                process_id=int(os.environ["SDM_PROCESS_ID"]))
        else:
            jax.distributed.initialize()
    except RuntimeError as e:
        # jax.distributed exposes no public is-initialized probe; a repeat
        # call raises "should only be called once" — treat as already joined.
        if "only be called once" not in str(e):
            raise
    _initialized = True
    return jax.process_count() > 1


def is_main_process() -> bool:
    import jax
    return jax.process_index() == 0


def shard_indices(n: int, *, drop_remainder: bool = True):
    """This process's dataset indices: strided split, truncated so every
    process sees the same count (SPMD programs must run in lockstep)."""
    import jax
    pc, pi = jax.process_count(), jax.process_index()
    if pc == 1:
        return list(range(n))
    per = n // pc
    if per == 0:
        raise ValueError(f"dataset of {n} items cannot feed {pc} processes")
    idx = list(range(pi, n, pc))
    return idx[:per] if drop_remainder else idx


def put_global_batch(batch, mesh, axis_name: str = "data", spec=None):
    """Build global device arrays from this process's local batch rows.
    Local rows must be global_batch_size / process_count per process.
    `spec` overrides the partition spec (e.g. P(None, "data") for
    gradient-accumulation microbatch stacks)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, spec if spec is not None else P(axis_name))
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)),
        batch)


def replicate(tree, mesh):
    """Fully-replicated global arrays from identical per-process host values
    (params/optimizer state: every process inits them deterministically)."""
    import jax
    from jax.experimental import multihost_utils
    from jax.sharding import PartitionSpec as P

    if jax.process_count() == 1:
        from jax.sharding import NamedSharding
        return jax.device_put(tree, NamedSharding(mesh, P()))
    return multihost_utils.host_local_array_to_global_array(
        jax.tree.map(np.asarray, tree), mesh, P())


def localize(tree):
    """Per-process host copy of a fully-replicated global array tree (for
    process-0-only I/O like checkpoints and previews, which must not launch
    collective computations)."""
    import jax
    return jax.tree.map(lambda a: np.asarray(a), tree)


def barrier(tag: str = "sdm"):
    """Block until every process reaches this point."""
    import jax
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices(tag)
