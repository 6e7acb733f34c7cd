"""Fully-sharded data parallelism (ZeRO-3 style) over the "data" mesh axis.

The reference has no distributed code at all (SURVEY.md §2.10), and plain DP
replicates parameters and Adam moments on every chip — ~1.5 GB for the
flagship U-Net (127 M params, fp32 + two Adam moments). FSDP shards every
large leaf of the train state over the *data* axis instead, so at-rest state
memory drops by ~n_devices, freeing HBM for activations (bigger batches /
resolutions per chip). This is the scaling-book recipe, not a torch-FSDP
port: we only *annotate* shardings; XLA's SPMD partitioner then turns the
gradient all-reduce into a reduce-scatter to the sharded layout and inserts
an all-gather where each parameter is consumed — numerics are unchanged by
construction (sharding annotations never change math), asserted by
tests/test_fsdp.py against the single-device step.

Composes with tensor parallelism: `extend_spec` only claims dimensions the
TP sharding (parallel/tp.py) left unsharded, so a 2-D ("data", "model") mesh
can run dp+tp+fsdp together (exercised by the driver dryrun). Composes with
multi-host DP too: checkpoint/preview I/O all-gathers the sharded state back
to the replicated layout as a collective every process runs (train/loop.py
submit_checkpoint), then process 0 saves from its local copy — pinned by the
2-process test in tests/test_multihost.py.

Enable via config `"fsdp": true` (train loop) — default off keeps the
replicated parity behavior.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def extend_spec(shape, spec: P, n: int, axis: str,
                min_size: int) -> P:
    """Add `axis` to one unclaimed dimension of `spec` (the largest one
    divisible by n), or return `spec` unchanged when no dimension qualifies
    or the leaf is too small to be worth scattering."""
    if n <= 1 or int(np.prod(shape, dtype=np.int64)) < min_size:
        return spec
    entries = list(spec) + [None] * (len(shape) - len(spec))
    best, best_size = None, 0
    for i, (dim, taken) in enumerate(zip(shape, entries)):
        if taken is None and dim % n == 0 and dim > best_size:
            best, best_size = i, dim
    if best is None:
        return spec
    entries[best] = axis
    return P(*entries)


def fsdp_shardings(tree, mesh: Mesh, *, axis: str = "data",
                   min_size: int = 2 ** 15, base=None):
    """Pytree of NamedShardings for `tree` (params, a whole TrainState, or
    any state subtree): each array leaf of at least `min_size` elements gets
    its largest `axis`-divisible dimension sharded over `axis`; smaller
    leaves and scalars (Adam counts, the step counter) stay replicated.

    `base` (optional) is a matching pytree of NamedShardings to extend —
    e.g. tp_param_shardings output — so FSDP claims a *different* dimension
    than TP did."""
    n = mesh.shape[axis]

    def leaf(x, b):
        shape = np.shape(x)
        spec = b.spec if b is not None else P()
        return NamedSharding(mesh, extend_spec(shape, spec, n, axis, min_size))

    if base is None:
        return jax.tree.map(lambda x: leaf(x, None), tree)
    return jax.tree.map(leaf, tree, base)


def shard_state_fsdp(state, mesh: Mesh, *, axis: str = "data",
                     min_size: int = 2 ** 15, base_params=None):
    """Reshard a (replicated, device- or host-resident) TrainState to the
    FSDP layout. Returns (state, shardings); pass `shardings` as the step
    jit's out_shardings so the updated state stays sharded.

    Uses a jitted identity reshard rather than device_put so it also works
    when the replicated state is already a global multi-process array."""
    shardings = fsdp_shardings(state, mesh, axis=axis, min_size=min_size)
    if base_params is not None:
        # Compose on top of TP: params extend the TP specs (FSDP claims a
        # different dimension than TP did); Adam moments / EMA keep the
        # plain shape rule — they are only read inside the optimizer update,
        # which GSPMD reshards as needed.
        shardings = shardings.replace(params=fsdp_shardings(
            state.params, mesh, axis=axis, min_size=min_size,
            base=base_params))
    resharded = jax.jit(lambda s: s, out_shardings=shardings)(state)
    return resharded, shardings


def state_bytes_per_device(state) -> int:
    """Largest per-device footprint of the state's addressable shards —
    the number FSDP exists to shrink."""
    per_dev: dict = {}
    for leaf in jax.tree.leaves(state):
        if not hasattr(leaf, "addressable_shards"):
            continue
        for s in leaf.addressable_shards:
            per_dev[s.device] = per_dev.get(s.device, 0) + s.data.nbytes
    return max(per_dev.values()) if per_dev else 0
