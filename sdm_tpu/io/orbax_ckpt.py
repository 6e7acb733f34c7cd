"""Native JAX checkpointing via Orbax (optional, alongside the reference-
format torch .pt files).

The torch-format files (io/checkpoint.py) are the interop path; this is the
pure-JAX path for large-scale training: zero conversion cost, async-save
capable, and restores directly onto the current mesh/shardings. Enabled in
the training loop with config key "native_checkpoint": true (SURVEY.md §5.3:
"async checkpointing optional").
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np


def save_native(state, dest_path: str, steps: int, *, prefix: str = "native") -> str:
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(dest_path, "checkpoint",
                                        f"{prefix}_{steps}"))
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, jax.tree.map(np.asarray, state), force=True)
    return path


def load_native(path: str, template_state):
    """Restore a native checkpoint dir onto `template_state`'s structure.

    Every jax.Array leaf of the template is restored DIRECTLY onto its
    current sharding (mesh axes, FSDP/TP layouts) — each device reads only
    its own shard from disk, no replicated host copy is materialized. This
    is the point of the native path over the torch .pt interop format:
    resume cost scales with per-device state, not global state. Non-array
    leaves (host scalars) restore as saved.
    """
    import orbax.checkpoint as ocp

    def abstract(x):
        if isinstance(x, jax.Array):
            return jax.ShapeDtypeStruct(x.shape, x.dtype,
                                        sharding=x.sharding)
        return x

    template = jax.tree.map(abstract, template_state)
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(os.path.abspath(path), template)
