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
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(os.path.abspath(path), template_state)
