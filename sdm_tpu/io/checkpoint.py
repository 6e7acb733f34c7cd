"""Checkpoint save/load in the reference's formats.

Parity with /root/reference/utils/utils.py:67-95: `save_model` writes
torch.save files to `{dest}/checkpoint|models/{file_name}_{steps}.pt`;
`load_checkpoint` returns `(ok, dict)` with map_location CPU. Model
checkpoints are `{"model": <torch state_dict>, "optimizer": <torch Adam
state_dict>}` (train_diffusion.py:392-394), written from JAX state via
sdm_tpu.io.torch_interop so the reference can load them unchanged, and vice
versa. Config checkpoints are small dicts of python scalars
({starting_epoch, global_steps[, beta_1, beta_T]}, train_diffusion.py:375-381).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import numpy as np

from sdm_tpu.io.torch_interop import (
    params_to_torch_state_dict,
    optax_adam_to_torch,
    torch_state_dict_to_params,
    torch_adam_to_optax,
    merge_partial_params,
)


def save_model(model_net: Any, file_name: str, dest_path: str,
               checkpoint: bool = False, steps: int = 0, log=print) -> bool:
    """torch.save `model_net` to {dest}/checkpoint|models/{file_name}_{steps}.pt."""
    import torch
    try:
        sub = "checkpoint" if checkpoint else "models"
        f_path = os.path.join(dest_path, sub)
        os.makedirs(f_path, exist_ok=True)
        torch.save(model_net, os.path.join(f_path, f"{file_name}_{steps}.pt"))
        return True
    except Exception as e:
        log(f"Exception occured while saving model: {e}.")
        return False


def load_checkpoint(checkpoint_path: str, log=print) -> Tuple[bool, Optional[dict]]:
    import torch
    if os.path.exists(checkpoint_path):
        log(f"Loading checkpoint: {checkpoint_path}")
        try:
            ckpt = torch.load(checkpoint_path, map_location=torch.device("cpu"),
                              weights_only=False)
            return True, ckpt
        except Exception:
            return False, None
    log("Checkpoint does not exist.")
    return False, None


def diffusion_checkpoint_dict(params, opt_state=None, lr: float = 0.0,
                              ema_params=None) -> Dict[str, Any]:
    """Build the reference-format model checkpoint from JAX training state.

    `ema_params` (config "ema_decay" extension) is stored under an extra
    "ema" key in the same torch state-dict naming as "model" — the
    reference's loader only reads "model"/"optimizer" (train_diffusion.py:
    207-220), so EMA-carrying checkpoints stay loadable there unchanged."""
    import jax
    params_np = jax.tree.map(np.asarray, params)
    out = {"model": params_to_torch_state_dict(params_np)}
    if opt_state is not None:
        out["optimizer"] = optax_adam_to_torch(opt_state, params_np, lr)
    if ema_params is not None:
        ema_np = jax.tree.map(np.asarray, ema_params)
        out["ema"] = params_to_torch_state_dict(ema_np)
    return out


def load_params_from_checkpoint(ckpt: dict, own_params, log=print,
                                key: str = "model"):
    """Reference custom_load_state_dict semantics: partial load, skipping
    missing/mismatched keys (U_Net.py:132-145). `key` selects which
    state dict to read ("model", or "ema" for EMA-resume)."""
    import jax
    converted = torch_state_dict_to_params(ckpt[key])
    own_np = jax.tree.map(np.asarray, own_params)
    return merge_partial_params(own_np, converted, log=log)


def load_optimizer_from_checkpoint(ckpt: dict, params, template_opt_state):
    return torch_adam_to_optax(ckpt["optimizer"],
                               _np_tree(params), template_opt_state)


def _np_tree(tree):
    import jax
    return jax.tree.map(np.asarray, tree)
