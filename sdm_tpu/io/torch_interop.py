"""Bidirectional torch <-> JAX parameter conversion for U-Net checkpoints.

The reference saves `{"model": state_dict, "optimizer": state_dict}` via
torch.save (/root/reference/utils/utils.py:67-83, train_diffusion.py:392-394).
This module maps those state dicts onto the flax param pytree of
sdm_tpu.models.UNet and back, so checkpoints are interchangeable between the
two frameworks (including the reference's dead weights: AdaGN.y_shift,
custom_layers.py:31, and AttentionBlock.norm, custom_layers.py:113).

Name mapping: the flax modules were deliberately named after the torch
attribute paths, with Sequential/ModuleList indices folded into the name —
torch "down_layers.0.res_layers.1.conv_block_1.conv_layer.0.weight" becomes
flax path ("down_layers_0", "res_layers_1", "conv_block_1", "conv_layer_0",
"kernel").

Tensor layout mapping:
  - Conv2d weight (out,in,kh,kw)          -> HWIO (kh,kw,in,out)
  - ConvTranspose2d weight (in,out,kh,kw) -> (kh,kw,in,out) torch-oriented
    (the spatial flip lives inside sdm_tpu.ops.conv.conv_transpose2d)
  - Linear weight (out,in)                -> (in,out)
  - GroupNorm weight/bias                 -> scale/bias
"""

from __future__ import annotations

import re
from typing import Any, Dict, Iterable, Tuple

import numpy as np

# Attribute names that are torch Sequential/ModuleList containers, whose
# numeric indices are folded into flax module names ("in_layer.0" ->
# "in_layer_0"). Everything else keeps underscores literally (conv_block_1,
# y_scale, group_norm, out_layer, cond_emb...).
_SEQ_CONTAINERS = frozenset({
    "in_layer", "down_layers", "middle_layer", "up_layers", "out_layers",
    "res_layers", "attn_layers", "conv_layer", "time_layer", "cond_layer",
})

_SEQ_RE = re.compile(
    r"^(" + "|".join(sorted(_SEQ_CONTAINERS)) + r")_(\d+)$")


def _torch_path_to_flax(parts: Iterable[str]) -> Tuple[str, ...]:
    out = []
    for p in parts:
        if p.isdigit() and out:
            out[-1] = f"{out[-1]}_{p}"
        else:
            out.append(p)
    return tuple(out)


def _flax_component_to_torch(comp: str) -> Tuple[str, ...]:
    m = _SEQ_RE.match(comp)
    if m:
        return (m.group(1), m.group(2))
    return (comp,)


def _is_conv_transpose(flax_path: Tuple[str, ...]) -> bool:
    # The only ConvTranspose2d in the architecture lives at
    # up_layers_*.out_layer.conv_layer_0 (UpsampleBlock,
    # custom_layers.py:169-185).
    return (len(flax_path) >= 3
            and flax_path[-3].startswith("up_layers")
            and flax_path[-2] == "out_layer"
            and flax_path[-1] == "conv_layer_0")


def torch_state_dict_to_params(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Convert a torch U_Net state_dict (tensor or numpy values) into a flax
    params dict (plain nested dict of numpy arrays)."""
    params: Dict[str, Any] = {}
    for key, value in state_dict.items():
        arr = _to_numpy(value)
        *module_parts, leaf = key.split(".")
        flax_path = _torch_path_to_flax(module_parts)
        if leaf == "weight":
            if arr.ndim == 4:
                if _is_conv_transpose(flax_path):
                    arr = arr.transpose(2, 3, 0, 1)  # (in,out,kh,kw)->(kh,kw,in,out)
                else:
                    arr = arr.transpose(2, 3, 1, 0)  # (out,in,kh,kw)->HWIO
                leaf_name = "kernel"
            elif arr.ndim == 2:
                arr = arr.transpose(1, 0)            # (out,in)->(in,out)
                leaf_name = "kernel"
            elif arr.ndim == 1:
                leaf_name = "scale"                   # GroupNorm affine weight
            else:
                raise ValueError(f"Unexpected weight rank for {key}: {arr.shape}")
        elif leaf == "bias":
            leaf_name = "bias"
        else:
            raise ValueError(f"Unexpected torch leaf {key!r}")
        node = params
        for part in flax_path:
            node = node.setdefault(part, {})
        node[leaf_name] = np.ascontiguousarray(arr)
    return params


def params_to_torch_state_dict(params: Dict[str, Any]) -> Dict[str, Any]:
    """Convert a flax params dict back into a torch-layout state_dict of
    torch tensors (torch.save-able, loadable by the reference)."""
    import torch

    flat = _flatten(params)
    state_dict: Dict[str, Any] = {}
    for path, arr in flat.items():
        arr = np.asarray(arr)
        *module_parts, leaf = path
        torch_parts: list = []
        for comp in module_parts:
            torch_parts.extend(_flax_component_to_torch(comp))
        if leaf == "kernel":
            if arr.ndim == 4:
                if _is_conv_transpose(tuple(module_parts)):
                    arr = arr.transpose(2, 3, 0, 1)  # (kh,kw,in,out)->(in,out,kh,kw)
                else:
                    arr = arr.transpose(3, 2, 0, 1)  # HWIO->(out,in,kh,kw)
            elif arr.ndim == 2:
                arr = arr.transpose(1, 0)
            torch_leaf = "weight"
        elif leaf == "scale":
            torch_leaf = "weight"
        elif leaf == "bias":
            torch_leaf = "bias"
        else:
            raise ValueError(f"Unexpected flax leaf {path!r}")
        torch_key = ".".join(torch_parts + [torch_leaf])
        state_dict[torch_key] = torch.from_numpy(
            np.ascontiguousarray(arr.astype(np.float32)))
    return state_dict


def merge_partial_params(own_params: Dict[str, Any], loaded: Dict[str, Any],
                         log=print) -> Dict[str, Any]:
    """Partial-load semantics of the reference's custom_load_state_dict
    (U_Net.py:132-145): skip keys missing from the model and keys whose shape
    mismatches, keeping the model's own values there."""
    own_flat = _flatten(own_params)
    loaded_flat = _flatten(loaded)
    out = dict(own_flat)
    for path, arr in loaded_flat.items():
        if path not in own_flat:
            log(f"No Layer found: {'.'.join(path)}, skipping")
            continue
        if tuple(np.shape(own_flat[path])) != tuple(np.shape(arr)):
            log(f"Skipped: {'.'.join(path)}")
            continue
        out[path] = np.asarray(arr, dtype=np.asarray(own_flat[path]).dtype)
    return _unflatten(out)


def _to_numpy(value) -> np.ndarray:
    # Always copy: torch's .numpy() aliases the live parameter storage, and a
    # later optimizer step would silently mutate the converted array.
    if hasattr(value, "detach"):
        return value.detach().cpu().numpy().copy()
    return np.array(value)


def _flatten(tree: Dict[str, Any], prefix: Tuple[str, ...] = ()) -> Dict[Tuple[str, ...], Any]:
    flat: Dict[Tuple[str, ...], Any] = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            flat.update(_flatten(v, prefix + (k,)))
        else:
            flat[prefix + (k,)] = v
    return flat


def _unflatten(flat: Dict[Tuple[str, ...], Any]) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for path, v in flat.items():
        node = tree
        for part in path[:-1]:
            node = node.setdefault(part, {})
        node[path[-1]] = v
    return tree
