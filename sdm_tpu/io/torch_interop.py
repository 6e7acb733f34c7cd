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


# ---------------------------------------------------------------------------
# Optimizer (Adam) state interop.
#
# torch serializes optimizer state keyed by *parameter index* in
# net.parameters() order, which follows module attribute registration order.
# The ranks below encode the reference U_Net's registration order
# (U_Net.py:49-130 and custom_layers.py) so we can reproduce that index
# order from a flax param tree without instantiating the torch model.
# ---------------------------------------------------------------------------

_ORDER_RANK = {
    # U_Net (U_Net.py:49-130)
    "cond_emb": 0, "in_layer": 1, "down_layers": 2, "middle_layer": 3,
    "up_layers": 4, "out_layers": 5,
    # ConditionalEmbedding (custom_layers.py:59-80)
    "time_layer": 0, "cond_layer": 1,
    # UNetBlock (custom_layers.py:309-334)
    "res_layers": 0, "attn_layers": 1, "out_layer": 2,
    # ResidualBlock (custom_layers.py:261-280)
    "conv_block_1": 0, "conv_block_2": 1, "shortcut": 2,
    # UNet_ConvBlock (custom_layers.py:223-238)
    "conv_layer": 0, "adagn": 1,
    # AdaGN (custom_layers.py:30-33)
    "y_scale": 0, "y_shift": 1, "group_norm": 2,
    # AttentionBlock (custom_layers.py:113-119)
    "norm": 0, "projection": 1, "output": 2,
    # leaves: weight before bias
    "kernel": 0, "scale": 0, "bias": 1,
}


def _component_key(comp: str):
    m = _SEQ_RE.match(comp)
    if m:
        return (_ORDER_RANK[m.group(1)], int(m.group(2)))
    return (_ORDER_RANK[comp], 0)


def torch_param_order(params: Dict[str, Any]):
    """Flax param paths sorted in torch `net.parameters()` order."""
    flat = _flatten(params)
    return sorted(flat.keys(), key=lambda path: tuple(_component_key(c) for c in path))


def _transpose_like_param(arr: np.ndarray, path: Tuple[str, ...],
                          to_torch: bool) -> np.ndarray:
    """Apply the same layout transform to a moment tensor as to its param."""
    module_parts, leaf = path[:-1], path[-1]
    if leaf == "kernel":
        if arr.ndim == 4:
            if _is_conv_transpose(tuple(module_parts)):
                return arr.transpose(2, 3, 0, 1)
            return arr.transpose(3, 2, 0, 1) if to_torch else arr.transpose(2, 3, 1, 0)
        if arr.ndim == 2:
            return arr.transpose(1, 0)
    return arr


def optax_adam_to_torch(opt_state, params: Dict[str, Any], lr: float) -> Dict[str, Any]:
    """Convert an optax.adam state into a torch.optim.Adam state_dict
    (betas=(0.5,0.999), matching train_diffusion.py:214-217) so the reference
    can resume from our checkpoints with load_diffusion_optim=True."""
    import torch

    adam_state = _find_adam_state(opt_state)
    count = int(np.asarray(adam_state.count))
    mu_flat = _flatten(_to_plain(adam_state.mu))
    nu_flat = _flatten(_to_plain(adam_state.nu))
    order = torch_param_order(params)

    state = {}
    for idx, path in enumerate(order):
        state[idx] = {
            "step": torch.tensor(float(count)),
            # np.array (not asarray): a jax export is read-only and
            # torch.from_numpy would alias it and warn — always copy
            # (CLAUDE.md converter rule).
            "exp_avg": torch.from_numpy(np.ascontiguousarray(
                _transpose_like_param(np.array(mu_flat[path], np.float32),
                                      path, to_torch=True))),
            "exp_avg_sq": torch.from_numpy(np.ascontiguousarray(
                _transpose_like_param(np.array(nu_flat[path], np.float32),
                                      path, to_torch=True))),
        }
    return {
        "state": state,
        "param_groups": [{
            "lr": float(lr), "betas": (0.5, 0.999), "eps": 1e-8,
            "weight_decay": 0, "amsgrad": False, "maximize": False,
            "foreach": None, "capturable": False, "differentiable": False,
            "fused": None, "params": list(range(len(order))),
        }],
    }


def torch_adam_to_optax(torch_sd: Dict[str, Any], params: Dict[str, Any],
                        template_opt_state):
    """Load a torch Adam state_dict (reference checkpoint "optimizer" entry)
    into an optax.adam state matching `params`' tree structure."""
    order = torch_param_order(params)
    state = torch_sd["state"]
    # torch may key state with int or str indices.
    get = lambda i: state[i] if i in state else state[str(i)]

    mu_flat, nu_flat = {}, {}
    count = 0
    for idx, path in enumerate(order):
        entry = get(idx)
        count = int(np.asarray(_to_numpy(entry["step"])))
        mu_flat[path] = _transpose_like_param(
            _to_numpy(entry["exp_avg"]).astype(np.float32), path, to_torch=False)
        nu_flat[path] = _transpose_like_param(
            _to_numpy(entry["exp_avg_sq"]).astype(np.float32), path, to_torch=False)

    import jax.numpy as jnp
    mu = _cast_tree_like(_unflatten(mu_flat), params)
    nu = _cast_tree_like(_unflatten(nu_flat), params)

    # Fresh array per state: sharing one count buffer across chained optax
    # states would make jit donation see the same buffer twice.
    def new_count():
        return jnp.array(count, jnp.int32)

    def replace_states(node):
        if hasattr(node, "_fields"):  # NamedTuple optax state
            updates = {}
            if "count" in node._fields:
                updates["count"] = new_count()
            if "mu" in node._fields:
                updates["mu"] = mu
            if "nu" in node._fields:
                updates["nu"] = nu
            node = node._replace(**updates) if updates else node
            return type(node)(*[replace_states(x) if _is_state(x) else x
                                for x in node])
        if isinstance(node, tuple):
            return tuple(replace_states(x) if _is_state(x) else x for x in node)
        return node

    def _is_state(x):
        return hasattr(x, "_fields") or isinstance(x, tuple)

    return replace_states(template_opt_state)


def _find_adam_state(opt_state):
    """Locate the ScaleByAdamState (has mu/nu/count) inside a chained state."""
    if hasattr(opt_state, "_fields") and {"mu", "nu", "count"} <= set(opt_state._fields):
        return opt_state
    if isinstance(opt_state, tuple):
        for item in opt_state:
            try:
                return _find_adam_state(item)
            except ValueError:
                continue
    raise ValueError("No Adam state found in optimizer state")


def _to_plain(tree):
    """flax FrozenDict / dict tree -> plain nested dict of numpy arrays."""
    if hasattr(tree, "items"):
        return {k: _to_plain(v) for k, v in tree.items()}
    return np.asarray(tree)


def _cast_tree_like(tree, like):
    import jax.numpy as jnp
    if hasattr(like, "items"):
        return {k: _cast_tree_like(tree[k], v) for k, v in like.items()}
    return jnp.asarray(tree)


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
