"""Normalization primitives (NHWC, torch-GroupNorm-compatible semantics).

`group_norm` reproduces torch.nn.GroupNorm numerics exactly (contiguous channel
groups, biased variance, eps inside the sqrt, per-channel affine) so converted
reference checkpoints (/root/reference/models/custom_layers.py:33) evaluate
identically. It is written as a pure function so the Pallas fused AdaGN kernel
(sdm_tpu/kernels/adagn.py) can be validated against it and swapped in.
"""

from __future__ import annotations

import jax.numpy as jnp


def group_norm(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
               num_groups: int, eps: float = 1e-5) -> jnp.ndarray:
    """GroupNorm over the channel (last) axis of an NHWC (or N...C) tensor.

    Statistics are computed per (batch, group) over all spatial positions and
    the channels inside the group, matching torch.nn.GroupNorm on NCHW.
    """
    orig_dtype = x.dtype
    n = x.shape[0]
    c = x.shape[-1]
    if c % num_groups != 0:
        raise ValueError(f"channels {c} not divisible by groups {num_groups}")
    spatial = x.shape[1:-1]
    # (N, S, G, C/G): group stats reduce over S and C/G.
    xg = x.astype(jnp.float32).reshape(n, -1, num_groups, c // num_groups)
    mean = jnp.mean(xg, axis=(1, 3), keepdims=True)
    var = jnp.mean(jnp.square(xg - mean), axis=(1, 3), keepdims=True)
    xn = (xg - mean) * jnp.reciprocal(jnp.sqrt(var + eps))
    xn = xn.reshape(n, *spatial, c)
    out = xn * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return out.astype(orig_dtype)
