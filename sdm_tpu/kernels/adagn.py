"""Fused AdaGN Pallas kernel: GroupNorm statistics + affine + FiLM modulation
in one HBM pass.

The XLA path computes GroupNorm (two reductions + normalize) and then the
FiLM scale/shift as separate elementwise stages; this kernel loads each
sample's (H*W, C) tile into VMEM once, derives per-group statistics with a
channel->group one-hot contraction on the MXU (the channel axis stays the
lane dimension — no awkward (..., G, C/G) retiling), folds GN affine + FiLM
into a single per-channel multiply-add, and writes the output once.

Numerics match sdm_tpu.ops.norms.group_norm + the FiLM epilogue (torch
GroupNorm semantics: contiguous channel groups, biased variance, eps inside
sqrt). Backward recomputes through the XLA reference (rematerialization).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from sdm_tpu.ops.norms import group_norm


def _xla_adagn(x, gn_scale, gn_bias, mod_scale, mod_shift, num_groups, eps):
    x_gn = group_norm(x, gn_scale, gn_bias, num_groups, eps)
    return mod_scale[:, None, None, :] * x_gn + mod_shift[:, None, None, :]


def _adagn_kernel(x_ref, gnw_ref, gnb_ref, ms_ref, mt_ref, o_ref, *,
                  num_groups: int, eps: float, spatial: int):
    x = x_ref[0].astype(jnp.float32)          # (HW, C)
    c = x.shape[-1]
    cg = c // num_groups

    # Channel -> group one-hot (C, G): contiguous channel groups.
    chan = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 0)
    grp = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 1)
    onehot = (chan // cg == grp).astype(jnp.float32)

    colsum = jnp.sum(x, axis=0)                # (C,)
    colsumsq = jnp.sum(x * x, axis=0)          # (C,)
    denom = float(spatial * cg)
    gsum = jnp.dot(colsum[None, :], onehot,
                   preferred_element_type=jnp.float32)[0]      # (G,)
    gsumsq = jnp.dot(colsumsq[None, :], onehot,
                     preferred_element_type=jnp.float32)[0]    # (G,)
    gmean = gsum / denom
    gvar = gsumsq / denom - gmean * gmean      # biased variance
    ginv = jax.lax.rsqrt(gvar + eps)

    # Broadcast group stats back to channels: (G,) @ (G, C) one-hot^T.
    cmean = jnp.dot(gmean[None, :], onehot.T,
                    preferred_element_type=jnp.float32)[0]
    cinv = jnp.dot(ginv[None, :], onehot.T,
                   preferred_element_type=jnp.float32)[0]

    gamma = gnw_ref[:].astype(jnp.float32)
    beta = gnb_ref[:].astype(jnp.float32)
    # Select this sample's FiLM row with a one-hot contraction — dynamic
    # sublane indexing of bf16 VMEM rows is not supported by Mosaic.
    i = pl.program_id(0)
    nrows = ms_ref.shape[0]
    row_onehot = (jax.lax.broadcasted_iota(jnp.int32, (1, nrows), 1)
                  == i).astype(jnp.float32)
    s = jnp.dot(row_onehot, ms_ref[:].astype(jnp.float32),
                preferred_element_type=jnp.float32)[0]   # (C,) FiLM scale
    t = jnp.dot(row_onehot, mt_ref[:].astype(jnp.float32),
                preferred_element_type=jnp.float32)[0]   # (C,) FiLM shift

    # s * ((x - m) * inv * gamma + beta) + t == x * a + b
    a = cinv * gamma * s
    b = s * (beta - cmean * cinv * gamma) + t
    o_ref[0] = (x * a[None, :] + b[None, :]).astype(o_ref.dtype)


def _pallas_adagn(x, gn_scale, gn_bias, mod_scale, mod_shift, num_groups, eps):
    """Partitions over the batch axis under a sharded jit (x and the FiLM
    tables shard together; GN affine params replicate) — see
    kernels/partitioning.py."""
    from sdm_tpu.kernels.partitioning import tpu_interpret_mode
    if tpu_interpret_mode():
        return _pallas_adagn_impl(x, gn_scale, gn_bias, mod_scale, mod_shift,
                                  num_groups, eps)
    return _adagn_p(num_groups, eps)(x, gn_scale, gn_bias, mod_scale,
                                     mod_shift)


@functools.lru_cache(maxsize=None)
def _adagn_p(num_groups: int, eps: float):
    from sdm_tpu.kernels.partitioning import batch_partitioned
    return batch_partitioned(
        lambda x, gw, gb, ms, mt: _pallas_adagn_impl(
            x, gw, gb, ms, mt, num_groups, eps),
        "n h w c, c, c, n c, n c -> n h w c",
        need_replication=("h", "w", "c"),
        batch_argnums=(0, 3, 4))


def _pallas_adagn_impl(x, gn_scale, gn_bias, mod_scale, mod_shift,
                       num_groups, eps):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, h, w, c = x.shape
    x2 = x.reshape(n, h * w, c)
    # Output dtype follows jnp promotion (the FiLM multiply in _xla_adagn
    # promotes) so both code paths of the custom_vjp agree for any input
    # dtype mix — e.g. bf16 x with fp32 FiLM tables.
    out_dtype = jnp.result_type(x.dtype, mod_scale.dtype, mod_shift.dtype)
    kernel = functools.partial(_adagn_kernel, num_groups=num_groups, eps=eps,
                               spatial=h * w)
    o2 = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h * w, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
            # Whole (N, C) FiLM tables resident in VMEM; the kernel indexes
            # its row by program_id (a (1, C) row block would violate the
            # TPU (8, 128) tiling rule).
            pl.BlockSpec((n, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h * w, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h * w, c), out_dtype),
    )(x2, gn_scale, gn_bias, mod_scale, mod_shift)
    return o2.reshape(n, h, w, c)


# Measured kernel VMEM peak is ~8 bytes/element (bf16 in + fp32 working copy
# + output); stay under the 16 MB scoped-vmem limit with margin. Larger tiles
# (e.g. 128x128x128 first-layer activations) fall back to XLA.
_VMEM_BUDGET_BYTES = 12 * 1024 * 1024


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def fused_adagn(x, gn_scale, gn_bias, mod_scale, mod_shift,
                num_groups: int, eps: float = 1e-5):
    """x: (N,H,W,C); gn_scale/gn_bias: (C,); mod_scale/mod_shift: (N,C)."""
    return _fused_adagn_impl(x, gn_scale, gn_bias, mod_scale, mod_shift,
                             num_groups, eps)


def _fused_adagn_impl(x, gn_scale, gn_bias, mod_scale, mod_shift,
                      num_groups, eps):
    n, h, w, c = x.shape
    tile_bytes = h * w * c * 8
    if c % 128 != 0 or c % num_groups != 0 or tile_bytes > _VMEM_BUDGET_BYTES:
        return _xla_adagn(x, gn_scale, gn_bias, mod_scale, mod_shift,
                          num_groups, eps)
    return _pallas_adagn(x, gn_scale, gn_bias, mod_scale, mod_shift,
                         num_groups, eps)


def _fwd(x, gn_scale, gn_bias, mod_scale, mod_shift, num_groups, eps):
    out = _fused_adagn_impl(x, gn_scale, gn_bias, mod_scale, mod_shift,
                            num_groups, eps)
    return out, (x, gn_scale, gn_bias, mod_scale, mod_shift)


def _bwd(num_groups, eps, residuals, g):
    x, gn_scale, gn_bias, mod_scale, mod_shift = residuals
    _, vjp = jax.vjp(
        lambda *args: _xla_adagn(*args, num_groups, eps),
        x, gn_scale, gn_bias, mod_scale, mod_shift)
    return vjp(g)


fused_adagn.defvjp(_fwd, _bwd)
