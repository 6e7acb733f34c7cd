"""Streaming query-axis-softmax attention (Pallas, TPU) for large token grids.

The reference's AttentionBlock normalizes the score matrix over the *query*
axis (custom_layers.py:147): P[:, j] = softmax_i(A[:, j]), out = P @ V. XLA
materializes the S x S score matrix (and saves it for backward), which at
S = 4096 (the 256x256 SR models' layer-2 grid, SURVEY.md §5.7) is a 64 MB
fp32 tensor *per batch-head* — training at batch 128 flat-OOMs (VERDICT.md
weakness 3). These kernels never materialize more than a (Ti, Tj) score tile:

Forward (two-pass — query-axis softmax admits exact streaming because each
column's normalizer only needs a max/sum over queries):
  F1 stats:  grid (BH, Sj/Tj, Si/Ti)  running m_j / l_j over query chunks
             (flash-style rescaled accumulation, fp32).
  F2 apply:  grid (BH, Si/Ti, Sj/Tj)  out_i += (exp(s - m_j)/l_j) @ V_j,
             fp32 accumulation over the innermost j dimension.

Backward (custom VJP; residuals are q, k, v and the column stats m, l —
O(S) extra memory instead of the O(S^2) score matrix):
  Let P_ij = exp(scale*q_i.k_j - m_j)/l_j (recomputed per tile). Then
    dV = P^T g
    c_j = sum_d dV_jd V_jd           (the softmax-Jacobian correction term:
                                      c_j = sum_i P_ij dP_ij, computed
                                      cheaply from dV — one XLA rowsum)
    dA = P * (g V^T - c)             (softmax backward over the query axis)
    dQ = scale * dA K,  dK = scale * dA^T Q
  B1 computes dV (accumulate over i), then c in XLA, then B2 (dK, over i)
  and B3 (dQ, over j) recompute P/dA tile-by-tile.

All matmuls run on the MXU with fp32 accumulation; every block is
(tile, D) <= ~1 MB so VMEM stays far under budget at any S. Numerical
equivalence vs the XLA reference (fwd + grads) is pinned in
tests/test_kernels.py; the memory claim (256^2 SR at batch 128 without
grad-accum) is exercised on real TPU via bench/ablation runs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from sdm_tpu.kernels.partitioning import batch_partitioned, tpu_interpret_mode

_TILE = 256  # (Ti, Tj) score tiles: 256x256 fp32 = 256 KB in VMEM.


# Attention is embarrassingly parallel over the (batch*heads) axis, so the
# kernels partition over dim 0 (s/d and the stats' unit dim stay whole per
# device for the tiling); interpret-mode (CPU test) callers bypass the
# wrapper and call the raw pipelines — see kernels/partitioning.py.
@functools.lru_cache(maxsize=None)
def _forward_p(scale: float):
    return batch_partitioned(
        lambda q, k, v: _forward(q, k, v, scale),
        "b s d, b s d, b s d -> b s d, b u s, b u s",
        need_replication=("s", "d", "u"))


@functools.lru_cache(maxsize=None)
def _backward_p(scale: float):
    return batch_partitioned(
        lambda q, k, v, m, l, g: _backward(q, k, v, m, l, g, scale),
        "b s d, b s d, b s d, b u s, b u s, b s d -> b s d, b s d, b s d",
        need_replication=("s", "d", "u"))


def supports(s: int, d: int, softmax_axis: str) -> bool:
    """Static-shape admission: S divisible by the tile, D lane-aligned."""
    return (softmax_axis == "q" and s % _TILE == 0 and s >= 2 * _TILE
            and d % 128 == 0)


def _dot(a, b, dims):
    return jax.lax.dot_general(a, b, dimension_numbers=(dims, ((), ())),
                               preferred_element_type=jnp.float32)


def _score_tile(q_ref, k_ref, scale):
    """(Ti, Tj) fp32 score tile: scale * q_i @ k_j^T."""
    return _dot(q_ref[0], k_ref[0], ((1,), (1,))) * scale


def _stats_kernel(q_ref, k_ref, m_ref, l_ref, *, scale):
    s = _score_tile(q_ref, k_ref, scale)          # (Ti, Tj)
    chunk_max = jnp.max(s, axis=0)                # (Tj,)

    @pl.when(pl.program_id(2) == 0)
    def _init():
        m_ref[0, 0] = chunk_max
        l_ref[0, 0] = jnp.sum(jnp.exp(s - chunk_max[None, :]), axis=0)

    @pl.when(pl.program_id(2) != 0)
    def _update():
        m_old = m_ref[0, 0]
        m_new = jnp.maximum(m_old, chunk_max)
        l_ref[0, 0] = (l_ref[0, 0] * jnp.exp(m_old - m_new)
                       + jnp.sum(jnp.exp(s - m_new[None, :]), axis=0))
        m_ref[0, 0] = m_new


def _apply_kernel(q_ref, k_ref, v_ref, m_ref, l_ref, o_ref, *, scale):
    s = _score_tile(q_ref, k_ref, scale)
    p = jnp.exp(s - m_ref[0, 0][None, :]) / l_ref[0, 0][None, :]
    o = _dot(p.astype(v_ref.dtype), v_ref[0], ((1,), (0,)))  # (Ti, D) fp32

    @pl.when(pl.program_id(2) == 0)
    def _init():
        o_ref[0] = o

    @pl.when(pl.program_id(2) != 0)
    def _acc():
        o_ref[0] += o


def _dv_kernel(q_ref, k_ref, g_ref, m_ref, l_ref, dv_ref, *, scale):
    s = _score_tile(q_ref, k_ref, scale)
    p = jnp.exp(s - m_ref[0, 0][None, :]) / l_ref[0, 0][None, :]
    dv = _dot(p.astype(g_ref.dtype), g_ref[0], ((0,), (0,)))  # (Tj, D)

    @pl.when(pl.program_id(2) == 0)
    def _init():
        dv_ref[0] = dv

    @pl.when(pl.program_id(2) != 0)
    def _acc():
        dv_ref[0] += dv


def _da_tile(q_ref, k_ref, v_ref, g_ref, m_ref, l_ref, c_ref, scale):
    s = _score_tile(q_ref, k_ref, scale)
    p = jnp.exp(s - m_ref[0, 0][None, :]) / l_ref[0, 0][None, :]
    dp = _dot(g_ref[0], v_ref[0], ((1,), (1,)))               # (Ti, Tj)
    return p * (dp - c_ref[0, 0][None, :])


def _dk_kernel(q_ref, k_ref, v_ref, g_ref, m_ref, l_ref, c_ref, dk_ref, *,
               scale):
    da = _da_tile(q_ref, k_ref, v_ref, g_ref, m_ref, l_ref, c_ref, scale)
    dk = _dot(da.astype(q_ref.dtype), q_ref[0], ((0,), (0,))) * scale

    @pl.when(pl.program_id(2) == 0)
    def _init():
        dk_ref[0] = dk

    @pl.when(pl.program_id(2) != 0)
    def _acc():
        dk_ref[0] += dk


def _dq_kernel(q_ref, k_ref, v_ref, g_ref, m_ref, l_ref, c_ref, dq_ref, *,
               scale):
    da = _da_tile(q_ref, k_ref, v_ref, g_ref, m_ref, l_ref, c_ref, scale)
    dq = _dot(da.astype(k_ref.dtype), k_ref[0], ((1,), (0,))) * scale

    @pl.when(pl.program_id(2) == 0)
    def _init():
        dq_ref[0] = dq

    @pl.when(pl.program_id(2) != 0)
    def _acc():
        dq_ref[0] += dq


def _specs(bh, s, d):
    """Shared BlockSpec builders; grid layout is (bh, outer, inner)."""
    tile = _TILE

    def row_blk(which):  # q/g chunks along the query axis
        idx = ((lambda b, j, i: (b, i, 0)) if which == "inner"
               else (lambda b, i, j: (b, i, 0)))
        return pl.BlockSpec((1, tile, d), idx, memory_space=pltpu.VMEM)

    def col_blk(which):  # k/v chunks along the key axis
        idx = ((lambda b, j, i: (b, j, 0)) if which == "outer"
               else (lambda b, i, j: (b, j, 0)))
        return pl.BlockSpec((1, tile, d), idx, memory_space=pltpu.VMEM)

    def stat_blk(which):  # m/l/c chunks along the key axis, (BH, 1, S)
        idx = ((lambda b, j, i: (b, 0, j)) if which == "outer"
               else (lambda b, i, j: (b, 0, j)))
        return pl.BlockSpec((1, 1, tile), idx, memory_space=pltpu.VMEM)

    return row_blk, col_blk, stat_blk


def _forward(q2, k2, v2, scale):
    """q2/k2/v2: (BH, S, D) -> (out fp32 (BH, S, D), m/l fp32 (BH, 1, S))."""

    bh, s, d = q2.shape
    nt = s // _TILE
    row_blk, col_blk, stat_blk = _specs(bh, s, d)

    m, l = pl.pallas_call(
        functools.partial(_stats_kernel, scale=scale),
        grid=(bh, nt, nt),
        in_specs=[row_blk("inner"), col_blk("outer")],
        out_specs=(stat_blk("outer"), stat_blk("outer")),
        out_shape=(jax.ShapeDtypeStruct((bh, 1, s), jnp.float32),
                   jax.ShapeDtypeStruct((bh, 1, s), jnp.float32)),
    )(q2, k2)

    out = pl.pallas_call(
        functools.partial(_apply_kernel, scale=scale),
        grid=(bh, nt, nt),
        in_specs=[row_blk("outer"), col_blk("inner"), col_blk("inner"),
                  stat_blk("inner"), stat_blk("inner")],
        out_specs=row_blk("outer"),
        out_shape=jax.ShapeDtypeStruct((bh, s, d), jnp.float32),
    )(q2, k2, v2, m, l)
    return out, m, l


def _backward(q2, k2, v2, m, l, g2, scale):

    bh, s, d = q2.shape
    nt = s // _TILE
    row_blk, col_blk, stat_blk = _specs(bh, s, d)
    g2 = g2.astype(q2.dtype)

    dv = pl.pallas_call(
        functools.partial(_dv_kernel, scale=scale),
        grid=(bh, nt, nt),
        in_specs=[row_blk("inner"), col_blk("outer"), row_blk("inner"),
                  stat_blk("outer"), stat_blk("outer")],
        out_specs=col_blk("outer"),
        out_shape=jax.ShapeDtypeStruct((bh, s, d), jnp.float32),
    )(q2, k2, g2, m, l)

    # Softmax-Jacobian correction: c_j = sum_i P_ij dP_ij = dV_j . V_j.
    c = jnp.sum(dv * v2.astype(jnp.float32), axis=-1)[:, None, :]  # (BH, 1, S)

    dk = pl.pallas_call(
        functools.partial(_dk_kernel, scale=scale),
        grid=(bh, nt, nt),
        in_specs=[row_blk("inner"), col_blk("outer"), col_blk("outer"),
                  row_blk("inner"), stat_blk("outer"), stat_blk("outer"),
                  stat_blk("outer")],
        out_specs=col_blk("outer"),
        out_shape=jax.ShapeDtypeStruct((bh, s, d), jnp.float32),
    )(q2, k2, v2, g2, m, l, c)

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, scale=scale),
        grid=(bh, nt, nt),
        in_specs=[row_blk("outer"), col_blk("inner"), col_blk("inner"),
                  row_blk("outer"), stat_blk("inner"), stat_blk("inner"),
                  stat_blk("inner")],
        out_specs=row_blk("outer"),
        out_shape=jax.ShapeDtypeStruct((bh, s, d), jnp.float32),
    )(q2, k2, v2, g2, m, l, c)

    return dq, dk, dv


def _run_forward(q2, k2, v2, scale):
    if tpu_interpret_mode():
        return _forward(q2, k2, v2, scale)
    return _forward_p(scale)(q2, k2, v2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def streaming_attention(q2, k2, v2, scale):
    """(BH, S, D) query-axis-softmax attention; output in the input dtype."""
    out, _, _ = _run_forward(q2, k2, v2, scale)
    return out.astype(q2.dtype)


def _vjp_fwd(q2, k2, v2, scale):
    out, m, l = _run_forward(q2, k2, v2, scale)
    return out.astype(q2.dtype), (q2, k2, v2, m, l)


def _vjp_bwd(scale, residuals, g):
    q2, k2, v2, m, l = residuals
    if tpu_interpret_mode():
        dq, dk, dv = _backward(q2, k2, v2, m, l, g, scale)
    else:
        dq, dk, dv = _backward_p(scale)(q2, k2, v2, m, l, g)
    return dq.astype(q2.dtype), dk.astype(k2.dtype), dv.astype(v2.dtype)


streaming_attention.defvjp(_vjp_fwd, _vjp_bwd)
