"""Streaming (two-pass) softmax attention kernels (Pallas, TPU) for large
token grids — both softmax axes.

The reference's AttentionBlock normalizes the score matrix over the *query*
axis (custom_layers.py:147): P[:, j] = softmax_i(A[:, j]), out = P @ V; the
framework's `parity=False` extension uses the standard *key* axis
(P[i, :] = softmax_j(A[i, :]), classic flash attention). XLA materializes
the S x S score matrix (and saves it for backward), which at S = 4096 (the
256x256 SR models' layer-2 grid, SURVEY.md §5.7) is a 64 MB fp32 tensor
*per batch-head* — training at batch 128 flat-OOMs (VERDICT r1 weakness 3).
These kernels never materialize more than a (Ti, Tj) score tile.

Both axes use the same two-pass scheme; they differ only in which axis the
stats reduce over (and hence which grid position indexes the stat blocks):

Forward:
  F1 stats:  running max m / denom l over chunks of the REDUCED axis
             (flash-style rescaled accumulation, fp32) — per-column stats
             for softmax_axis="q", per-row stats for "k".
  F2 apply:  out_i += (exp(s - m)/l) @ V_j, fp32 accumulation over j.

Backward (custom VJP; residuals are q, k, v, the stats m, l, and for the
key axis the fp32 forward output — O(S*D) extra memory instead of the
O(S^2) score matrix). With P recomputed per tile:
    dV = P^T g
    corr = softmax-Jacobian correction = sum over the reduced axis of P*dP:
        axis "q": c_j = dV_j . V_j   (one XLA rowsum of already-computed dV)
        axis "k": D_i = g_i . out_i  (one XLA rowsum; why out is a residual)
    dA = P * (g V^T - corr)
    dQ = scale * dA K,  dK = scale * dA^T Q
  computed as: B1 dV (accumulate over i), corr in XLA, B2 dK (over i),
  B3 dQ (over j), P/dA recomputed tile-by-tile in B2/B3.

All matmuls run on the MXU with fp32 accumulation; every block is
(tile, D) <= ~1 MB so VMEM stays far under budget at any S. Numerical
equivalence vs the XLA reference (fwd + grads, both axes) is pinned in
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
def _forward_p(scale: float, axis: int):
    return batch_partitioned(
        lambda q, k, v: _forward(q, k, v, scale, axis),
        "b s d, b s d, b s d -> b s d, b u s, b u s",
        need_replication=("s", "d", "u"))


@functools.lru_cache(maxsize=None)
def _backward_p(scale: float, axis: int):
    return batch_partitioned(
        lambda q, k, v, m, l, corr, g: _backward(q, k, v, m, l, corr, g,
                                                 scale, axis),
        "b s d, b s d, b s d, b u s, b u s, b u s, b s d -> b s d, b s d",
        need_replication=("s", "d", "u"))


def supports(s: int, d: int, softmax_axis: str) -> bool:
    """Static-shape admission: S divisible by the tile, D lane-aligned."""
    return (softmax_axis in ("q", "k") and s % _TILE == 0 and s >= 2 * _TILE
            and d % 128 == 0)


def _dot(a, b, dims):
    return jax.lax.dot_general(a, b, dimension_numbers=(dims, ((), ())),
                               preferred_element_type=jnp.float32)


def _score_tile(q_ref, k_ref, scale):
    """(Ti, Tj) fp32 score tile: scale * q_i @ k_j^T."""
    return _dot(q_ref[0], k_ref[0], ((1,), (1,))) * scale


def _bc(x, axis):
    """Broadcast per-column (axis=0, stats over queries) or per-row (axis=1,
    stats over keys) stats back over the reduced axis of a score tile."""
    return x[None, :] if axis == 0 else x[:, None]


def _stats_kernel(q_ref, k_ref, m_ref, l_ref, *, scale, axis):
    s = _score_tile(q_ref, k_ref, scale)          # (Ti, Tj)
    chunk_max = jnp.max(s, axis=axis)             # (T_other,)

    @pl.when(pl.program_id(2) == 0)
    def _init():
        m_ref[0, 0] = chunk_max
        l_ref[0, 0] = jnp.sum(jnp.exp(s - _bc(chunk_max, axis)), axis=axis)

    @pl.when(pl.program_id(2) != 0)
    def _update():
        m_old = m_ref[0, 0]
        m_new = jnp.maximum(m_old, chunk_max)
        l_ref[0, 0] = (l_ref[0, 0] * jnp.exp(m_old - m_new)
                       + jnp.sum(jnp.exp(s - _bc(m_new, axis)), axis=axis))
        m_ref[0, 0] = m_new


def _p_tile(q_ref, k_ref, m_ref, l_ref, scale, axis):
    s = _score_tile(q_ref, k_ref, scale)
    return jnp.exp(s - _bc(m_ref[0, 0], axis)) / _bc(l_ref[0, 0], axis)


def _apply_kernel(q_ref, k_ref, v_ref, m_ref, l_ref, o_ref, *, scale, axis):
    p = _p_tile(q_ref, k_ref, m_ref, l_ref, scale, axis)
    o = _dot(p.astype(v_ref.dtype), v_ref[0], ((1,), (0,)))  # (Ti, D) fp32

    @pl.when(pl.program_id(2) == 0)
    def _init():
        o_ref[0] = o

    @pl.when(pl.program_id(2) != 0)
    def _acc():
        o_ref[0] += o


def _dv_kernel(q_ref, k_ref, g_ref, m_ref, l_ref, dv_ref, *, scale, axis):
    p = _p_tile(q_ref, k_ref, m_ref, l_ref, scale, axis)
    dv = _dot(p.astype(g_ref.dtype), g_ref[0], ((0,), (0,)))  # (Tj, D)

    @pl.when(pl.program_id(2) == 0)
    def _init():
        dv_ref[0] = dv

    @pl.when(pl.program_id(2) != 0)
    def _acc():
        dv_ref[0] += dv


def _da_tile(q_ref, k_ref, v_ref, g_ref, m_ref, l_ref, c_ref, scale, axis):
    p = _p_tile(q_ref, k_ref, m_ref, l_ref, scale, axis)
    dp = _dot(g_ref[0], v_ref[0], ((1,), (1,)))               # (Ti, Tj)
    return p * (dp - _bc(c_ref[0, 0], axis))


def _dk_kernel(q_ref, k_ref, v_ref, g_ref, m_ref, l_ref, c_ref, dk_ref, *,
               scale, axis):
    da = _da_tile(q_ref, k_ref, v_ref, g_ref, m_ref, l_ref, c_ref, scale,
                  axis)
    dk = _dot(da.astype(q_ref.dtype), q_ref[0], ((0,), (0,))) * scale

    @pl.when(pl.program_id(2) == 0)
    def _init():
        dk_ref[0] = dk

    @pl.when(pl.program_id(2) != 0)
    def _acc():
        dk_ref[0] += dk


def _dq_kernel(q_ref, k_ref, v_ref, g_ref, m_ref, l_ref, c_ref, dq_ref, *,
               scale, axis):
    da = _da_tile(q_ref, k_ref, v_ref, g_ref, m_ref, l_ref, c_ref, scale,
                  axis)
    dq = _dot(da.astype(k_ref.dtype), k_ref[0], ((1,), (0,))) * scale

    @pl.when(pl.program_id(2) == 0)
    def _init():
        dq_ref[0] = dq

    @pl.when(pl.program_id(2) != 0)
    def _acc():
        dq_ref[0] += dq


def _specs(bh, s, d):
    """Shared BlockSpec builders; grid layout is (bh, outer, inner) — a
    spec's "outer"/"inner" picks which grid position selects its block."""
    tile = _TILE

    def row_blk(which):  # q/g chunks along the query axis
        idx = ((lambda b, j, i: (b, i, 0)) if which == "inner"
               else (lambda b, i, j: (b, i, 0)))
        return pl.BlockSpec((1, tile, d), idx, memory_space=pltpu.VMEM)

    def col_blk(which):  # k/v chunks along the key axis
        idx = ((lambda b, j, i: (b, j, 0)) if which == "outer"
               else (lambda b, i, j: (b, j, 0)))
        return pl.BlockSpec((1, tile, d), idx, memory_space=pltpu.VMEM)

    def stat_blk(which):  # m/l/corr chunks along their S axis, (BH, 1, S)
        idx = ((lambda b, j, i: (b, 0, j)) if which == "outer"
               else (lambda b, i, j: (b, 0, j)))
        return pl.BlockSpec((1, 1, tile), idx, memory_space=pltpu.VMEM)

    return row_blk, col_blk, stat_blk


def _forward(q2, k2, v2, scale, axis):
    """q2/k2/v2: (BH, S, D) -> (out fp32 (BH, S, D), m/l fp32 (BH, 1, S)).

    axis=0: query-axis softmax, stats are per-KEY (indexed by j);
    axis=1: key-axis softmax, stats are per-QUERY (indexed by i)."""

    bh, s, d = q2.shape
    nt = s // _TILE
    row_blk, col_blk, stat_blk = _specs(bh, s, d)

    # Stats pass: the stat block sits on the grid's OUTER position; the
    # reduced axis streams on the inner position. For axis=0 the stats are
    # per-column (outer walks j, inner streams queries i); for axis=1 they
    # are per-row (outer walks i, inner streams keys j).
    if axis == 0:
        stats_in = [row_blk("inner"), col_blk("outer")]
    else:
        stats_in = [row_blk("outer"), col_blk("inner")]
    m, l = pl.pallas_call(
        functools.partial(_stats_kernel, scale=scale, axis=axis),
        grid=(bh, nt, nt),
        in_specs=stats_in,
        out_specs=(stat_blk("outer"), stat_blk("outer")),
        out_shape=(jax.ShapeDtypeStruct((bh, 1, s), jnp.float32),
                   jax.ShapeDtypeStruct((bh, 1, s), jnp.float32)),
    )(q2, k2)

    # Apply pass: outer walks output rows i, inner accumulates over keys j.
    # The stats travel with j (axis=0) or with i (axis=1).
    out = pl.pallas_call(
        functools.partial(_apply_kernel, scale=scale, axis=axis),
        grid=(bh, nt, nt),
        in_specs=[row_blk("outer"), col_blk("inner"), col_blk("inner"),
                  stat_blk("inner" if axis == 0 else "outer"),
                  stat_blk("inner" if axis == 0 else "outer")],
        out_specs=row_blk("outer"),
        out_shape=jax.ShapeDtypeStruct((bh, s, d), jnp.float32),
    )(q2, k2, v2, m, l)
    return out, m, l


def _backward(q2, k2, v2, m, l, corr, g2, scale, axis):
    """corr is the softmax-Jacobian correction, (BH, 1, S) fp32: per-key
    c_j = dV_j . V_j for axis=0, per-query D_i = g_i . out_i for axis=1
    (computed in XLA by the VJP wrapper)."""

    bh, s, d = q2.shape
    nt = s // _TILE
    row_blk, col_blk, stat_blk = _specs(bh, s, d)
    g2 = g2.astype(q2.dtype)
    # Stats/corr are indexed by j for axis=0 and by i for axis=1.
    stat_j = "outer" if axis == 0 else "inner"   # in j-outer grids
    stat_i = "inner" if axis == 0 else "outer"   # in i-outer grids

    # dK pass: outer walks keys j, inner accumulates over queries i.
    dk = pl.pallas_call(
        functools.partial(_dk_kernel, scale=scale, axis=axis),
        grid=(bh, nt, nt),
        in_specs=[row_blk("inner"), col_blk("outer"), col_blk("outer"),
                  row_blk("inner"), stat_blk(stat_j), stat_blk(stat_j),
                  stat_blk(stat_j)],
        out_specs=col_blk("outer"),
        out_shape=jax.ShapeDtypeStruct((bh, s, d), jnp.float32),
    )(q2, k2, v2, g2, m, l, corr)

    # dQ pass: outer walks queries i, inner accumulates over keys j.
    dq = pl.pallas_call(
        functools.partial(_dq_kernel, scale=scale, axis=axis),
        grid=(bh, nt, nt),
        in_specs=[row_blk("outer"), col_blk("inner"), col_blk("inner"),
                  row_blk("outer"), stat_blk(stat_i), stat_blk(stat_i),
                  stat_blk(stat_i)],
        out_specs=row_blk("outer"),
        out_shape=jax.ShapeDtypeStruct((bh, s, d), jnp.float32),
    )(q2, k2, v2, g2, m, l, corr)

    return dq, dk


@functools.lru_cache(maxsize=None)
def _dv_p(scale: float, axis: int):
    return batch_partitioned(
        lambda q, k, g, m, l: _dv(q, k, g, m, l, scale, axis),
        "b s d, b s d, b s d, b u s, b u s -> b s d",
        need_replication=("s", "d", "u"))


def _dv(q2, k2, g2, m, l, scale, axis):
    bh, s, d = q2.shape
    nt = s // _TILE
    row_blk, col_blk, stat_blk = _specs(bh, s, d)
    stat_j = "outer" if axis == 0 else "inner"
    # dV pass: outer walks keys j, inner accumulates over queries i.
    return pl.pallas_call(
        functools.partial(_dv_kernel, scale=scale, axis=axis),
        grid=(bh, nt, nt),
        in_specs=[row_blk("inner"), col_blk("outer"), row_blk("inner"),
                  stat_blk(stat_j), stat_blk(stat_j)],
        out_specs=col_blk("outer"),
        out_shape=jax.ShapeDtypeStruct((bh, s, d), jnp.float32),
    )(q2, k2, g2.astype(q2.dtype), m, l)


def _run_forward(q2, k2, v2, scale, axis):
    if tpu_interpret_mode():
        return _forward(q2, k2, v2, scale, axis)
    return _forward_p(scale, axis)(q2, k2, v2)


def _axis_of(softmax_axis: str) -> int:
    return 0 if softmax_axis == "q" else 1


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def streaming_attention(q2, k2, v2, scale, softmax_axis="q"):
    """(BH, S, D) streaming attention; output in the input dtype.

    softmax_axis "q" reproduces the reference's query-axis normalization
    (custom_layers.py:147); "k" is standard (flash) attention."""
    out, _, _ = _run_forward(q2, k2, v2, scale, _axis_of(softmax_axis))
    return out.astype(q2.dtype)


def _vjp_fwd(q2, k2, v2, scale, softmax_axis):
    axis = _axis_of(softmax_axis)
    out, m, l = _run_forward(q2, k2, v2, scale, axis)
    # Key-axis backward needs the fp32 forward output for its correction
    # term D_i = g_i . out_i; query-axis derives c_j from dV instead.
    res_out = out if axis == 1 else None
    return out.astype(q2.dtype), (q2, k2, v2, m, l, res_out)


def _vjp_bwd(scale, softmax_axis, residuals, g):
    axis = _axis_of(softmax_axis)
    q2, k2, v2, m, l, out = residuals
    interp = tpu_interpret_mode()
    if interp:
        dv = _dv(q2, k2, g, m, l, scale, axis)
    else:
        dv = _dv_p(scale, axis)(q2, k2, g, m, l)
    if axis == 0:
        # c_j = sum_i P_ij dP_ij = dV_j . V_j (one XLA rowsum from dV).
        corr = jnp.sum(dv * v2.astype(jnp.float32), axis=-1)[:, None, :]
    else:
        # D_i = sum_j P_ij dP_ij = g_i . out_i.
        corr = jnp.sum(g.astype(jnp.float32) * out, axis=-1)[:, None, :]
    if interp:
        dq, dk = _backward(q2, k2, v2, m, l, corr, g, scale, axis)
    else:
        dq, dk = _backward_p(scale, axis)(q2, k2, v2, m, l, corr, g)
    return dq.astype(q2.dtype), dk.astype(k2.dtype), dv.astype(v2.dtype)


streaming_attention.defvjp(_vjp_fwd, _vjp_bwd)
