"""Fused self-attention Pallas kernel (QK^T -> softmax -> @V in one VMEM pass).

The U-Net's attention runs over flattened H*W token grids (<= 4096 tokens at
the reference's resolutions — SURVEY.md §5.7), with the reference's quirk of
softmax over the *query* axis (custom_layers.py:147) in parity mode. XLA
materializes the S x S score matrix in HBM between the two einsums; this
kernel keeps scores in VMEM: one grid step per (batch, head), whole-tile
compute on the MXU with fp32 score accumulation.

Because the score matrix lives in VMEM, the kernel applies when
S*S*4 + 3*S*D*2 fits the VMEM budget (true for every reference config at
128x128: S in {256, 1024}); larger grids fall back to the XLA path
automatically. Backward is a custom VJP that recomputes through the XLA
reference implementation (rematerialization: trade FLOPs for HBM).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

# Real per-kernel VMEM on this TPU generation is ~16 MB; leave headroom for
# Mosaic's pipeline double-buffering. Admits every 128x128-model grid
# (S in {256, 1024}); S=4096 (256x256 SR models at layer 2) needs a 67 MB
# score tile and must fall back to XLA — with a larger budget the kernel
# passes tracing but fails TPU compilation at runtime.
_VMEM_BUDGET_BYTES = 14 * 1024 * 1024


def _xla_attention(q, k, v, scale: float, softmax_axis: str):
    attn = jnp.einsum("bihd,bjhd->bijh", q, k,
                      preferred_element_type=jnp.float32) * scale
    axis = 1 if softmax_axis == "q" else 2
    attn = jax.nn.softmax(attn.astype(jnp.float32), axis=axis)
    attn = attn.astype(v.dtype)
    return jnp.einsum("bijh,bjhd->bihd", attn, v,
                      preferred_element_type=jnp.float32).astype(v.dtype)


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float,
                 softmax_axis: str):
    q = q_ref[0]  # (S, D)
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale   # (S_q, S_k) fp32
    axis = 0 if softmax_axis == "q" else 1
    s_max = jnp.max(s, axis=axis, keepdims=True)
    e = jnp.exp(s - s_max)
    p = e / jnp.sum(e, axis=axis, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[0] = o.astype(o_ref.dtype)


def _pallas_attention_2d(q2, k2, v2, scale: float, softmax_axis: str):
    """q2/k2/v2: (BH, S, D) -> (BH, S, D); partitions over BH under a
    sharded jit (kernels/partitioning.py), per-shard pallas otherwise."""
    from sdm_tpu.kernels.partitioning import tpu_interpret_mode
    if tpu_interpret_mode():
        return _pallas_attention_2d_impl(q2, k2, v2, scale, softmax_axis)
    return _attention_2d_p(scale, softmax_axis)(q2, k2, v2)


@functools.lru_cache(maxsize=None)
def _attention_2d_p(scale: float, softmax_axis: str):
    from sdm_tpu.kernels.partitioning import batch_partitioned
    return batch_partitioned(
        lambda q, k, v: _pallas_attention_2d_impl(q, k, v, scale,
                                                  softmax_axis),
        "b s d, b s d, b s d -> b s d", need_replication=("s", "d"))


def _pallas_attention_2d_impl(q2, k2, v2, scale: float, softmax_axis: str):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bh, s, d = q2.shape
    kernel = functools.partial(_attn_kernel, scale=scale,
                               softmax_axis=softmax_axis)
    return pl.pallas_call(
        kernel,
        grid=(bh,),
        in_specs=[pl.BlockSpec((1, s, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec((1, s, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, s, d), q2.dtype),
    )(q2, k2, v2)


def _fits_vmem(s: int, d: int, itemsize: int) -> bool:
    score_bytes = s * s * 4
    qkv_bytes = 4 * s * d * itemsize  # q,k,v,o tiles
    return score_bytes + qkv_bytes <= _VMEM_BUDGET_BYTES


# XLA keeps the S x S score matrix in HBM between the two einsums; below
# this token count the kernels are measured net-neutral end-to-end (TODO.md)
# so "auto" stays on XLA. Above it the S^2 materialization dominates memory
# (67 MB/sample fp32 at S=4096) and "auto" switches to the streaming kernel:
# measured at 256^2 SR batch 64 it costs ~4% step time vs XLA-with-remat
# (two-pass recompute) but removes the S^2 tensor in both directions —
# headroom for larger S / more heads / forward-only sampling at scale
# (BASELINE.md memory table).
_AUTO_STREAMING_MIN_S = 2048


def _kernel_backend() -> bool:
    """Pallas TPU kernels only compile for real TPU backends; CPU test runs
    (tests/conftest.py) take the XLA path unless interpret mode is forced
    (pltpu.force_tpu_interpret_mode, which the kernel tests use to exercise
    the real kernels on CPU)."""
    if jax.default_backend() in ("tpu", "axon"):
        return True
    from sdm_tpu.kernels.partitioning import tpu_interpret_mode
    return tpu_interpret_mode()


def attention(q, k, v, scale: float, softmax_axis: str = "q",
              mode="auto"):
    """Dispatch over the three attention implementations by static shape.

    q,k,v: (N, S, H, D). `mode` is the model's `use_pallas` setting:
      False  — always the XLA path (the parity-pinned reference numerics);
      True   — prefer kernels: whole-tile when it fits VMEM, else the
               streaming two-pass kernel, else XLA;
      "auto" — XLA for small grids (kernel is net-neutral there and kernel
               boundaries break XLA fusion), streaming for S >=
               _AUTO_STREAMING_MIN_S where XLA's S^2 score materialization
               OOMs training (the 256^2 SR case, VERDICT.md weakness 3).
    """
    n, s, h, d = q.shape
    if mode is False or not _kernel_backend():
        return _xla_attention(q, k, v, scale, softmax_axis)
    from sdm_tpu.kernels import streaming_attention as streaming
    streams = streaming.supports(s, d, softmax_axis)
    if mode is True:
        if _whole_tile_ok(s, d, q.dtype.itemsize):
            return fused_attention(q, k, v, scale, softmax_axis)
        if streams:
            return _streaming_4d(q, k, v, scale, softmax_axis)
        return _xla_attention(q, k, v, scale, softmax_axis)
    # "auto"
    if streams and s >= _AUTO_STREAMING_MIN_S:
        return _streaming_4d(q, k, v, scale, softmax_axis)
    return _xla_attention(q, k, v, scale, softmax_axis)


def _streaming_4d(q, k, v, scale: float, softmax_axis: str = "q"):
    from sdm_tpu.kernels.streaming_attention import streaming_attention
    n, s, h, d = q.shape
    to2d = lambda x: x.transpose(0, 2, 1, 3).reshape(n * h, s, d)
    o2 = streaming_attention(to2d(q), to2d(k), to2d(v), scale, softmax_axis)
    return o2.reshape(n, h, s, d).transpose(0, 2, 1, 3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_attention(q, k, v, scale: float, softmax_axis: str = "q"):
    """q,k,v: (N, S, H, D). Returns (N, S, H, D).

    softmax_axis "q" reproduces the reference's query-axis normalization
    (custom_layers.py:147); "k" is standard attention.
    """
    return _fused_attention_fwd_impl(q, k, v, scale, softmax_axis)


def _whole_tile_ok(s: int, d: int, itemsize: int) -> bool:
    """Single admission predicate for the whole-tile kernel, shared by the
    dispatcher and the kernel's own fallback so they can never drift."""
    return s >= 128 and d % 128 == 0 and _fits_vmem(s, d, itemsize)


def _fused_attention_fwd_impl(q, k, v, scale, softmax_axis):
    n, s, h, d = q.shape
    if not _whole_tile_ok(s, d, q.dtype.itemsize):
        return _xla_attention(q, k, v, scale, softmax_axis)
    to2d = lambda x: x.transpose(0, 2, 1, 3).reshape(n * h, s, d)
    o2 = _pallas_attention_2d(to2d(q), to2d(k), to2d(v), scale, softmax_axis)
    return o2.reshape(n, h, s, d).transpose(0, 2, 1, 3)


def _fwd(q, k, v, scale, softmax_axis):
    out = _fused_attention_fwd_impl(q, k, v, scale, softmax_axis)
    return out, (q, k, v)


def _bwd(scale, softmax_axis, residuals, g):
    q, k, v = residuals
    # Rematerialized backward through the XLA reference (exact same math).
    _, vjp = jax.vjp(
        lambda q_, k_, v_: _xla_attention(q_, k_, v_, scale, softmax_axis),
        q, k, v)
    return vjp(g)


fused_attention.defvjp(_fwd, _bwd)
