"""Whole-attention-block fused Pallas kernel (TPU).

Fuses the ENTIRE AttentionBlock (reference custom_layers.py:104-163) for one
sample into a single VMEM-resident kernel:

    qkv = tokens @ W_qkv + b_qkv          (the fused qkv Linear, :116)
    q, k, v = split(qkv)
    P = softmax(scale * q k^T)            (query axis in parity mode, :147)
    r = P @ v
    out = r @ W_out + b_out + tokens      (output Linear + residual, :156-159)

vs the unfused path this removes four HBM round-trips per block (write+read
of qkv and of the attention result) and lets the projections ride the same
MXU pass as the attention matmuls. Admission: heads == 1 (the reference
default; multi-head keeps the composed path) and everything fits VMEM —
true for the 128x128 models' grids (S=1024/256, C=512).

Backward rematerializes through the numerically-identical XLA composite
(`_xla_block`) — same tradeoff as kernels/attention.py: the fwd kernel saves
HBM where it counts (sampling / activation traffic) while training grads
reuse XLA's well-fused backward.

Measured end-to-end value is recorded in BASELINE.md (VERDICT r2 item 2);
the kernel is opt-in via use_pallas=True until a default-path win is shown.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sdm_tpu.kernels.partitioning import batch_partitioned, tpu_interpret_mode

_VMEM_BUDGET_BYTES = 13 * 1024 * 1024


def supports(s: int, c: int, d_k: int, heads: int, itemsize: int) -> bool:
    """Admission: heads==1, lane-aligned widths, whole block fits VMEM."""
    if heads != 1 or c % 128 != 0 or d_k % 128 != 0 or s < 128:
        return False
    vmem = (
        s * c * itemsize            # tokens tile
        + c * 3 * d_k * itemsize    # W_qkv
        + s * 3 * d_k * itemsize    # qkv
        + s * s * 4                 # fp32 scores
        + s * d_k * itemsize        # r
        + d_k * c * itemsize        # W_out
        + s * c * itemsize          # out tile
    )
    return vmem <= _VMEM_BUDGET_BYTES


def _dot(a, b, dims=((1,), (0,))):
    return jax.lax.dot_general(a, b, dimension_numbers=(dims, ((), ())),
                               preferred_element_type=jnp.float32)


def _block_kernel(t_ref, wq_ref, bq_ref, wo_ref, bo_ref, o_ref, *,
                  scale: float, softmax_axis: str, d_k: int):
    tok = t_ref[0]                                   # (S, C)
    dtype = tok.dtype
    qkv = (_dot(tok, wq_ref[...]) + bq_ref[0][None, :]).astype(dtype)
    q = qkv[:, :d_k]
    k = qkv[:, d_k:2 * d_k]
    v = qkv[:, 2 * d_k:]
    s = _dot(q, k, ((1,), (1,))) * scale             # (S, S) fp32
    axis = 0 if softmax_axis == "q" else 1
    s_max = jnp.max(s, axis=axis, keepdims=True)
    e = jnp.exp(s - s_max)
    p = (e / jnp.sum(e, axis=axis, keepdims=True)).astype(dtype)
    r = _dot(p, v).astype(dtype)                     # (S, d_k)
    out = (_dot(r, wo_ref[...]) + bo_ref[0][None, :]).astype(dtype) + tok
    o_ref[0] = out


def _impl(tokens, w_qkv, b_qkv, w_out, b_out, scale, softmax_axis):
    n, s, c = tokens.shape
    d_k = w_out.shape[0]
    dtype = tokens.dtype
    kernel = functools.partial(_block_kernel, scale=scale,
                               softmax_axis=softmax_axis, d_k=d_k)
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, s, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            full((c, 3 * d_k)),
            full((1, 3 * d_k)),
            full((d_k, c)),
            full((1, c)),
        ],
        out_specs=pl.BlockSpec((1, s, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, s, c), dtype),
    )(tokens, w_qkv.astype(dtype), b_qkv, w_out.astype(dtype), b_out)


@functools.lru_cache(maxsize=None)
def _impl_p(scale: float, softmax_axis: str):
    return batch_partitioned(
        lambda t, wq, bq, wo, bo: _impl(t, wq, bq, wo, bo, scale,
                                        softmax_axis),
        "n s c, c e, u e, d c, u c -> n s c",
        need_replication=("s", "c", "e", "u", "d"),
        batch_argnums=(0,))


def _xla_block(tokens, w_qkv, b_qkv, w_out, b_out, scale, softmax_axis):
    """The numerically-identical XLA composite (TorchLinear + attention +
    TorchLinear + residual, models/layers.py:258-272) — used as the kernel's
    reference in tests and as the rematerialized backward."""
    dtype = tokens.dtype
    d_k = w_out.shape[0]
    qkv = (jnp.dot(tokens, w_qkv.astype(dtype),
                   preferred_element_type=jnp.float32)
           + b_qkv.astype(jnp.float32)).astype(dtype)
    q, k, v = jnp.split(qkv[:, :, None, :], 3, axis=-1)
    from sdm_tpu.kernels.attention import _xla_attention
    r = _xla_attention(q, k, v, scale, softmax_axis)[:, :, 0, :]
    out = (jnp.dot(r, w_out.astype(dtype),
                   preferred_element_type=jnp.float32)
           + b_out.astype(jnp.float32)).astype(dtype)
    del d_k
    return out + tokens


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def fused_attention_block(tokens, w_qkv, b_qkv, w_out, b_out, scale,
                          softmax_axis="q"):
    """tokens (N, S, C); weights in storage (fp32) or compute dtype;
    biases 1-D. Returns (N, S, C) in tokens.dtype."""
    bq2 = b_qkv.reshape(1, -1)   # TPU VMEM blocks want >= 2-D
    bo2 = b_out.reshape(1, -1)
    if tpu_interpret_mode():
        return _impl(tokens, w_qkv, bq2, w_out, bo2, scale, softmax_axis)
    return _impl_p(scale, softmax_axis)(tokens, w_qkv, bq2, w_out, bo2)


def _vjp_fwd(tokens, w_qkv, b_qkv, w_out, b_out, scale, softmax_axis):
    out = fused_attention_block(tokens, w_qkv, b_qkv, w_out, b_out, scale,
                                softmax_axis)
    return out, (tokens, w_qkv, b_qkv, w_out, b_out)


def _vjp_bwd(scale, softmax_axis, residuals, g):
    tokens, w_qkv, b_qkv, w_out, b_out = residuals
    _, vjp = jax.vjp(
        lambda t, wq, bq, wo, bo: _xla_block(t, wq, bq, wo, bo, scale,
                                             softmax_axis),
        tokens, w_qkv, b_qkv, w_out, b_out)
    return vjp(g)


fused_attention_block.defvjp(_vjp_fwd, _vjp_bwd)
