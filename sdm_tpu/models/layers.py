"""U-Net building blocks (flax.linen, NHWC, bf16-compute capable).

Capability parity with /root/reference/models/custom_layers.py, designed
TPU-first: NHWC layout so convs tile onto the MXU, fp32 params with an
optional bf16 compute dtype, fp32 softmax/GroupNorm statistics, and module
names chosen so converted torch checkpoints map 1:1 (see
sdm_tpu/io/torch_interop.py).

Reference quirks reproduced when `parity=True` (the default — required for
per-pixel output parity with reference checkpoints):
  * AdaGN computes its shift with the *scale* projection; the y_shift Linear
    exists only as dead weight in checkpoints (custom_layers.py:38-44).
  * AttentionBlock's softmax normalizes over the *query* axis, not keys
    (custom_layers.py:147), and owns a GroupNorm that is never applied
    (custom_layers.py:113).
Set `parity=False` for the standard (fixed) semantics.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from sdm_tpu.enums import UNetBlockType
from sdm_tpu.ops.conv import conv2d, conv_transpose2d
from sdm_tpu.ops.norms import group_norm

Dtype = Any


def swish(x: jnp.ndarray) -> jnp.ndarray:
    """x * sigmoid(x) (custom_layers.py:18-20)."""
    return x * jax.nn.sigmoid(x)


def _uniform_init(bound: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


class TorchLinear(nn.Module):
    """Dense layer with torch.nn.Linear init; kernel stored (in, out)."""

    features: int
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_features = x.shape[-1]
        bound = 1.0 / math.sqrt(in_features)
        kernel = self.param("kernel", _uniform_init(bound),
                            (in_features, self.features), self.param_dtype)
        bias = self.param("bias", _uniform_init(bound),
                          (self.features,), self.param_dtype)
        dtype = self.dtype or x.dtype
        y = jnp.dot(x.astype(dtype), kernel.astype(dtype),
                    preferred_element_type=jnp.float32)
        return (y + bias.astype(jnp.float32)).astype(dtype)


class _LinearParams(nn.Module):
    """Declares TorchLinear's parameters (same names, shapes, init) without
    running the matmul — lets fused kernels that consume the raw kernel/bias
    (kernels/attention_block.py) share a checkpoint-identical param tree with
    the composed TorchLinear path."""

    features: int
    in_features: int
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self):
        bound = 1.0 / math.sqrt(self.in_features)
        kernel = self.param("kernel", _uniform_init(bound),
                            (self.in_features, self.features),
                            self.param_dtype)
        bias = self.param("bias", _uniform_init(bound),
                          (self.features,), self.param_dtype)
        return kernel, bias


class TorchConv(nn.Module):
    """Conv2d with torch init/semantics; kernel stored HWIO."""

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    stride: int = 1
    padding: int = 1
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_features = x.shape[-1]
        kh, kw = self.kernel_size
        fan_in = in_features * kh * kw
        bound = 1.0 / math.sqrt(fan_in)
        kernel = self.param("kernel", _uniform_init(bound),
                            (kh, kw, in_features, self.features), self.param_dtype)
        bias = self.param("bias", _uniform_init(bound),
                          (self.features,), self.param_dtype)
        dtype = self.dtype or x.dtype
        return conv2d(x.astype(dtype), kernel, bias,
                      stride=self.stride, padding=self.padding)


class TorchConvTranspose(nn.Module):
    """ConvTranspose2d with torch init/semantics; kernel stored (kh,kw,in,out)
    in torch orientation (flip happens inside conv_transpose2d)."""

    features: int
    kernel_size: Tuple[int, int] = (4, 4)
    stride: int = 2
    padding: int = 1
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_features = x.shape[-1]
        kh, kw = self.kernel_size
        # torch ConvTranspose2d fan_in = out_channels * kh * kw.
        bound = 1.0 / math.sqrt(self.features * kh * kw)
        kernel = self.param("kernel", _uniform_init(bound),
                            (kh, kw, in_features, self.features), self.param_dtype)
        bias = self.param("bias", _uniform_init(bound),
                          (self.features,), self.param_dtype)
        dtype = self.dtype or x.dtype
        return conv_transpose2d(x.astype(dtype), kernel, bias,
                                stride=self.stride, padding=self.padding)


class TorchGroupNorm(nn.Module):
    """GroupNorm with torch semantics over the channel (last) axis.

    When called with FiLM `mod_scale`/`mod_shift` (per-sample, shape (N, C)),
    applies `mod_scale * GN(x) + mod_shift` — optionally via the fused Pallas
    kernel (sdm_tpu/kernels/adagn.py) that does GN stats + affine + FiLM in one
    VMEM pass instead of separate HBM round-trips.
    """

    num_groups: int = 32
    eps: float = 1e-5
    use_pallas: Any = False   # only a literal True enables the fused kernel
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, mod_scale: Optional[jnp.ndarray] = None,
                 mod_shift: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (c,), self.param_dtype)
        if mod_scale is not None and self.use_pallas is True:
            from sdm_tpu.kernels.adagn import fused_adagn
            return fused_adagn(x, scale, bias, mod_scale, mod_shift,
                               self.num_groups, eps=self.eps)
        x_gn = group_norm(x, scale, bias, self.num_groups, self.eps)
        if mod_scale is not None:
            x_gn = (mod_scale[:, None, None, :] * x_gn
                    + mod_shift[:, None, None, :])
        return x_gn


class AdaGN(nn.Module):
    """Adaptive GroupNorm: GN then FiLM modulation from the embedding
    (custom_layers.py:26-45).

    parity=True reproduces the reference bug where the shift is computed with
    the y_scale projection (custom_layers.py:41); y_shift stays as dead weight
    so converted checkpoints keep their shape.
    """

    out_dim: int
    groups: int = 32
    parity: bool = True
    use_pallas: Any = "auto"
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, emb: jnp.ndarray) -> jnp.ndarray:
        y_scale = TorchLinear(self.out_dim, dtype=self.dtype,
                              param_dtype=self.param_dtype, name="y_scale")
        y_shift = TorchLinear(self.out_dim, dtype=self.dtype,
                              param_dtype=self.param_dtype, name="y_shift")
        scale = y_scale(emb)
        if self.parity:
            # Reference quirk: shift uses the scale projection again; keep
            # y_shift's params alive for checkpoint-shape parity (dead weight,
            # DCE'd by XLA at compile time).
            shift = y_scale(emb)
            _dead = y_shift(emb)
        else:
            shift = y_shift(emb)
        return TorchGroupNorm(self.groups, use_pallas=self.use_pallas,
                              param_dtype=self.param_dtype,
                              name="group_norm")(x, scale, shift)


class ConditionalEmbedding(nn.Module):
    """Sinusoidal time embedding + optional conditional-vector embedding
    (custom_layers.py:51-98).

    Sinusoid: freq_i = exp(-ln(10000) * i / (half-1)), sin||cos concat; then a
    4-Linear/Swish MLP; conditional vector goes through a parallel MLP and is
    *added* (custom_layers.py:92-98).
    """

    time_dim: int
    cond_dim: Optional[int] = None
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, t: jnp.ndarray, cond: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        half_dim = self.time_dim // 2
        freq_scale = math.log(10_000) / (half_dim - 1)
        freqs = jnp.exp(jnp.arange(half_dim, dtype=jnp.float32) * -freq_scale)
        te = t.astype(jnp.float32)[:, None] * freqs[None, :]
        te = jnp.concatenate([jnp.sin(te), jnp.cos(te)], axis=1)
        if self.dtype is not None:
            te = te.astype(self.dtype)

        # torch Sequential indices 0,2,4,6 are the Linears (Swish at 1,3,5).
        for i in (0, 2, 4):
            te = swish(TorchLinear(self.time_dim, dtype=self.dtype,
                                   param_dtype=self.param_dtype,
                                   name=f"time_layer_{i}")(te))
        te = TorchLinear(self.time_dim, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="time_layer_6")(te)

        if self.cond_dim is not None:
            ce = cond if self.dtype is None else cond.astype(self.dtype)
            for i in (0, 2, 4):
                ce = swish(TorchLinear(self.time_dim, dtype=self.dtype,
                                       param_dtype=self.param_dtype,
                                       name=f"cond_layer_{i}")(ce))
            ce = TorchLinear(self.time_dim, dtype=self.dtype,
                             param_dtype=self.param_dtype, name="cond_layer_6")(ce)
            te = te + ce
        return te


class AttentionBlock(nn.Module):
    """Multi-head self-attention over flattened H*W tokens
    (custom_layers.py:104-163).

    parity=True keeps the reference's softmax over the *query* axis
    (custom_layers.py:147) and the dead `norm` GroupNorm (custom_layers.py:113).
    Softmax statistics are computed in fp32 regardless of compute dtype.
    """

    heads: int = 1
    d_k: Optional[int] = None
    groups: int = 32
    parity: bool = True
    use_pallas: Any = "auto"   # False | True | "auto" (see kernels.attention)
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, t=None) -> jnp.ndarray:
        del t  # unused; signature parity with ResidualBlock (custom_layers.py:127-130)
        n, h, w, c = x.shape
        d_k = self.d_k if self.d_k is not None else c
        scale = d_k ** -0.5

        # Dead GroupNorm (never applied in the reference forward); traced so
        # its params exist for checkpoint parity, then DCE'd.
        _dead = TorchGroupNorm(self.groups, param_dtype=self.param_dtype,
                               name="norm")(x)

        tokens = x.reshape(n, h * w, c)
        softmax_axis = "q" if self.parity else "k"

        from sdm_tpu.kernels.attention import _kernel_backend
        from sdm_tpu.kernels import attention_block as ab
        dtype = self.dtype or x.dtype
        if (self.use_pallas is True and _kernel_backend()
                and ab.supports(h * w, c, d_k, self.heads,
                                jnp.dtype(dtype).itemsize)):
            # Whole-block fused kernel: qkv proj + softmax + out proj +
            # residual in one VMEM pass (SURVEY §7.8a). Opt-in via a literal
            # use_pallas=True; param scopes/names identical to the composed
            # path below so checkpoints are interchangeable.
            w_qkv, b_qkv = _LinearParams(self.heads * d_k * 3, c,
                                         param_dtype=self.param_dtype,
                                         name="projection")()
            w_out, b_out = _LinearParams(c, self.heads * d_k,
                                         param_dtype=self.param_dtype,
                                         name="output")()
            res = ab.fused_attention_block(
                tokens.astype(dtype), w_qkv, b_qkv, w_out, b_out, scale,
                softmax_axis)
            return res.reshape(n, h, w, c)

        qkv = TorchLinear(self.heads * d_k * 3, dtype=self.dtype,
                          param_dtype=self.param_dtype, name="projection")(tokens)
        qkv = qkv.reshape(n, h * w, self.heads, 3 * d_k)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        from sdm_tpu.kernels.attention import attention
        res = attention(q, k, v, scale=scale,
                        softmax_axis=softmax_axis,
                        mode=self.use_pallas)

        res = res.reshape(n, h * w, self.heads * d_k)
        res = TorchLinear(c, dtype=self.dtype, param_dtype=self.param_dtype,
                          name="output")(res)
        res = res + tokens
        return res.reshape(n, h, w, c)


class UpsampleBlock(nn.Module):
    """ConvTranspose(k=4,s=2,p=1) + Swish; ignores emb (custom_layers.py:169-185)."""

    features: int
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, emb=None) -> jnp.ndarray:
        del emb
        x = TorchConvTranspose(self.features, (4, 4), stride=2, padding=1,
                               dtype=self.dtype, param_dtype=self.param_dtype,
                               name="conv_layer_0")(x)
        return swish(x)


class DownsampleBlock(nn.Module):
    """Conv(k=3,s=2,p=1) + Swish; ignores emb (custom_layers.py:191-207)."""

    features: int
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, emb=None) -> jnp.ndarray:
        del emb
        x = TorchConv(self.features, (3, 3), stride=2, padding=1,
                      dtype=self.dtype, param_dtype=self.param_dtype,
                      name="conv_layer_0")(x)
        return swish(x)


class UNetConvBlock(nn.Module):
    """Conv(k=3,p=1) [+Swish] then AdaGN when emb_dim is set
    (custom_layers.py:213-245)."""

    features: int
    use_activation: bool = True
    emb_dim: Optional[int] = None
    groups: int = 32
    parity: bool = True
    use_pallas: Any = "auto"
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, emb: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        x = TorchConv(self.features, (3, 3), stride=1, padding=1,
                      dtype=self.dtype, param_dtype=self.param_dtype,
                      name="conv_layer_0")(x)
        if self.use_activation:
            x = swish(x)
        if self.emb_dim is not None:
            if emb is None:
                raise ValueError("UNetConvBlock built with emb_dim needs emb.")
            x = AdaGN(self.features, groups=self.groups, parity=self.parity,
                      use_pallas=self.use_pallas, dtype=self.dtype,
                      param_dtype=self.param_dtype, name="adagn")(x, emb)
        return x


class ResidualBlock(nn.Module):
    """Two conv blocks + (1x1-conv | identity) shortcut (custom_layers.py:251-287)."""

    features: int
    use_activation: bool = True
    emb_dim: Optional[int] = None
    groups: int = 32
    parity: bool = True
    use_pallas: Any = "auto"
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, emb: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        init_x = x
        in_channels = x.shape[-1]
        x = UNetConvBlock(self.features, self.use_activation, self.emb_dim,
                          self.groups, self.parity, self.use_pallas,
                          self.dtype, self.param_dtype, name="conv_block_1")(x, emb)
        x = UNetConvBlock(self.features, self.use_activation, self.emb_dim,
                          self.groups, self.parity, self.use_pallas,
                          self.dtype, self.param_dtype, name="conv_block_2")(x, emb)
        if in_channels != self.features:
            shortcut = TorchConv(self.features, (1, 1), stride=1, padding=0,
                                 dtype=self.dtype, param_dtype=self.param_dtype,
                                 name="shortcut")(init_x)
        else:
            shortcut = init_x
        return x + shortcut


class UNetBlock(nn.Module):
    """num_resnet_blocks x (ResidualBlock -> Attention|Identity) at constant
    width = in_channels, then a Down-/Up-sample to out_channels
    (custom_layers.py:293-341)."""

    features: int  # out_channels of the resampling layer
    num_resnet_blocks: int = 1
    use_attn: bool = True
    num_heads: int = 1
    dim_per_head: Optional[int] = None
    groups: int = 32
    block_type: UNetBlockType = UNetBlockType.DOWN
    emb_dim: Optional[int] = None
    parity: bool = True
    use_pallas: Any = "auto"
    remat: bool = False   # inner (per-sublayer) checkpoints, see UNet.remat
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, emb: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        # With remat, each sublayer is its own (nested) checkpoint: the outer
        # per-UNetBlock remat alone made the block's *backward* rematerialize
        # every internal tensor of the block at once — at 256^2 batch 128 the
        # widest up block holds ~8 GB that way (measured from the XLA OOM
        # allocation dump). Nested inner checkpoints keep only one sublayer's
        # intermediates live at a time during the outer recompute; lifted
        # transforms preserve module names, so checkpoints are unaffected.
        Res = nn.checkpoint(ResidualBlock) if self.remat else ResidualBlock
        Attn = nn.checkpoint(AttentionBlock) if self.remat else AttentionBlock
        Smp = (DownsampleBlock if self.block_type == UNetBlockType.DOWN
               else UpsampleBlock)
        Smp = nn.checkpoint(Smp) if self.remat else Smp

        hidden = x.shape[-1]
        for j in range(self.num_resnet_blocks):
            x = Res(hidden, True, self.emb_dim, self.groups,
                    self.parity, self.use_pallas, self.dtype,
                    self.param_dtype, name=f"res_layers_{j}")(x, emb)
            if self.use_attn:
                x = Attn(heads=self.num_heads, d_k=self.dim_per_head,
                         groups=self.groups, parity=self.parity,
                         use_pallas=self.use_pallas, dtype=self.dtype,
                         param_dtype=self.param_dtype,
                         name=f"attn_layers_{j}")(x)
        x = Smp(self.features, self.dtype, self.param_dtype,
                name="out_layer")(x)
        return x
