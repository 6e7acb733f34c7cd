"""2-D convolution primitives with exact torch semantics, NHWC/HWIO layout.

These thin wrappers around `lax.conv_general_dilated` pin down the two conv
flavors the U-Net uses so checkpoint interop with the reference is exact:

  - conv2d            ~ torch.nn.Conv2d(k, stride, padding)
  - conv_transpose2d  ~ torch.nn.ConvTranspose2d(k, stride, padding)
    (reference UpsampleBlock uses k=4, s=2, p=1 — custom_layers.py:174-179)

Kernel layout convention:
  - conv2d kernel: HWIO (kh, kw, in, out) — torch (out,in,kh,kw).permute(2,3,1,0).
  - conv_transpose2d kernel: (kh, kw, in, out) in *torch orientation*
    (torch (in,out,kh,kw).permute(2,3,0,1)); the spatial flip that makes a
    transposed conv equal to a dilated conv happens inside this function, so
    the stored parameter matches the torch checkpoint modulo the axis permute.

All matmul-shaped work stays on the XLA conv path (MXU); `preferred_element_type`
keeps accumulation in fp32 under bf16 compute.
"""

from __future__ import annotations

from typing import Tuple, Union

import jax.numpy as jnp
from jax import lax

_DIMS = ("NHWC", "HWIO", "NHWC")


def _pair(v: Union[int, Tuple[int, int]]) -> Tuple[int, int]:
    if isinstance(v, int):
        return (v, v)
    return tuple(v)  # type: ignore[return-value]


def conv2d(x: jnp.ndarray, kernel: jnp.ndarray, bias=None, *,
           stride: Union[int, Tuple[int, int]] = 1,
           padding: Union[int, Tuple[int, int]] = 0) -> jnp.ndarray:
    """torch.nn.Conv2d-equivalent: NHWC input, HWIO kernel."""
    sh, sw = _pair(stride)
    ph, pw = _pair(padding)
    # No preferred_element_type upcast: the conv VJP cannot transpose a
    # bf16-in/fp32-out conv, and the TPU MXU already accumulates bf16
    # operands in fp32 internally before rounding to the output dtype.
    out = lax.conv_general_dilated(
        x, kernel.astype(x.dtype),
        window_strides=(sh, sw),
        padding=((ph, ph), (pw, pw)),
        dimension_numbers=_DIMS,
    )
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def conv_transpose2d(x: jnp.ndarray, kernel: jnp.ndarray, bias=None, *,
                     stride: Union[int, Tuple[int, int]] = 2,
                     padding: Union[int, Tuple[int, int]] = 1) -> jnp.ndarray:
    """torch.nn.ConvTranspose2d-equivalent: NHWC input, (kh,kw,in,out) kernel
    in torch orientation (not pre-flipped).

    Implemented as the equivalent lhs-dilated convolution:
      out = conv(dilate_s(x) padded by (k-1-p), flip_hw(kernel))
    which gives H_out = (H-1)*s - 2p + k, matching torch.
    """
    sh, sw = _pair(stride)
    ph, pw = _pair(padding)
    kh, kw = kernel.shape[0], kernel.shape[1]
    flipped = kernel[::-1, ::-1]
    out = lax.conv_general_dilated(
        x, flipped.astype(x.dtype),
        window_strides=(1, 1),
        padding=((kh - 1 - ph, kh - 1 - ph), (kw - 1 - pw, kw - 1 - pw)),
        lhs_dilation=(sh, sw),
        dimension_numbers=_DIMS,
    )
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out
