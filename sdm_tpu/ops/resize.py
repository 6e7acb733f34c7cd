"""Area (adaptive-average-pool) resize with exact torch semantics.

The SR pipeline builds its low-resolution conditioning with
`F.interpolate(mode="area")` down to lr_dim and back up to sr_dim
(/root/reference/train_SR_diffusion.py:320-328,
generate_sr_images_diffusion.py:170-173). torch's "area" mode is adaptive
average pooling: output cell (i) averages input cells [floor(i*in/out),
ceil((i+1)*in/out)). This implements the identical map as two separable
1-D averaging matmuls (built once per (in,out) pair as dense fp32 weights),
which XLA maps onto the MXU — exact for both down- and up-sampling, any
integer sizes.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=64)
def _area_weights(in_size: int, out_size: int) -> np.ndarray:
    """(out_size, in_size) row-stochastic averaging matrix matching
    torch adaptive_avg_pool1d."""
    w = np.zeros((out_size, in_size), dtype=np.float32)
    for i in range(out_size):
        start = (i * in_size) // out_size
        end = -((-(i + 1) * in_size) // out_size)  # ceil((i+1)*in/out)
        w[i, start:end] = 1.0 / (end - start)
    return w


def area_resize(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """NHWC area resize (torch F.interpolate mode="area" equivalent)."""
    n, h, w, c = x.shape
    dtype = x.dtype
    out = x.astype(jnp.float32)
    if h != out_h:
        wh = jnp.asarray(_area_weights(h, out_h))
        out = jnp.einsum("oh,nhwc->nowc", wh, out)
    if w != out_w:
        ww = jnp.asarray(_area_weights(w, out_w))
        out = jnp.einsum("ow,nhwc->nhoc", ww, out)
    return out.astype(dtype)
