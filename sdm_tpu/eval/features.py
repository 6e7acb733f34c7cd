"""Feature extractors for sample-quality metrics (eval/fid.py).

All extractors take NHWC float images in [-1, 1] — the framework's native
activation convention (generators return exactly this with
save_locally=False) — and return an (N, D) float32 feature matrix.

Three families, selected by a spec string:

  "pixel[:R]"     Area-resize to R x R (default 8, exact torch semantics via
                  ops/resize.py) and flatten — a fast, assumption-free
                  baseline that catches gross distribution drift.
  "randconv[:R]"  A FIXED-SEED random strided conv net evaluated under jit
                  (bf16 matmuls on TPU): images are area-resized to R x R
                  (default 64), pushed through 4 stride-2 conv+swish stages
                  (3->32->64->128->256), and mean+max pooled per channel
                  (512-D). Random untrained conv features are a documented
                  substitute when a pretrained Inception is unavailable
                  (this environment has no network access to fetch one);
                  the fixed PRNGKey makes scores reproducible across runs
                  and machines.
  "torch:<path>"  A user-supplied torch module (torch.load or torch.jit.load)
                  mapping NCHW [-1,1] images to (N, D) features — plug in a
                  locally available InceptionV3 head for literature-
                  comparable FID. CPU-evaluated (torch in this image is
                  CPU-only); batched.

The reference has no counterpart (no quality metrics anywhere in its tree).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional, Sequence, Tuple

import numpy as np

FeatureFn = Callable[[np.ndarray], np.ndarray]

_RANDCONV_SEED = 20260817  # fixed: scores must be comparable across runs
_RANDCONV_WIDTHS = (32, 64, 128, 256)


def _to_nhwc_batch(images: np.ndarray) -> np.ndarray:
    x = np.asarray(images, np.float32)
    if x.ndim != 4 or x.shape[-1] not in (1, 3, 6):
        raise ValueError(f"expected NHWC images, got shape {x.shape}")
    return x


def _pixel_features(images: np.ndarray, res: int) -> np.ndarray:
    import jax.numpy as jnp
    from sdm_tpu.ops.resize import area_resize
    x = jnp.asarray(_to_nhwc_batch(images))
    small = area_resize(x, res, res)
    return np.asarray(small.reshape(small.shape[0], -1), np.float32)


def _randconv_params(in_channels: int):
    """HWIO conv kernels + biases from the fixed seed (He-scaled normal)."""
    import jax
    import jax.numpy as jnp
    key = jax.random.PRNGKey(_RANDCONV_SEED)
    params = []
    c_in = in_channels
    for c_out in _RANDCONV_WIDTHS:
        key, k1 = jax.random.split(key)
        fan_in = 3 * 3 * c_in
        w = (jax.random.normal(k1, (3, 3, c_in, c_out), jnp.float32)
             * np.sqrt(2.0 / fan_in))
        params.append((w, jnp.zeros((c_out,), jnp.float32)))
        c_in = c_out
    return params


def _randconv_forward(params, x):
    import jax
    import jax.numpy as jnp
    h = x.astype(jnp.bfloat16)
    for w, b in params:
        h = jax.lax.conv_general_dilated(
            h, w.astype(jnp.bfloat16), window_strides=(2, 2),
            padding="SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        h = h + b.astype(jnp.bfloat16)
        h = h * jax.nn.sigmoid(h)  # swish, as everywhere in the framework
    h = h.astype(jnp.float32)
    return jnp.concatenate([h.mean(axis=(1, 2)), h.max(axis=(1, 2))], axis=-1)


def _randconv_features(images: np.ndarray, res: int,
                       batch_size: int) -> np.ndarray:
    import jax
    import jax.numpy as jnp
    from sdm_tpu.ops.resize import area_resize
    x = _to_nhwc_batch(images)
    params = _randconv_params(x.shape[-1])
    fwd = jax.jit(partial(_randconv_forward, params))
    outs = []
    # Fixed batch size -> one compiled program; final partial batch is padded
    # (static shapes for XLA) and trimmed after.
    for i in range(0, len(x), batch_size):
        chunk = x[i:i + batch_size]
        n = len(chunk)
        if n < batch_size:
            chunk = np.concatenate(
                [chunk, np.zeros((batch_size - n,) + chunk.shape[1:],
                                 np.float32)])
        feats = fwd(area_resize(jnp.asarray(chunk), res, res))
        outs.append(np.asarray(feats[:n], np.float32))
    return np.concatenate(outs)


def _torch_features(images: np.ndarray, module_path: str,
                    batch_size: int) -> np.ndarray:
    import torch
    try:
        net = torch.jit.load(module_path, map_location="cpu")
    except Exception:
        net = torch.load(module_path, map_location="cpu", weights_only=False)
    net.eval()
    x = _to_nhwc_batch(images)
    outs = []
    with torch.no_grad():
        for i in range(0, len(x), batch_size):
            chunk = torch.from_numpy(
                x[i:i + batch_size].transpose(0, 3, 1, 2))  # NCHW
            f = net(chunk)
            if isinstance(f, (tuple, list)):
                f = f[0]
            outs.append(f.reshape(f.shape[0], -1).float().numpy())
    return np.concatenate(outs)


def make_feature_extractor(spec: str = "randconv",
                           batch_size: int = 64) -> Tuple[FeatureFn, str]:
    """Build a (N,H,W,C)[-1,1] -> (N,D) extractor from a spec string.

    Returns (fn, canonical_name). Specs: "pixel", "pixel:16", "randconv",
    "randconv:32", "torch:/path/to/module.pt".
    """
    if spec.startswith("torch:"):
        path = spec[len("torch:"):]
        if not path:
            raise ValueError("torch feature spec needs a path: torch:<path>")
        return (lambda imgs: _torch_features(imgs, path, batch_size),
                f"torch:{path}")
    name, _, arg = spec.partition(":")
    if name == "pixel":
        res = int(arg) if arg else 8
        return (lambda imgs: _pixel_features(imgs, res), f"pixel:{res}")
    if name == "randconv":
        res = int(arg) if arg else 64
        return (lambda imgs: _randconv_features(imgs, res, batch_size),
                f"randconv:{res}")
    raise ValueError(
        f"unknown feature spec {spec!r} (pixel[:R], randconv[:R], "
        "torch:<path>)")
