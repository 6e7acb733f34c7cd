"""Conv / conv-transpose / group-norm numerics vs torch."""

import numpy as np
import jax.numpy as jnp
import torch

from sdm_tpu.ops.conv import conv2d, conv_transpose2d
from sdm_tpu.ops.norms import group_norm


def test_conv2d_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 9, 9, 5)).astype(np.float32)
    w = rng.standard_normal((7, 5, 3, 3)).astype(np.float32)  # torch OIHW
    b = rng.standard_normal((7,)).astype(np.float32)
    for stride, pad in [(1, 1), (2, 1), (1, 0)]:
        ours = conv2d(jnp.asarray(x), jnp.asarray(w.transpose(2, 3, 1, 0)),
                      jnp.asarray(b), stride=stride, padding=pad)
        theirs = torch.nn.functional.conv2d(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), torch.from_numpy(w),
            torch.from_numpy(b), stride=stride, padding=pad)
        np.testing.assert_allclose(np.asarray(ours),
                                   theirs.numpy().transpose(0, 2, 3, 1),
                                   rtol=1e-4, atol=1e-5)


def test_conv_transpose2d_matches_torch():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 6, 6, 5)).astype(np.float32)
    w = rng.standard_normal((5, 7, 4, 4)).astype(np.float32)  # torch (in,out,kh,kw)
    b = rng.standard_normal((7,)).astype(np.float32)
    ours = conv_transpose2d(jnp.asarray(x), jnp.asarray(w.transpose(2, 3, 0, 1)),
                            jnp.asarray(b), stride=2, padding=1)
    theirs = torch.nn.functional.conv_transpose2d(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), torch.from_numpy(w),
        torch.from_numpy(b), stride=2, padding=1)
    assert ours.shape == (2, 12, 12, 7)
    np.testing.assert_allclose(np.asarray(ours),
                               theirs.numpy().transpose(0, 2, 3, 1),
                               rtol=1e-4, atol=1e-5)


def test_group_norm_matches_torch():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((3, 5, 5, 32)).astype(np.float32)
    scale = rng.standard_normal((32,)).astype(np.float32)
    bias = rng.standard_normal((32,)).astype(np.float32)
    for groups in (1, 4, 32):
        ours = group_norm(jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias),
                          groups)
        gn = torch.nn.GroupNorm(groups, 32)
        with torch.no_grad():
            gn.weight.copy_(torch.from_numpy(scale))
            gn.bias.copy_(torch.from_numpy(bias))
            theirs = gn(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        np.testing.assert_allclose(np.asarray(ours),
                                   theirs.numpy().transpose(0, 2, 3, 1),
                                   rtol=1e-4, atol=1e-5)


def test_conv_transpose2d_subpixel_matches_dilated():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 6, 6, 8)).astype(np.float32)
    w = rng.standard_normal((8, 16, 4, 4)).astype(np.float32)
    b = rng.standard_normal((16,)).astype(np.float32)
    k = jnp.asarray(w.transpose(2, 3, 0, 1))
    base = conv_transpose2d(jnp.asarray(x), k, jnp.asarray(b),
                            stride=2, padding=1)
    sub = conv_transpose2d(jnp.asarray(x), k, jnp.asarray(b),
                           stride=2, padding=1, subpixel=True)
    np.testing.assert_allclose(np.asarray(sub), np.asarray(base),
                               rtol=1e-4, atol=1e-5)
