"""Pallas kernel numerical equivalence vs the XLA reference implementations
(interpret mode on CPU; the same kernels compile on TPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sdm_tpu.kernels.attention import (
    _xla_attention, _fused_attention_fwd_impl, fused_attention)
from sdm_tpu.kernels.adagn import _xla_adagn, _fused_adagn_impl, fused_adagn
from sdm_tpu.ops.norms import group_norm


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    from jax.experimental.pallas import tpu as pltpu
    with pltpu.force_tpu_interpret_mode():
        yield


def test_attention_kernel_matches_xla_query_softmax():
    rng = np.random.default_rng(0)
    n, s, h, d = 2, 256, 1, 128
    q = jnp.asarray(rng.standard_normal((n, s, h, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((n, s, h, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((n, s, h, d)).astype(np.float32))
    for axis in ("q", "k"):
        ours = _fused_attention_fwd_impl(q, k, v, d ** -0.5, axis)
        ref = _xla_attention(q, k, v, d ** -0.5, axis)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                                   rtol=2e-4, atol=2e-5)


def test_attention_kernel_multihead():
    rng = np.random.default_rng(1)
    n, s, h, d = 1, 128, 2, 128
    q, k, v = (jnp.asarray(rng.standard_normal((n, s, h, d)).astype(np.float32))
               for _ in range(3))
    ours = _fused_attention_fwd_impl(q, k, v, d ** -0.5, "q")
    ref = _xla_attention(q, k, v, d ** -0.5, "q")
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_attention_fallback_small_or_odd_shapes():
    rng = np.random.default_rng(2)
    # S=64 < 128 and D=96 not multiple of 128 -> must route to XLA, still correct.
    q, k, v = (jnp.asarray(rng.standard_normal((1, 64, 1, 96)).astype(np.float32))
               for _ in range(3))
    ours = fused_attention(q, k, v, 96 ** -0.5, "q")
    ref = _xla_attention(q, k, v, 96 ** -0.5, "q")
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=1e-5)


def test_attention_sr_grid_routes_to_xla():
    """S=4096 (256x256 SR models at layer 2) needs a 67 MB score tile — far
    over the ~16 MB VMEM — and must take the XLA path. With a larger budget
    the kernel passes tracing but fails TPU compilation at runtime."""
    from sdm_tpu.kernels.attention import _fits_vmem
    assert not _fits_vmem(4096, 512, 2)
    assert not _fits_vmem(2048, 128, 2)
    # Every 128x128-model grid stays on the kernel.
    assert _fits_vmem(1024, 512, 2)
    assert _fits_vmem(256, 128, 4)

    rng = np.random.default_rng(8)
    q, k, v = (jnp.asarray(rng.standard_normal((1, 4096, 1, 128))
                           .astype(np.float32)) for _ in range(3))
    ours = fused_attention(q, k, v, 128 ** -0.5, "q")
    ref = _xla_attention(q, k, v, 128 ** -0.5, "q")
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=1e-5)


def test_attention_grad_matches_xla():
    rng = np.random.default_rng(3)
    n, s, h, d = 1, 128, 1, 128
    q, k, v = (jnp.asarray(rng.standard_normal((n, s, h, d)).astype(np.float32))
               for _ in range(3))

    def loss_pallas(q, k, v):
        return jnp.sum(fused_attention(q, k, v, d ** -0.5, "q") ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(_xla_attention(q, k, v, d ** -0.5, "q") ** 2)

    g1 = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4)


def test_adagn_kernel_matches_reference_groupnorm_film():
    rng = np.random.default_rng(4)
    n, h, w, c, groups = 2, 8, 8, 128, 32
    x = jnp.asarray(rng.standard_normal((n, h, w, c)).astype(np.float32))
    gamma = jnp.asarray(rng.standard_normal((c,)).astype(np.float32))
    beta = jnp.asarray(rng.standard_normal((c,)).astype(np.float32))
    s = jnp.asarray(rng.standard_normal((n, c)).astype(np.float32))
    t = jnp.asarray(rng.standard_normal((n, c)).astype(np.float32))

    ours = _fused_adagn_impl(x, gamma, beta, s, t, groups, 1e-5)
    ref = (s[:, None, None, :] * group_norm(x, gamma, beta, groups)
           + t[:, None, None, :])
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_adagn_fallback_odd_channels():
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((1, 4, 4, 96)).astype(np.float32))
    gamma = jnp.ones((96,)); beta = jnp.zeros((96,))
    s = jnp.ones((1, 96)); t = jnp.zeros((1, 96))
    ours = fused_adagn(x, gamma, beta, s, t, 32)
    ref = _xla_adagn(x, gamma, beta, s, t, 32, 1e-5)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=1e-5,
                               atol=1e-6)


def test_adagn_grad_matches_xla():
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal((1, 4, 4, 128)).astype(np.float32))
    gamma = jnp.asarray(rng.standard_normal((128,)).astype(np.float32))
    beta = jnp.asarray(rng.standard_normal((128,)).astype(np.float32))
    s = jnp.asarray(rng.standard_normal((1, 128)).astype(np.float32))
    t = jnp.asarray(rng.standard_normal((1, 128)).astype(np.float32))

    g1 = jax.grad(lambda *a: jnp.sum(fused_adagn(*a, 32) ** 2),
                  argnums=(0, 1, 2, 3, 4))(x, gamma, beta, s, t)
    g2 = jax.grad(lambda *a: jnp.sum(_xla_adagn(*a, 32, 1e-5) ** 2),
                  argnums=(0, 1, 2, 3, 4))(x, gamma, beta, s, t)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3)


def test_unet_with_pallas_matches_without():
    from sdm_tpu.models import UNet
    cfg = dict(num_resnet_blocks=1, in_channel=3, out_channel=3, time_dim=16,
               cond_dim=None, num_layers=2, attn_layers=(1,), num_heads=1,
               dim_per_head=None, groups=32, min_channel=128, max_channel=128,
               image_recon=False)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 3)).astype(np.float32))
    t = jnp.array([500], jnp.int32)
    net = UNet(**cfg)
    params = net.init(jax.random.PRNGKey(0), x, t)["params"]
    net_p = UNet(**cfg, use_pallas=True)
    out = net.apply({"params": params}, x, t)
    out_p = net_p.apply({"params": params}, x, t)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out),
                               rtol=2e-3, atol=2e-4)
