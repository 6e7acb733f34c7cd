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
    # The env var pins sdm_tpu.kernels.partitioning.tpu_interpret_mode()
    # without relying on jax's private config flag (ADVICE r2).
    monkeypatch.setenv("SDM_TPU_PALLAS_INTERPRET", "1")
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
    over the ~16 MB VMEM — so the whole-tile kernel must refuse it (the
    dispatcher sends it to the streaming two-pass kernel on TPU and to XLA
    elsewhere; `fused_attention` itself falls back to XLA)."""
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


@pytest.mark.parametrize("axis", ["q", "k"])
def test_fused_attention_block_matches_xla_composite(axis):
    """Whole-block fusion (qkv proj + softmax + out proj + residual in one
    kernel) == the XLA composite it replaces, fwd and grads (grads go through
    the rematerialized XLA backward, so this pins the wiring)."""
    from sdm_tpu.kernels.attention_block import (
        fused_attention_block, _xla_block, supports)
    assert supports(256, 128, 128, 1, 4)
    assert not supports(256, 128, 128, 2, 4)    # multi-head: composed path
    assert not supports(64, 128, 128, 1, 4)     # tiny grid
    assert not supports(4096, 512, 512, 1, 2)   # SR grid: over VMEM

    rng = np.random.default_rng(20)
    n, s, c = 2, 256, 128
    tok = jnp.asarray(rng.standard_normal((n, s, c)).astype(np.float32))
    w_qkv = jnp.asarray(rng.standard_normal((c, 3 * c)).astype(np.float32) * 0.05)
    b_qkv = jnp.asarray(rng.standard_normal((3 * c,)).astype(np.float32) * 0.05)
    w_out = jnp.asarray(rng.standard_normal((c, c)).astype(np.float32) * 0.05)
    b_out = jnp.asarray(rng.standard_normal((c,)).astype(np.float32) * 0.05)
    args = (tok, w_qkv, b_qkv, w_out, b_out)

    ours = fused_attention_block(*args, c ** -0.5, axis)
    ref = _xla_block(*args, c ** -0.5, axis)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)

    g1 = jax.grad(lambda *a: jnp.sum(
        fused_attention_block(*a, c ** -0.5, axis) ** 2), argnums=(0, 1, 2, 3, 4))(*args)
    g2 = jax.grad(lambda *a: jnp.sum(
        _xla_block(*a, c ** -0.5, axis) ** 2), argnums=(0, 1, 2, 3, 4))(*args)
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


def _streaming_xla_ref(q2, k2, v2, scale, softmax_axis="q"):
    o = _xla_attention(q2[:, :, None, :], k2[:, :, None, :],
                       v2[:, :, None, :], scale, softmax_axis)
    return o[:, :, 0, :]


@pytest.mark.parametrize("axis", ["q", "k"])
@pytest.mark.parametrize("dtype", [np.float32, "bfloat16"])
def test_streaming_attention_fwd_matches_xla(dtype, axis):
    """Two-pass streaming kernel == XLA softmax on both axes (query-axis =
    reference parity quirk; key-axis = standard flash), multi-tile grid
    (S=512 with 256-tiles exercises the running-stats and accumulation
    paths)."""
    from sdm_tpu.kernels.streaming_attention import streaming_attention
    rng = np.random.default_rng(10)
    bh, s, d = 2, 512, 128
    cast = (lambda a: jnp.asarray(a, jnp.bfloat16)) if dtype == "bfloat16" \
        else jnp.asarray
    q, k, v = (cast(rng.standard_normal((bh, s, d)).astype(np.float32))
               for _ in range(3))
    ours = streaming_attention(q, k, v, d ** -0.5, axis)
    ref = _streaming_xla_ref(q, k, v, d ** -0.5, axis)
    tol = dict(rtol=2e-4, atol=2e-5) if dtype == np.float32 else \
        dict(rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(ours, np.float32),
                               np.asarray(ref, np.float32), **tol)


@pytest.mark.parametrize("axis", ["q", "k"])
def test_streaming_attention_grads_match_xla(axis):
    """Custom streamed VJP (dQ, dK, dV via tile-recomputed P and the
    softmax-Jacobian correction — c_j = dV.V for the query axis, D_i = g.out
    for the key axis) == autodiff through XLA."""
    from sdm_tpu.kernels.streaming_attention import streaming_attention
    rng = np.random.default_rng(11)
    bh, s, d = 1, 512, 128
    q, k, v = (jnp.asarray(rng.standard_normal((bh, s, d)).astype(np.float32))
               for _ in range(3))

    def loss_s(q, k, v):
        return jnp.sum(jnp.sin(streaming_attention(q, k, v, d ** -0.5, axis)))

    def loss_r(q, k, v):
        return jnp.sum(jnp.sin(_streaming_xla_ref(q, k, v, d ** -0.5, axis)))

    gs = jax.grad(loss_s, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", gs, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-5, err_msg=f"d{name}")


def test_attention_dispatcher_modes(monkeypatch):
    """mode=False -> always XLA; "auto" -> streaming only at S >= 2048 on a
    TPU backend; True -> whole-tile when it fits, streaming when not."""
    import sdm_tpu.kernels.attention as ka
    calls = []
    monkeypatch.setattr(ka, "_kernel_backend", lambda: True)
    monkeypatch.setattr(ka, "_streaming_4d",
                        lambda q, k, v, scale, ax="q": calls.append("stream")
                        or _xla_attention(q, k, v, scale, ax))
    monkeypatch.setattr(ka, "fused_attention",
                        lambda q, k, v, scale, ax: calls.append("tile")
                        or _xla_attention(q, k, v, scale, ax))
    rng = np.random.default_rng(12)
    mk = lambda s, d: tuple(
        jnp.asarray(rng.standard_normal((1, s, 1, d)).astype(np.float32))
        for _ in range(3))

    q, k, v = mk(256, 128)
    ka.attention(q, k, v, 128 ** -0.5, "q", mode=False)
    assert calls == []                      # parity path: no kernels
    ka.attention(q, k, v, 128 ** -0.5, "q", mode="auto")
    assert calls == []                      # small grid: XLA in auto
    ka.attention(q, k, v, 128 ** -0.5, "q", mode=True)
    assert calls == ["tile"]                # fits VMEM -> whole-tile

    q, k, v = mk(4096, 128)
    ka.attention(q, k, v, 128 ** -0.5, "q", mode="auto")
    assert calls == ["tile", "stream"]      # big grid: streaming in auto
    ka.attention(q, k, v, 128 ** -0.5, "q", mode=True)
    assert calls == ["tile", "stream", "stream"]  # no VMEM fit -> streaming
    ka.attention(q, k, v, 128 ** -0.5, "k", mode="auto")
    # Key-axis (parity=False) big grids stream too (VERDICT r2 weakness 5:
    # previously they silently fell back to the XLA S^2 path).
    assert calls == ["tile", "stream", "stream", "stream"]


def test_partition_with_replicated_weight_args():
    """batch_argnums selects which args shard on dim 0; the rest must be
    fully replicated — the layout the whole-block attention kernel uses
    (tokens sharded, projection weights/biases replicated). Pin values,
    output sharding, and no all-gather of the batch operand."""
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from sdm_tpu.kernels.partitioning import batch_partitioned

    fn = batch_partitioned(
        lambda t, w, b: jnp.einsum("nsc,ce->nse", t, w) + b[0][None, None, :],
        "n s c, c e, u e -> n s e",
        need_replication=("s", "c", "e", "u"),
        batch_argnums=(0,))

    rng = np.random.default_rng(4)
    t = jnp.asarray(rng.standard_normal((8, 16, 4)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((4, 6)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((1, 6)).astype(np.float32))
    expect = np.einsum("nsc,ce->nse", np.asarray(t), np.asarray(w)) + \
        np.asarray(b)[0][None, None, :]

    mesh = Mesh(np.array(jax.devices()), ("data",))
    ts = jax.device_put(t, NamedSharding(mesh, P("data")))
    ws = jax.device_put(w, NamedSharding(mesh, P()))
    bs = jax.device_put(b, NamedSharding(mesh, P()))
    jitted = jax.jit(fn)
    out = jitted(ts, ws, bs)
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-5, atol=1e-5)
    assert out.sharding.spec[0] == "data", out.sharding
    hlo = jitted.lower(ts, ws, bs).compile().as_text()
    assert "all-gather" not in hlo


def test_partition_batch0_shards_over_dim0_without_gather():
    """The custom_partitioning wrapper used by streaming_attention must run
    per-shard over dim 0 on a sharded mesh — correct values, sharded output,
    and no all-gather of the operands in the compiled module. (The pallas
    kernels themselves can't partition under interpret mode, so a pure-jnp
    stand-in with the same batch-leading signature pins the GSPMD plumbing.)"""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from sdm_tpu.kernels.partitioning import batch_partitioned

    fn = batch_partitioned(
        lambda q, k, v: (jnp.tanh(q) + k * v,
                         jnp.max(q, axis=-1, keepdims=True).transpose(0, 2, 1)),
        "b s d, b s d, b s d -> b s d, b u s",
        need_replication=("s", "d", "u"))

    rng = np.random.default_rng(3)
    q, k, v = (jnp.asarray(rng.standard_normal((8, 16, 4)).astype(np.float32))
               for _ in range(3))
    expect_out = np.tanh(np.asarray(q)) + np.asarray(k) * np.asarray(v)

    mesh = Mesh(np.array(jax.devices()), ("data",))
    shard = NamedSharding(mesh, P("data"))
    qs, ks, vs = (jax.device_put(x, shard) for x in (q, k, v))
    jitted = jax.jit(fn)
    out, stat = jitted(qs, ks, vs)
    np.testing.assert_allclose(np.asarray(out), expect_out, rtol=1e-5,
                               atol=1e-6)
    assert out.sharding.spec[0] == "data", out.sharding
    assert stat.shape == (8, 1, 16)
    hlo = jitted.lower(qs, ks, vs).compile().as_text()
    assert "all-gather" not in hlo
