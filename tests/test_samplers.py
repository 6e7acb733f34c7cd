"""Sampler parity: scan-compiled samplers vs the reference's Python loops,
with the same converted model weights and (where stochastic) injected noise."""

import numpy as np
import jax
import jax.numpy as jnp
import torch

from sdm_tpu.models import UNet
from sdm_tpu.ops.schedules import LinearSchedule, CosineSchedule
from sdm_tpu.diffusion.samplers import (
    ddpm_sample, ddim_sample, cold_sample, ddim_step_list)
from sdm_tpu.io.torch_interop import torch_state_dict_to_params
from tests.reference_loader import load_reference

REF = load_reference()

CFG = dict(
    num_resnet_blocks=1,
    in_channel=3,
    out_channel=3,
    time_dim=16,
    cond_dim=None,
    num_layers=2,
    attn_layers=[1],
    num_heads=1,
    dim_per_head=None,
    groups=32,
    min_channel=32,
    max_channel=64,
    image_recon=False,
)


def _build_pair(cfg):
    torch.manual_seed(0)
    ref_net = REF.U_Net(**cfg)
    ref_net.eval()
    jcfg = dict(cfg, attn_layers=tuple(cfg["attn_layers"]))
    net = UNet(**jcfg)
    params = torch_state_dict_to_params(ref_net.state_dict())
    def model_fn(x, t, labels):
        return net.apply({"params": params}, x, t, labels)
    return ref_net, model_fn


def _nhwc(t):
    return t.numpy().transpose(0, 2, 3, 1)


def test_ddim_step_list_append_rule():
    assert ddim_step_list(1, 40, 7) == [40, 33, 26, 19, 12, 5, 1]
    assert ddim_step_list(1, 1000, 100) == list(range(1000, 0, -100)) + [1]
    assert ddim_step_list(1, 11, 5) == [11, 6, 1]
    assert ddim_step_list(5, 5, 10) == [5]


def test_ddim_parity_linear():
    ref_net, model_fn = _build_pair(CFG)
    sched = LinearSchedule.create(5e-3, 9e-3, 1000)
    ref_sched = REF.NoiseDegradation(5e-3, 9e-3, 1000, "cpu")
    x = np.random.default_rng(0).standard_normal((2, 16, 16, 3)).astype(np.float32)

    theirs = REF.ddim_sampling(
        ref_net, ref_sched, torch.from_numpy(x.transpose(0, 3, 1, 2)),
        min_noise=1, max_noise=40, ddim_step_size=7, log=lambda *a, **k: None)
    ours = jax.jit(lambda xt: ddim_sample(
        model_fn, sched, xt, min_noise=1, max_noise=40, ddim_step_size=7))(
        jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours), _nhwc(theirs),
                               rtol=5e-3, atol=5e-4)


def test_ddim_parity_cosine_returns_xt_when_min_not_one():
    ref_net, model_fn = _build_pair(CFG)
    sched = CosineSchedule.create(1000)
    ref_sched = REF.CosineNoiseDegradation(1000)
    x = np.random.default_rng(1).standard_normal((1, 16, 16, 3)).astype(np.float32)

    theirs = REF.ddim_sampling(
        ref_net, ref_sched, torch.from_numpy(x.transpose(0, 3, 1, 2)),
        min_noise=5, max_noise=30, ddim_step_size=10, log=lambda *a, **k: None)
    ours = ddim_sample(model_fn, sched, jnp.asarray(x),
                       min_noise=5, max_noise=30, ddim_step_size=10)
    np.testing.assert_allclose(np.asarray(ours), _nhwc(theirs),
                               rtol=5e-3, atol=5e-4)


def test_cold_parity_with_cond_img():
    cfg = dict(CFG, in_channel=6, image_recon=True)
    ref_net, model_fn = _build_pair(cfg)
    sched = LinearSchedule.create(5e-3, 9e-3, 1000)
    ref_sched = REF.NoiseDegradation(5e-3, 9e-3, 1000, "cpu")
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 16, 16, 3)).astype(np.float32)
    noise = rng.standard_normal((2, 16, 16, 3)).astype(np.float32)
    cond = rng.standard_normal((2, 16, 16, 3)).astype(np.float32)

    theirs = REF.cold_diffusion_sampling(
        ref_net, ref_sched, torch.from_numpy(x.transpose(0, 3, 1, 2)),
        torch.from_numpy(noise.transpose(0, 3, 1, 2)),
        min_noise=1, max_noise=35, skip_step_size=8,
        cond_img=torch.from_numpy(cond.transpose(0, 3, 1, 2)),
        log=lambda *a, **k: None)
    ours = cold_sample(model_fn, sched, jnp.asarray(x), jnp.asarray(noise),
                       min_noise=1, max_noise=35, skip_step_size=8,
                       cond_img=jnp.asarray(cond))
    np.testing.assert_allclose(np.asarray(ours), _nhwc(theirs),
                               rtol=5e-3, atol=5e-4)


def test_ddpm_parity_injected_noise():
    ref_net, model_fn = _build_pair(CFG)
    sched = LinearSchedule.create(5e-3, 9e-3, 1000)
    ref_sched = REF.NoiseDegradation(5e-3, 9e-3, 1000, "cpu")
    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 16, 16, 3)).astype(np.float32)
    max_noise, min_noise = 20, 1
    num_steps = max_noise - min_noise + 1
    zs = rng.standard_normal((num_steps, 1, 16, 16, 3)).astype(np.float32)

    # Inject the same z sequence into the reference via torch.randn patch.
    z_iter = iter(zs)
    real_randn = torch.randn
    def fake_randn(*shape, **kwargs):
        z = next(z_iter).transpose(0, 3, 1, 2)
        return torch.from_numpy(np.ascontiguousarray(z))
    torch.randn = fake_randn
    try:
        theirs = REF.ddpm_sampling(
            ref_net, ref_sched, torch.from_numpy(x.transpose(0, 3, 1, 2)),
            min_noise=min_noise, max_noise=max_noise, log=lambda *a, **k: None)
    finally:
        torch.randn = real_randn

    ours = ddpm_sample(model_fn, sched, jnp.asarray(x),
                       min_noise=min_noise, max_noise=max_noise,
                       zs=jnp.asarray(zs))
    np.testing.assert_allclose(np.asarray(ours), _nhwc(theirs),
                               rtol=5e-3, atol=5e-4)


def test_ddim_eta_matches_torch():
    """The eta > 0 branch (stochastic DDIM) is this framework's extension —
    the reference computes the same sigma expression but hardcodes eta = 0
    (diffusion_sampling_algorithms.py:84-86, :120-126). Pin the eta-sigma
    formula numerically against an independent torch implementation of the
    Song et al. (2021) eq. 12/16 update, with the real (converted) reference
    U-Net as the denoiser and injected per-step noise on both sides."""
    ref_net, model_fn = _build_pair(CFG)
    sched = LinearSchedule.create(5e-3, 9e-3, 1000)
    ref_sched = REF.NoiseDegradation(5e-3, 9e-3, 1000, "cpu")
    eta = 0.7
    min_noise, max_noise, step_size = 1, 40, 7
    steps = ddim_step_list(min_noise, max_noise, step_size)
    rng = np.random.default_rng(4)
    x = rng.standard_normal((2, 16, 16, 3)).astype(np.float32)
    zs = rng.standard_normal((len(steps) - 1, 2, 16, 16, 3)).astype(np.float32)

    # Torch-side eta-DDIM: the reference's ddim_sampling loop with eta as a
    # real parameter and the per-step noise injected.
    x_t = torch.from_numpy(x.transpose(0, 3, 1, 2))
    with torch.no_grad():
        for count in range(len(steps)):
            t = torch.tensor([steps[count]])
            noise_approx = ref_net(x_t, t, None)
            _, _, abar_t = ref_sched.get_timestep_params(t)
            x0_approx = (x_t - (1 - abar_t) ** 0.5 * noise_approx) / abar_t ** 0.5
            if count < len(steps) - 1:
                tm1 = torch.tensor([steps[count + 1]])
                _, _, abar_tm1 = ref_sched.get_timestep_params(tm1)
                sigma = eta * (((1 - abar_tm1) / (1 - abar_t)) ** 0.5
                               * (1 - abar_t / abar_tm1) ** 0.5)
                eps = torch.from_numpy(
                    np.ascontiguousarray(zs[count].transpose(0, 3, 1, 2)))
                x_t = (abar_tm1 ** 0.5 * x0_approx
                       + (1 - abar_tm1 - sigma ** 2) ** 0.5 * noise_approx
                       + sigma * eps)
    theirs = x0_approx if steps[-1] == 1 else x_t

    ours = jax.jit(lambda xt, z: ddim_sample(
        model_fn, sched, xt, min_noise=min_noise, max_noise=max_noise,
        ddim_step_size=step_size, eta=eta, zs=z))(
        jnp.asarray(x), jnp.asarray(zs))
    np.testing.assert_allclose(np.asarray(ours), _nhwc(theirs),
                               rtol=5e-3, atol=5e-4)


def test_ddim_eta_rng_path_runs():
    _, model_fn = _build_pair(CFG)
    sched = LinearSchedule.create(5e-3, 9e-3, 1000)
    x = jnp.zeros((1, 16, 16, 3))
    out = jax.jit(lambda xt, k: ddim_sample(
        model_fn, sched, xt, rng=k, min_noise=1, max_noise=30,
        ddim_step_size=10, eta=0.5))(x, jax.random.PRNGKey(0))
    assert out.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(out)))


def test_ddpm_rng_path_runs():
    _, model_fn = _build_pair(CFG)
    sched = CosineSchedule.create(1000)
    x = jnp.zeros((1, 16, 16, 3))
    out = jax.jit(lambda xt, k: ddpm_sample(
        model_fn, sched, xt, rng=k, min_noise=1, max_noise=5))(
        x, jax.random.PRNGKey(0))
    assert out.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(out)))


def test_cold_sample_steps_override():
    """cold_sample steps= (TPU-build extension): an explicit list equal to
    the uniform skip list reproduces the skip_step_size path exactly, and a
    non-uniform (Karras-like) list runs the same program shape."""
    cfg = dict(CFG, image_recon=True)
    _, model_fn = _build_pair(cfg)
    sched = LinearSchedule.create(5e-3, 9e-3, 1000)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 3)).astype(np.float32))
    noise = jnp.asarray(
        rng.standard_normal((1, 16, 16, 3)).astype(np.float32))

    uniform = cold_sample(model_fn, sched, x, noise,
                          min_noise=1, max_noise=35, skip_step_size=8)
    explicit = cold_sample(model_fn, sched, x, noise,
                           min_noise=1, max_noise=35, skip_step_size=999,
                           steps=ddim_step_list(1, 35, 8))
    np.testing.assert_array_equal(np.asarray(uniform), np.asarray(explicit))

    warped = cold_sample(model_fn, sched, x, noise,
                         min_noise=1, max_noise=35,
                         steps=[35, 22, 12, 5, 2, 1])
    assert warped.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(warped)))
    # Random weights make the final x0_hat nearly path-independent, so the
    # warped list moves the output only slightly — but it must move it.
    assert np.abs(np.asarray(warped) - np.asarray(uniform)).max() > 0


def test_inpaint_full_mask_returns_known_all_samplers():
    """The shared RePaint hook (_inpaint_ctx/_project/_finalize): with
    mask == 1 everywhere the final output equals the known image exactly
    for ddim, dpmpp AND heun (the hook generalization VERDICT r3 item 7
    asked for), and partial masks keep the known half exact."""
    from sdm_tpu.diffusion.samplers import dpmpp_sample, heun_sample

    _, model_fn = _build_pair(CFG)
    sched = LinearSchedule.create(5e-3, 9e-3, 1000)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 3)).astype(np.float32))
    known = jnp.asarray(
        rng.standard_normal((2, 16, 16, 3)).astype(np.float32))
    pnoise = jnp.asarray(
        rng.standard_normal((2, 16, 16, 3)).astype(np.float32))
    full = jnp.ones((16, 16, 1), jnp.float32)
    half = full.at[:, 8:, :].set(0.0)

    for fn, kw in ((ddim_sample, dict(ddim_step_size=8)),
                   (dpmpp_sample, dict(step_size=8)),
                   (heun_sample, dict(step_size=8))):
        out = fn(model_fn, sched, x, min_noise=1, max_noise=35,
                 inpaint_known=known, inpaint_mask=full,
                 inpaint_noise=pnoise, **kw)
        np.testing.assert_allclose(np.asarray(out), np.asarray(known),
                                   rtol=0, atol=1e-6)
        part = fn(model_fn, sched, x, min_noise=1, max_noise=35,
                  inpaint_known=known, inpaint_mask=half,
                  inpaint_noise=pnoise, **kw)
        np.testing.assert_allclose(np.asarray(part)[:, :, :8],
                                   np.asarray(known)[:, :, :8],
                                   rtol=0, atol=1e-6)
        assert np.abs(np.asarray(part)[:, :, 8:]
                      - np.asarray(known)[:, :, 8:]).max() > 1e-3
        # Incomplete inpaint argument sets fail loudly.
        import pytest as _pytest
        with _pytest.raises(ValueError, match="together"):
            fn(model_fn, sched, x, min_noise=1, max_noise=35,
               inpaint_known=known, **kw)
