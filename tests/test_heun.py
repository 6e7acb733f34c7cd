"""Heun (2nd-order predictor-corrector) sampler + Karras step spacing —
TPU-build extensions beyond the reference's DDPM/DDIM/cold set
(/root/reference/diffusion_sampling_algorithms.py).

No reference counterpart exists, so the pins are mathematical and internal
(same strategy as tests/test_dpm_solver.py):

  - coordinate pin: Euler in the (x/alpha, sigma/alpha) coordinates is
    EXACTLY the DDIM eta=0 update, so with a state-independent eps
    predictor (corrector slope == predictor slope) heun must equal ddim
    bit-for-bit per transition.
  - analytic probability-flow pin: for Gaussian data the exact flow map is
    closed-form; heun must land far closer than ddim at equal step counts
    and decay ~2nd-order under refinement while ddim stays ~1st-order.
  - ddim step-list/return-rule semantics (x0 at step 1, x_t otherwise for
    ensemble chaining).
  - karras_step_list: pinned endpoints, strict monotonicity, low-noise
    concentration, and acceptance by ddim/dpmpp/heun via steps=.
  - wiring: generator CLI --diff_alg heun / --karras and
    SamplerEngine(diff_alg="heun") agree with direct sampler calls.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sdm_tpu.ops.schedules import LinearSchedule, CosineSchedule
from sdm_tpu.diffusion.samplers import (
    ddim_sample, dpmpp_sample, heun_sample, ddim_step_list,
    karras_step_list)

from tests.test_dpm_solver import _exact_model, _analytic_endpoint


def test_heun_equals_ddim_for_state_independent_eps():
    # The corrector slope equals the predictor slope when eps_hat ignores
    # (x, t), so heun reduces to its predictor — which must be the DDIM
    # eta=0 update exactly (Euler in y = x/alpha, s = sigma/alpha).
    schedule = LinearSchedule.create(5e-3, 9e-3, 1000)
    const_eps = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 3),
                                  jnp.float32)
    model_fn = lambda x, t, labels: jnp.broadcast_to(const_eps, x.shape)
    x_T = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 3), jnp.float32)
    a = heun_sample(model_fn, schedule, x_T, min_noise=100, max_noise=1000,
                    step_size=100)
    b = ddim_sample(model_fn, schedule, x_T, min_noise=100, max_noise=1000,
                    ddim_step_size=100)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("schedule,t_max", [
    (LinearSchedule.create(5e-3, 9e-3, 1000), 1000),
    # Cosine alpha_bar(T) ~ 0: start below the singular endpoint, as real
    # ensemble / max_actual_noise_step configs do (see test_dpm_solver.py).
    (CosineSchedule.create(1000), 900),
], ids=["linear", "cosine"])
def test_heun_beats_ddim_and_is_second_order(schedule, t_max):
    model_fn = _exact_model(schedule)
    x_T = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 3), jnp.float32)
    # Stop at step 100 (not 1) so both samplers return x_t, not x0.
    want = _analytic_endpoint(schedule, x_T, t_max, 100)

    def err(sampler, step_size, **kw):
        got = sampler(model_fn, schedule, x_T, min_noise=100,
                      max_noise=t_max, **kw, **{
                          "ddim_step_size" if sampler is ddim_sample
                          else "step_size": step_size})
        return float(np.abs(np.asarray(got, np.float64) - want).max())

    e_ddim_c, e_ddim_f = err(ddim_sample, 50), err(ddim_sample, 12)
    e_heun_c, e_heun_f = err(heun_sample, 50), err(heun_sample, 12)

    # At equal (coarse) step counts the 2nd-order solver is far closer.
    assert e_heun_c < 0.35 * e_ddim_c, (e_heun_c, e_ddim_c)
    # ~4x more steps: ~16x decay for a 2nd-order method, ~4x for 1st-order.
    assert e_heun_c / e_heun_f > 8.0, (e_heun_c, e_heun_f)
    assert e_ddim_c / e_ddim_f < 8.0, (e_ddim_c, e_ddim_f)


def test_heun_return_rule_and_chaining():
    schedule = LinearSchedule.create(5e-3, 9e-3, 1000)
    model_fn = _exact_model(schedule)
    x_T = jax.random.normal(jax.random.PRNGKey(3), (1, 8, 8, 3), jnp.float32)
    # min_noise > 1 => returns x_t at that level; the two-stage chain stays
    # on the analytic trajectory within discretization error.
    x_mid = heun_sample(model_fn, schedule, x_T, min_noise=501,
                        max_noise=1000, step_size=25)
    x_end = heun_sample(model_fn, schedule, x_mid, min_noise=100,
                        max_noise=500, step_size=25)
    want = _analytic_endpoint(schedule, x_T, 1000, 100)
    assert np.abs(np.asarray(x_end, np.float64) - want).max() < 2e-2
    # min_noise == 1 => x0 conversion at the end (not x_1): the narrow-data
    # x0 estimate visibly shrinks x_1 (same construction as
    # test_dpmpp_return_rule_is_x0_at_step_1).
    s2 = 0.01
    model_n = _exact_model(schedule, s2)
    out = heun_sample(model_n, schedule, x_T, min_noise=1, max_noise=1000,
                      step_size=10)
    x_1 = _analytic_endpoint(schedule, x_T, 1000, 1, s2)
    abar1 = float(schedule.alpha_bar_at(jnp.array([1]))[0])
    v1 = abar1 * s2 + (1.0 - abar1)
    want_x0 = np.sqrt(abar1) * s2 / v1 * x_1
    got = np.asarray(out, np.float64)
    assert np.abs(got - want_x0).max() < 2e-2
    assert np.abs(got - x_1).max() > 0.1


# --------------------------------------------------- Karras step spacing

def test_karras_step_list_shape_and_concentration():
    schedule = LinearSchedule.create(5e-3, 9e-3, 1000)
    uniform = ddim_step_list(1, 1000, 50)
    steps = karras_step_list(1, 1000, len(uniform), schedule)
    assert steps[0] == 1000 and steps[-1] == 1
    assert all(a > b for a, b in zip(steps, steps[1:]))  # strictly dec.
    assert 2 <= len(steps) <= len(uniform)
    # rho-warping concentrates steps at LOW noise: the final (lowest-noise)
    # gap must be several times smaller than the first (highest-noise) one.
    gaps = [a - b for a, b in zip(steps, steps[1:])]
    assert gaps[-1] * 5 <= gaps[0], steps
    # Endpoint degenerate cases.
    assert karras_step_list(1, 1, 5, schedule) == [1]
    assert karras_step_list(1, 1000, 1, schedule) == [1000, 1]


def test_samplers_accept_karras_steps():
    schedule = LinearSchedule.create(5e-3, 9e-3, 1000)
    model_fn = _exact_model(schedule)
    x_T = jax.random.normal(jax.random.PRNGKey(5), (2, 8, 8, 3), jnp.float32)
    want = _analytic_endpoint(schedule, x_T, 1000, 100)
    n = len(ddim_step_list(100, 1000, 50))
    steps = karras_step_list(100, 1000, n, schedule)
    for sampler in (ddim_sample, dpmpp_sample, heun_sample):
        got = sampler(model_fn, schedule, x_T, steps=steps)
        err = np.abs(np.asarray(got, np.float64) - want).max()
        assert err < 5e-2, (sampler.__name__, err)
    # And they must differ from the uniform-spaced trajectory (the list is
    # actually used, not the default).
    a = heun_sample(model_fn, schedule, x_T, steps=steps)
    b = heun_sample(model_fn, schedule, x_T, min_noise=100, max_noise=1000,
                    step_size=50)
    assert np.abs(np.asarray(a) - np.asarray(b)).max() > 1e-5


def test_heun_cond_img_and_labels_passthrough():
    schedule = LinearSchedule.create(5e-3, 9e-3, 100)
    seen = {}

    def model_fn(x, t, labels):
        seen["channels"] = x.shape[-1]
        seen["labels"] = labels is not None
        return 0.1 * x[..., :3] + x[..., 3:]

    x_T = jax.random.normal(jax.random.PRNGKey(4), (2, 8, 8, 3), jnp.float32)
    cond = jnp.ones_like(x_T)
    lab = jnp.ones((2, 4), jnp.float32)
    a = heun_sample(model_fn, schedule, x_T, min_noise=10, max_noise=100,
                    step_size=30, cond_img=cond, labels=lab)
    assert seen == {"channels": 6, "labels": True}
    b = heun_sample(model_fn, schedule, x_T, min_noise=10, max_noise=100,
                    step_size=30, cond_img=2.0 * cond, labels=lab)
    assert np.abs(np.asarray(a) - np.asarray(b)).max() > 1e-3


# ----------------------------------------------------------- wiring pins

def test_generator_cli_heun_and_karras(tmp_path):
    from sdm_tpu.cli.generate_images_diffusion import generate_images_diffusion
    from tests.test_extensions import _export_bundle_with_ema
    cfg, _ = _export_bundle_with_ema(tmp_path)
    base = ["-c", cfg, "-n", "2", "--ddim_step_size", "4", "-T", "10",
            "-s", "7"]
    quiet = dict(save_locally=False, log=lambda *a, **k: None)
    heun = generate_images_diffusion(base + ["--diff_alg", "heun"], **quiet)
    ddim = generate_images_diffusion(base + ["--diff_alg", "ddim"], **quiet)
    assert heun.shape == ddim.shape == (2, 16, 16, 3)
    assert np.isfinite(heun).all()
    # Same seed/noise, different solver: the corrector makes a small but
    # real difference while both integrate the same ODE.
    assert 2e-5 < np.abs(heun - ddim).max() < 1.0
    # --karras reshapes the step list: output changes but stays finite.
    kar = generate_images_diffusion(
        base + ["--diff_alg", "heun", "--karras"], **quiet)
    assert np.isfinite(kar).all()
    assert np.abs(kar - heun).max() > 1e-6
    # --karras is rejected for non-ODE samplers.
    with pytest.raises(ValueError, match="karras"):
        generate_images_diffusion(
            base + ["--diff_alg", "ddpm", "--karras"], **quiet)


def test_engine_heun_matches_generator_cli(tmp_path):
    from sdm_tpu.serving import SamplerEngine
    from sdm_tpu.cli.generate_images_diffusion import generate_images_diffusion
    from tests.test_extensions import _export_bundle_with_ema
    cfg, _ = _export_bundle_with_ema(tmp_path)
    eng = SamplerEngine(cfg, diff_alg="heun", step_size=4, max_T=10,
                        max_batch=4, log=lambda *a, **k: None)
    got = eng.generate(4, seed=7)
    want = generate_images_diffusion(
        ["-c", cfg, "-n", "4", "-s", "7", "--diff_alg", "heun",
         "--ddim_step_size", "4", "-T", "10"],
        save_locally=False, log=lambda *a, **k: None)
    assert got.shape == want.shape == (4, 16, 16, 3)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_engine_karras_matches_generator_cli(tmp_path):
    """SamplerEngine(karras=True) == generator CLI --karras (serving
    feature parity for the Karras spacing, ADVICE r3 item 3)."""
    from sdm_tpu.serving import SamplerEngine
    from sdm_tpu.cli.generate_images_diffusion import generate_images_diffusion
    from tests.test_extensions import _export_bundle_with_ema
    cfg, _ = _export_bundle_with_ema(tmp_path)
    eng = SamplerEngine(cfg, diff_alg="heun", step_size=4, max_T=10,
                        max_batch=4, karras=True, log=lambda *a, **k: None)
    got = eng.generate(4, seed=7)
    want = generate_images_diffusion(
        ["-c", cfg, "-n", "4", "-s", "7", "--diff_alg", "heun",
         "--ddim_step_size", "4", "-T", "10", "--karras"],
        save_locally=False, log=lambda *a, **k: None)
    assert got.shape == want.shape == (4, 16, 16, 3)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    # The spacing actually changed the program vs the uniform engine.
    uni = SamplerEngine(cfg, diff_alg="heun", step_size=4, max_T=10,
                        max_batch=4, log=lambda *a, **k: None)
    assert np.abs(uni.generate(4, seed=7) - got).max() > 1e-6
    with pytest.raises(ValueError, match="karras"):
        SamplerEngine(cfg, diff_alg="ddpm", karras=True,
                      log=lambda *a, **k: None)


def test_inpainting_dpmpp_heun_keep_known_region(tmp_path):
    """--inpaint_img_path works with dpmpp/heun too (the RePaint hook is
    sampler-shared, VERDICT r3 item 7): kept region exact, rest synthesized,
    and the two solvers produce different syntheses from the same seed."""
    import cv2
    from sdm_tpu.cli.generate_images_diffusion import generate_images_diffusion
    from tests.test_extensions import _export_bundle_with_ema
    cfg, _ = _export_bundle_with_ema(tmp_path)

    rng_img = np.random.default_rng(8)
    known_u8 = rng_img.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    known_path = str(tmp_path / "known.png")
    cv2.imwrite(known_path, known_u8)
    mask = np.zeros((16, 16), np.uint8)
    mask[:8, :] = 255  # keep the top half
    mask_path = str(tmp_path / "mask.png")
    cv2.imwrite(mask_path, mask)
    known = (cv2.imread(known_path).astype(np.float32) - 127.5) / 127.5

    outs = {}
    for alg in ("dpmpp", "heun"):
        got = generate_images_diffusion(raw_args=[
            "-c", cfg, "-n", "2", "-s", "13", "--diff_alg", alg,
            "--ddim_step_size", "4", "-T", "10",
            "--inpaint_img_path", known_path,
            "--inpaint_mask_path", mask_path,
        ], log=lambda *a, **k: None, save_locally=False)
        got = np.asarray(got)
        np.testing.assert_allclose(
            got[:, :8], np.repeat(known[None], 2, 0)[:, :8],
            rtol=0, atol=1e-6)
        assert np.abs(got[:, 8:]
                      - np.repeat(known[None], 2, 0)[:, 8:]).max() > 0.1
        outs[alg] = got
    assert np.abs(outs["dpmpp"] - outs["heun"]).max() > 1e-6
