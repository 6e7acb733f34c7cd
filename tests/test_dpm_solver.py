"""DPM-Solver++(2M) sampler — a TPU-build extension beyond the reference's
DDPM/DDIM/cold set (/root/reference/diffusion_sampling_algorithms.py).

No reference counterpart exists, so the pins are mathematical and internal:

  - analytic probability-flow pin: for Gaussian data N(0, s^2 I) both the
    exact eps-predictor and the exact probability-flow ODE flow map are
    closed-form, so the solver's discretization error is measurable exactly.
    dpmpp must land much closer to the analytic endpoint than ddim at equal
    step counts, and its error must decay ~2nd-order under step refinement
    while ddim stays ~1st-order.
  - single-transition reduction: with one transition the 2M update (c_0 = 0)
    is algebraically identical to the DDIM eta=0 update — asserted exactly.
  - ddim step-list/return-rule semantics (append-min, x0 at step 1, x_t
    otherwise for ensemble chaining).
  - wiring: generator CLI --diff_alg dpmpp (sequential + --pipeline) and
    SamplerEngine(diff_alg="dpmpp") agree with direct sampler calls.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sdm_tpu.ops.schedules import LinearSchedule, CosineSchedule
from sdm_tpu.diffusion.samplers import (
    ddim_sample, dpmpp_sample, ddim_step_list)


# ------------------------------------------------- analytic Gaussian pin
#
# Data ~ N(0, s^2 I). The diffused marginal at step t is
# N(0, v_t I) with v_t = abar_t s^2 + (1 - abar_t), the exact eps-predictor
# is eps*(x, t) = sqrt(1 - abar_t) x / v_t, and the probability-flow ODE's
# flow map from step T to step t is the pure scaling x_t = sqrt(v_t/v_T) x_T
# (linear Gaussian: the deterministic flow transports N(0, v_T) to N(0, v_t)).

S2 = 0.16  # data variance — far from 1 so x0(x, t) varies strongly with t


def _exact_model(schedule, s2=S2):
    def model_fn(x, t, labels):
        abar = schedule.alpha_bar_at(t).astype(jnp.float32)
        v = abar * s2 + (1.0 - abar)
        return (1.0 - abar) ** 0.5 * x / v
    return model_fn


def _analytic_endpoint(schedule, x_T, t_from, t_to, s2=S2):
    abar = np.asarray(
        schedule.alpha_bar_at(jnp.array([t_from, t_to]))).astype(np.float64)
    v = abar * s2 + (1.0 - abar)
    return np.asarray(x_T, np.float64) * np.sqrt(v[1] / v[0])


@pytest.mark.parametrize("schedule,t_max", [
    (LinearSchedule.create(5e-3, 9e-3, 1000), 1000),
    # Cosine alpha_bar(T) ~ 0 (singular lambda endpoint; x0 there is pure
    # cancellation noise in fp32) — start below it, as real ensemble/
    # max_actual_noise_step configs do.
    (CosineSchedule.create(1000), 900),
], ids=["linear", "cosine"])
def test_dpmpp_beats_ddim_and_is_second_order(schedule, t_max):
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

    # Coarse/fine = step sizes 50/12 (not 100/25: the cosine dpmpp error
    # changes sign near step 100, so that grid sits at a lucky cancellation
    # and breaks the order ratio).
    e_ddim_c, e_ddim_f = err(ddim_sample, 50), err(ddim_sample, 12)
    e_dpm_c, e_dpm_f = err(dpmpp_sample, 50), err(dpmpp_sample, 12)

    # At equal (coarse) step counts the 2nd-order solver is far closer.
    assert e_dpm_c < 0.35 * e_ddim_c, (e_dpm_c, e_ddim_c)
    # ~4x more steps: ~16x decay for a 2nd-order method, ~4x for 1st-order.
    assert e_dpm_c / e_dpm_f > 8.0, (e_dpm_c, e_dpm_f)
    assert e_ddim_c / e_ddim_f < 8.0, (e_ddim_c, e_ddim_f)


def test_dpmpp_single_transition_equals_ddim():
    # One transition => no history => c_0 = 0, and the first-order
    # DPM-Solver++ update is algebraically the DDIM eta=0 update.
    schedule = LinearSchedule.create(5e-3, 9e-3, 1000)
    model_fn = _exact_model(schedule)
    x_T = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 3), jnp.float32)
    assert ddim_step_list(500, 1000, 500) == [1000, 500]
    a = dpmpp_sample(model_fn, schedule, x_T, min_noise=500, max_noise=1000,
                     step_size=500)
    b = ddim_sample(model_fn, schedule, x_T, min_noise=500, max_noise=1000,
                    ddim_step_size=500)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-5)

    # Same reduction through the x0-at-step-1 return rule ([10, 1] list).
    a = dpmpp_sample(model_fn, schedule, x_T, min_noise=1, max_noise=10,
                     step_size=9)
    b = ddim_sample(model_fn, schedule, x_T, min_noise=1, max_noise=10,
                    ddim_step_size=9)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-5)


def test_dpmpp_return_rule_is_x0_at_step_1():
    # Narrow data (s^2 = 0.01) so the x0 estimate at step 1 shrinks x_1 by
    # a visible ~33% — the uniform-t step list's final lambda jump keeps the
    # trajectory error ~5e-3, 40x smaller than the x0-vs-x_1 gap (~0.23).
    s2 = 0.01
    schedule = LinearSchedule.create(5e-3, 9e-3, 1000)
    model_fn = _exact_model(schedule, s2)
    x_T = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 8, 3), jnp.float32)
    out = dpmpp_sample(model_fn, schedule, x_T, min_noise=1, max_noise=1000,
                       step_size=10)
    # The exact model's x0 estimate at step 1 from the (nearly exact)
    # trajectory: x0 = sqrt(abar_1) s^2 x_1 / v_1; with the analytic x_1 this
    # is sqrt(abar_1) s^2 / v_1 * sqrt(v_1/v_1000) * x_T — check against it.
    x_1 = _analytic_endpoint(schedule, x_T, 1000, 1, s2)
    abar1 = float(schedule.alpha_bar_at(jnp.array([1]))[0])
    v1 = abar1 * s2 + (1.0 - abar1)
    want_x0 = np.sqrt(abar1) * s2 / v1 * x_1
    got = np.asarray(out, np.float64)
    assert np.abs(got - want_x0).max() < 2e-2
    # And it is NOT x_1 itself (the rule really converted to x0).
    assert np.abs(got - x_1).max() > 0.1


def test_dpmpp_chaining_returns_x_t_and_composes():
    # min_noise > 1 => returns x_t at that level, so an ensemble chain
    # (stage 1: 1000->501, stage 2: 500->100) stays on the analytic
    # trajectory within discretization error.
    schedule = LinearSchedule.create(5e-3, 9e-3, 1000)
    model_fn = _exact_model(schedule)
    x_T = jax.random.normal(jax.random.PRNGKey(3), (1, 8, 8, 3), jnp.float32)
    x_mid = dpmpp_sample(model_fn, schedule, x_T, min_noise=501,
                         max_noise=1000, step_size=25)
    x_end = dpmpp_sample(model_fn, schedule, x_mid, min_noise=100,
                         max_noise=500, step_size=25)
    want = _analytic_endpoint(schedule, x_T, 1000, 100)
    assert np.abs(np.asarray(x_end, np.float64) - want).max() < 2e-2


def test_dpmpp_cond_img_and_labels_passthrough():
    schedule = LinearSchedule.create(5e-3, 9e-3, 100)
    seen = {}

    def model_fn(x, t, labels):
        seen["channels"] = x.shape[-1]
        seen["labels"] = labels is not None
        # Use the cond half so its value provably reaches the output.
        return 0.1 * x[..., :3] + x[..., 3:]

    x_T = jax.random.normal(jax.random.PRNGKey(4), (2, 8, 8, 3), jnp.float32)
    cond = jnp.ones_like(x_T)
    lab = jnp.ones((2, 4), jnp.float32)
    a = dpmpp_sample(model_fn, schedule, x_T, min_noise=10, max_noise=100,
                     step_size=30, cond_img=cond, labels=lab)
    assert seen == {"channels": 6, "labels": True}
    b = dpmpp_sample(model_fn, schedule, x_T, min_noise=10, max_noise=100,
                     step_size=30, cond_img=2.0 * cond, labels=lab)
    assert np.abs(np.asarray(a) - np.asarray(b)).max() > 1e-3


# ----------------------------------------------------------- wiring pins

def test_generator_cli_dpmpp(tmp_path):
    from sdm_tpu.cli.generate_images_diffusion import generate_images_diffusion
    from tests.test_extensions import _export_bundle_with_ema
    cfg, _ = _export_bundle_with_ema(tmp_path)
    base = ["-c", cfg, "-n", "2", "--ddim_step_size", "4", "-T", "10",
            "-s", "7"]
    quiet = dict(save_locally=False, log=lambda *a, **k: None)
    dpm = generate_images_diffusion(base + ["--diff_alg", "dpmpp"], **quiet)
    ddim = generate_images_diffusion(base + ["--diff_alg", "ddim"], **quiet)
    assert dpm.shape == ddim.shape == (2, 16, 16, 3)
    assert np.isfinite(dpm).all()
    # Same seed/noise, different solver: outputs must differ (3+ transitions
    # engage the 2nd-order correction — with a random-init net the x0
    # estimates move little across t, so the correction is small but real)
    # while staying in the same ballpark (both integrate the same ODE).
    assert 2e-5 < np.abs(dpm - ddim).max() < 1.0


def test_generator_pipeline_dpmpp_matches_sequential(tmp_path):
    from sdm_tpu.cli.generate_images_diffusion import generate_images_diffusion
    from sdm_tpu.cli.export_models import export_bundle
    from tests.test_generation import _save_ref_ckpt, _train_cfg
    _, p1 = _save_ref_ckpt(tmp_path, "pp1.pt", seed=10)
    _, p2 = _save_ref_ckpt(tmp_path, "pp2.pt", seed=11)
    bundle = export_bundle(
        "pipemodel", str(tmp_path), img_c=3, img_h=16, img_w=16,
        model_type="BASE",
        entries=[(_train_cfg(11, 20), p1), (_train_cfg(1, 10), p2)])
    config = os.path.join(bundle, "config.json")
    common = ["-c", config, "-n", "4", "--diff_alg", "dpmpp",
              "--ddim_step_size", "4", "-s", "77"]
    quiet = dict(save_locally=False, log=lambda *a, **k: None)
    seq = generate_images_diffusion(common, **quiet)
    pipe = generate_images_diffusion(common + ["--pipeline", "2"], **quiet)
    np.testing.assert_allclose(pipe, seq, rtol=1e-5, atol=1e-6)


def test_engine_dpmpp_matches_generator_cli(tmp_path):
    from sdm_tpu.serving import SamplerEngine
    from sdm_tpu.cli.generate_images_diffusion import generate_images_diffusion
    from tests.test_extensions import _export_bundle_with_ema
    cfg, _ = _export_bundle_with_ema(tmp_path)
    eng = SamplerEngine(cfg, diff_alg="dpmpp", step_size=4, max_T=10,
                        max_batch=4, log=lambda *a, **k: None)
    got = eng.generate(4, seed=7)
    want = generate_images_diffusion(
        ["-c", cfg, "-n", "4", "-s", "7", "--diff_alg", "dpmpp",
         "--ddim_step_size", "4", "-T", "10"],
        save_locally=False, log=lambda *a, **k: None)
    assert got.shape == want.shape == (4, 16, 16, 3)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
