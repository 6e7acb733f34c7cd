"""v-parameterization (diffusion/vpred.py, config "objective": "V" —
TPU-build extension): conversion identities, the train-step target, exact
sampler equivalence of a v-model vs its eps counterpart (through both the
eps adapter and the samplers' NATIVE tag_v path), conditioning of the
native path at t=T, and the full train -> export -> generate pipeline with
a tagged bundle."""

import glob
import json

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sdm_tpu.enums import Objective
from sdm_tpu.diffusion.samplers import (
    cold_sample, ddim_sample, ddpm_sample, dpmpp_sample)
from sdm_tpu.diffusion.vpred import (
    as_eps_model, eps_from_v, tag_v, v_target, x0_from_v)
from sdm_tpu.models import UNet
from sdm_tpu.ops.schedules import CosineSchedule, LinearSchedule
from sdm_tpu.train import make_optimizer, make_train_step, create_train_state

SCHEDULE = LinearSchedule.create(5e-3, 9e-3, 1000)


def test_vpred_conversion_identities():
    """eps_from_v/x0_from_v invert v_target exactly on q_sampled points."""
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((4, 8, 8, 3)).astype(np.float32))
    eps = jnp.asarray(rng.standard_normal((4, 8, 8, 3)).astype(np.float32))
    t = jnp.asarray([1, 250, 600, 1000], dtype=jnp.int32)
    x_t = SCHEDULE.q_sample(x0, t, eps)
    v = v_target(SCHEDULE, t, x0, eps)
    np.testing.assert_allclose(np.asarray(eps_from_v(SCHEDULE, t, x_t, v)),
                               np.asarray(eps), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(x0_from_v(SCHEDULE, t, x_t, v)),
                               np.asarray(x0), rtol=1e-5, atol=1e-5)


def test_v_objective_train_step_loss():
    """Objective.V regresses onto a·eps − s·x0 (hand-computed) and only the
    target changes vs EPS (same model input x_t)."""
    net = UNet(num_resnet_blocks=1, in_channel=3, out_channel=3, time_dim=8,
               cond_dim=None, num_layers=1, attn_layers=(0,), num_heads=1,
               dim_per_head=None, groups=8, min_channel=16, max_channel=16,
               image_recon=False)
    rng = np.random.default_rng(1)
    imgs = jnp.asarray(rng.standard_normal((4, 8, 8, 3)).astype(np.float32))
    eps = jnp.asarray(rng.standard_normal((4, 8, 8, 3)).astype(np.float32))
    t = jnp.asarray([10, 400, 700, 990], dtype=jnp.int32)
    params = net.init(jax.random.PRNGKey(0), imgs[:1], t[:1])["params"]
    tx = make_optimizer(1e-3, 100_000)
    apply_fn = lambda p, x, tt, l: net.apply({"params": p}, x, tt, l)
    batch = {"image": imgs, "eps": eps, "t": t}

    step_v = make_train_step(apply_fn, SCHEDULE, tx, objective=Objective.V,
                             flip_imgs=False)
    _, m = jax.jit(step_v)(create_train_state(params, tx), batch,
                           jax.random.PRNGKey(0))

    x_t = SCHEDULE.q_sample(imgs, t, eps)
    pred = apply_fn(params, x_t, t, None)
    expected = float(jnp.mean(jnp.square(
        pred - v_target(SCHEDULE, t, imgs, eps))))
    np.testing.assert_allclose(float(m["loss"]), expected, rtol=1e-5)


@pytest.mark.parametrize("route", ["adapter", "native"])
@pytest.mark.parametrize("alg", ["ddim", "ddpm", "dpmpp"])
def test_v_model_samples_identically_to_eps_model(alg, route):
    """A v-model consistent with a given eps-model (v = (eps − s·x)/a) must
    sample to the SAME images through every sampler, both via the eps
    adapter (as_eps_model) and via the samplers' native tag_v path."""
    net = UNet(num_resnet_blocks=1, in_channel=3, out_channel=3, time_dim=8,
               cond_dim=None, num_layers=1, attn_layers=(0,), num_heads=1,
               dim_per_head=None, groups=8, min_channel=16, max_channel=16,
               image_recon=False)
    x = jnp.zeros((2, 8, 8, 3), jnp.float32)
    params = net.init(jax.random.PRNGKey(1), x, jnp.array([1]))["params"]

    def eps_model(xx, tt, ll):
        return net.apply({"params": params}, xx, tt, ll)

    def v_model(xx, tt, ll):
        # v = (eps − s·x_t)/a — exact algebraic counterpart of eps_model.
        abar = SCHEDULE.alpha_bar_at(tt).astype(jnp.float32)
        abar = abar.reshape(abar.shape + (1,) * (xx.ndim - abar.ndim))
        a, s = abar ** 0.5, (1.0 - abar) ** 0.5
        return (eps_model(xx, tt, ll).astype(jnp.float32) - s * xx) / a

    x_T = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 8, 3), jnp.float32)
    adapted = (as_eps_model(v_model, SCHEDULE) if route == "adapter"
               else tag_v(v_model))
    if alg == "ddim":
        run = lambda f: ddim_sample(f, SCHEDULE, x_T, max_noise=20,
                                    ddim_step_size=5)
    elif alg == "dpmpp":
        run = lambda f: dpmpp_sample(f, SCHEDULE, x_T, max_noise=20,
                                     step_size=5)
    else:
        zs = jax.random.normal(jax.random.PRNGKey(3), (20, 2, 8, 8, 3))
        run = lambda f: ddpm_sample(f, SCHEDULE, x_T, max_noise=20, zs=zs)
    a = np.asarray(jax.jit(lambda: run(eps_model))())
    b = np.asarray(jax.jit(lambda: run(adapted))())
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_native_v_is_well_conditioned_at_t_max():
    """COSINE at t=T has abar ~ 2e-15 (a ~ 4e-8): the native conversion
    x0 = a·x − s·v keeps full fp32 precision, while routing v through the
    eps adapter and the reference's x0 = (x − s·eps)/a form cancels
    catastrophically (s rounds to exactly 1.0, so x − s·eps loses a·v to
    the ulp of x). This pins the reason bundles use tag_v, not the adapter.

    Ground truth: the same two-visit DDIM trajectory (steps [1000, 1])
    evaluated in float64 from the schedule's own fp32 abar values, with a
    constant-v model so nothing self-corrects downstream."""
    sched = CosineSchedule.create(1000)
    rng = np.random.default_rng(7)
    v_const = jnp.asarray(rng.standard_normal((2, 8, 8, 3)).astype(np.float32))
    x_T = jnp.asarray(rng.standard_normal((2, 8, 8, 3)).astype(np.float32))

    def v_model(x, t, l):
        return jnp.broadcast_to(v_const, x.shape)

    run = lambda f: ddim_sample(f, sched, x_T, min_noise=1, max_noise=1000,
                                ddim_step_size=999)
    native = np.asarray(jax.jit(lambda: run(tag_v(v_model)))())
    adapter = np.asarray(jax.jit(
        lambda: run(as_eps_model(v_model, sched)))())

    # float64 reference of the exact same trajectory.
    abar_T = float(sched.alpha_bar_at(jnp.array([1000]))[0])
    abar_1 = float(sched.alpha_bar_at(jnp.array([1]))[0])
    x = np.asarray(x_T, np.float64)
    v = np.asarray(v_const, np.float64)
    a_T, s_T = np.sqrt(abar_T), np.sqrt(1.0 - abar_T)
    a_1, s_1 = np.sqrt(abar_1), np.sqrt(1.0 - abar_1)
    x0 = a_T * x - s_T * v
    eps = a_T * v + s_T * x
    x1 = a_1 * x0 + s_1 * eps
    truth = a_1 * x1 - s_1 * v          # final visit at step 1 returns x0

    native_err = float(np.max(np.abs(native - truth)))
    adapter_err = float(np.max(np.abs(adapter - truth)))
    assert native_err < 1e-4, native_err
    assert adapter_err > 100 * max(native_err, 1e-6), (adapter_err,
                                                       native_err)


def test_cold_sampler_rejects_v_tag():
    """cold_sample consumes x0 predictors; a tag_v model must be refused
    loudly instead of silently mis-sampled."""
    sched = LinearSchedule.create(5e-3, 9e-3, 1000)
    model = tag_v(lambda x, t, l: x)
    x = jnp.zeros((1, 8, 8, 3), jnp.float32)
    with pytest.raises(ValueError, match="x0-predicting"):
        cold_sample(model, sched, x, x, max_noise=10, skip_step_size=5)


def test_cfg_wrapper_preserves_v_tag():
    """Classifier-free guidance is an affine combine (weights sum to 1), so
    it is identical in v space — the cfg wrapper must carry the tag through
    so samplers keep converting natively."""
    from sdm_tpu.diffusion.guidance import cfg_model_fn
    v_fn = tag_v(lambda x, t, l: x)
    assert getattr(cfg_model_fn(v_fn, 3.0), "model_output", "eps") == "v"
    eps_fn = lambda x, t, l: x
    assert getattr(cfg_model_fn(eps_fn, 3.0), "model_output", "eps") == "eps"


@pytest.mark.parametrize("objective", [Objective.EPS, Objective.V])
def test_min_snr_gamma_weighting(objective):
    """min_snr_gamma (Hang et al. 2023, TPU-build extension) reweights the
    per-sample MSE by the published per-objective formula; None keeps the
    reference's uniform mean (parity default)."""
    net = UNet(num_resnet_blocks=1, in_channel=3, out_channel=3, time_dim=8,
               cond_dim=None, num_layers=1, attn_layers=(0,), num_heads=1,
               dim_per_head=None, groups=8, min_channel=16, max_channel=16,
               image_recon=False)
    rng = np.random.default_rng(4)
    imgs = jnp.asarray(rng.standard_normal((4, 8, 8, 3)).astype(np.float32))
    eps = jnp.asarray(rng.standard_normal((4, 8, 8, 3)).astype(np.float32))
    t = jnp.asarray([5, 300, 650, 995], dtype=jnp.int32)
    params = net.init(jax.random.PRNGKey(0), imgs[:1], t[:1])["params"]
    tx = make_optimizer(1e-3, 100_000)
    apply_fn = lambda p, x, tt, l: net.apply({"params": p}, x, tt, l)
    batch = {"image": imgs, "eps": eps, "t": t}
    gamma = 5.0

    losses = {}
    for g in (None, gamma):
        step = make_train_step(apply_fn, SCHEDULE, tx, objective=objective,
                               flip_imgs=False, min_snr_gamma=g)
        _, m = jax.jit(step)(create_train_state(params, tx), batch,
                             jax.random.PRNGKey(0))
        losses[g] = float(m["loss"])

    # Hand-computed expectation.
    x_t = SCHEDULE.q_sample(imgs, t, eps)
    pred = apply_fn(params, x_t, t, None).astype(jnp.float32)
    target = (eps if objective == Objective.EPS
              else v_target(SCHEDULE, t, imgs, eps))
    sq = jnp.square(pred - target)
    np.testing.assert_allclose(losses[None], float(jnp.mean(sq)), rtol=1e-5)

    abar = SCHEDULE.alpha_bar_at(t).astype(jnp.float32)
    snr = abar / (1.0 - abar)
    w = (jnp.minimum(snr, gamma) / snr if objective == Objective.EPS
         else jnp.minimum(snr, gamma) / (snr + 1.0))
    expected = float(jnp.mean(w * jnp.mean(sq, axis=(1, 2, 3))))
    np.testing.assert_allclose(losses[gamma], expected, rtol=1e-5)
    assert losses[gamma] != losses[None]


def test_v_objective_pipeline_train_export_generate(tmp_path):
    """Config "objective": "V" end-to-end: the loop trains (finite loss,
    previews sample through the native tag_v path), export tags the bundle
    entry, and the generator consumes the tagged bundle."""
    from sdm_tpu.train.loop import run_training, BASE_SPEC
    from sdm_tpu.cli.export_models import export_bundle
    from sdm_tpu.cli.generate_images_diffusion import (
        generate_images_diffusion)
    from tests.test_train_loop import _mk_images, _base_config

    _mk_images(tmp_path)
    cfg = _base_config(tmp_path, objective="V")
    result = run_training(BASE_SPEC, cfg, max_steps=3)
    assert np.isfinite(result["last_loss"])

    ckpt = sorted(glob.glob(
        str(tmp_path / "out" / "checkpoint" / "diffusion_*.pt")))[-1]
    bundle_dir = export_bundle(
        "vtest", str(tmp_path), img_c=3, img_h=8, img_w=8,
        model_type="BASE", entries=[(cfg, ckpt)])
    entry = json.load(open(f"{bundle_dir}/config.json"))["models"][0]
    assert entry["objective"] == "V"

    out = generate_images_diffusion(
        ["-c", f"{bundle_dir}/config.json", "-n", "2", "--diff_alg", "ddim",
         "--ddim_step_size", "4", "-s", "3"],
        log=lambda *a, **k: None, save_locally=False)
    assert out.shape == (2, 8, 8, 3) and np.isfinite(out).all()


def test_v_bundle_through_serving_engine(tmp_path):
    """The serving engine must consume V bundles natively (io/bundles.py,
    the shared loader, applies tag_v): engine output == generator CLI
    output on the same V bundle, and != the raw-eps interpretation."""
    from sdm_tpu.train.loop import run_training, BASE_SPEC
    from sdm_tpu.cli.export_models import export_bundle
    from sdm_tpu.cli.generate_images_diffusion import (
        generate_images_diffusion)
    from sdm_tpu.serving.engine import SamplerEngine
    from tests.test_train_loop import _mk_images, _base_config

    _mk_images(tmp_path)
    cfg = _base_config(tmp_path, objective="V")
    run_training(BASE_SPEC, cfg, max_steps=2)
    ckpt = sorted(glob.glob(
        str(tmp_path / "out" / "checkpoint" / "diffusion_*.pt")))[-1]
    bundle_dir = export_bundle(
        "vserve", str(tmp_path), img_c=3, img_h=8, img_w=8,
        model_type="BASE", entries=[(cfg, ckpt)])
    cfg_path = f"{bundle_dir}/config.json"

    eng = SamplerEngine(cfg_path, diff_alg="ddim", step_size=4,
                        max_batch=2, log=lambda *a, **k: None)
    served = eng.generate(2, seed=11)
    cli = generate_images_diffusion(
        ["-c", cfg_path, "-n", "2", "--diff_alg", "ddim",
         "--ddim_step_size", "4", "-s", "11"],
        log=lambda *a, **k: None, save_locally=False)
    np.testing.assert_allclose(served, np.asarray(cli), rtol=1e-5, atol=1e-5)

    # Strip the tag -> raw-eps interpretation must change the samples.
    bundle = json.load(open(cfg_path))
    del bundle["models"][0]["objective"]
    json.dump(bundle, open(cfg_path, "w"))
    eng2 = SamplerEngine(cfg_path, diff_alg="ddim", step_size=4,
                         max_batch=2, log=lambda *a, **k: None)
    raw = eng2.generate(2, seed=11)
    assert float(np.max(np.abs(raw - served))) > 1e-3


def test_v_objective_rejected_outside_eps_family(tmp_path):
    from sdm_tpu.train.loop import run_training, COLD_SPEC
    from tests.test_train_loop import _mk_images, _base_config

    _mk_images(tmp_path)
    cfg = _base_config(tmp_path, objective="V", img_recon=True)
    with pytest.raises(ValueError, match="objective"):
        run_training(COLD_SPEC, cfg, max_steps=1)
