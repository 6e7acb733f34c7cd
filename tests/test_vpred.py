"""v-parameterization (diffusion/vpred.py, config "objective": "V" —
TPU-build extension): conversion identities, the train-step target, exact
sampler equivalence of a v-model vs its eps counterpart, and the full
train -> export -> generate pipeline with a tagged bundle."""

import glob
import json

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sdm_tpu.enums import Objective
from sdm_tpu.diffusion.samplers import ddim_sample, ddpm_sample, dpmpp_sample
from sdm_tpu.diffusion.vpred import (
    as_eps_model, eps_from_v, v_target, x0_from_v)
from sdm_tpu.models import UNet
from sdm_tpu.ops.schedules import LinearSchedule
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


@pytest.mark.parametrize("alg", ["ddim", "ddpm", "dpmpp"])
def test_v_model_samples_identically_to_eps_model(alg):
    """A v-model consistent with a given eps-model (v = (eps − s·x)/a) must
    sample to the SAME images through every sampler once adapted."""
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
    adapted = as_eps_model(v_model, SCHEDULE)
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
    previews sample through the adapter), export tags the bundle entry, and
    the generator consumes the tagged bundle."""
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
    """The serving engine must route V bundles through the eps adapter
    (io/bundles.py is the shared loader): engine output == generator CLI
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
