"""Progressive distillation (sdm_tpu/train/distill.py — TPU-build extension,
no reference counterpart; the reference's fastest sampler is DDIM
skip-stepping, diffusion_sampling_algorithms.py:66-148).

Pins: (1) the closed-form x0-space target — one student DDIM step from the
target lands EXACTLY on the teacher's two-step result; (2) the endpoint rule
(t == u rows train against the teacher's own x0, matching ddim_sample's final
x0-extraction call); (3) the distill step optimizes (loss decreases toward
teacher self-consistency); (4) slow: a full halving run on the convergence-toy
teacher produces a coarse-grid student that clearly beats the undistilled
teacher at the same step count and reproduces the data structure."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sdm_tpu.diffusion.samplers import ddim_sample, ddim_step_list
from sdm_tpu.ops.schedules import make_schedule
from sdm_tpu.train.distill import (distill_pairs, distill_target,
                                   make_distill_step)
from sdm_tpu.train.step import create_train_state, make_optimizer


def _ab(schedule, t, ndim=4):
    abar = schedule.alpha_bar_at(jnp.asarray(t)).astype(jnp.float32)
    while abar.ndim < ndim:
        abar = abar[..., None]
    return abar ** 0.5, (1.0 - abar) ** 0.5


def _ddim_update(schedule, teacher, x, t, u):
    """One explicit eta=0 DDIM step t -> u (per-sample vectors)."""
    a_t, s_t = _ab(schedule, t)
    eps = teacher(x, jnp.asarray(t)).astype(jnp.float32)
    x0 = (x - s_t * eps) / a_t
    a_u, s_u = _ab(schedule, u)
    return a_u * x0 + s_u * eps


def test_distill_pairs_grid():
    rows = distill_pairs(ddim_step_list(1, 50, 20))  # [50, 30, 10, 1]
    assert rows.tolist() == [[50, 40, 30], [30, 20, 10], [10, 5, 1],
                             [1, 1, 1]]


def test_target_reproduces_two_teacher_steps_exactly():
    schedule = make_schedule("LINEAR", beta_1=0.02, beta_T=0.2,
                             max_noise_step=50)
    key = jax.random.PRNGKey(0)
    x_t = jax.random.normal(key, (4, 8, 8, 3), jnp.float32)

    def teacher(x, t):  # any smooth deterministic eps function works
        return 0.3 * x + 0.1 * jnp.tanh(x)

    t = jnp.array([50, 30, 27, 10], jnp.int32)
    u = jnp.array([30, 10, 13, 1], jnp.int32)
    m = (t + u) // 2

    x_tilde = distill_target(teacher, schedule, x_t, t, m, u)

    # Teacher's actual two-step trajectory t -> m -> u.
    x_m = _ddim_update(schedule, teacher, x_t, t, m)
    z = _ddim_update(schedule, teacher, x_m, m, u)

    # One student DDIM step whose x0 prediction is the target.
    a_t, s_t = _ab(schedule, t)
    eps_tilde = (x_t - a_t * x_tilde) / s_t
    a_u, s_u = _ab(schedule, u)
    x_u_student = a_u * x_tilde + s_u * eps_tilde

    np.testing.assert_allclose(np.asarray(x_u_student), np.asarray(z),
                               rtol=2e-5, atol=2e-5)


def test_endpoint_rows_target_teacher_x0():
    schedule = make_schedule("LINEAR", beta_1=0.02, beta_T=0.2,
                             max_noise_step=50)
    x_t = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 4, 3), jnp.float32)

    def teacher(x, t):
        return 0.5 * x

    t = jnp.array([1, 1], jnp.int32)
    x_tilde = distill_target(teacher, schedule, x_t, t, t, t)
    a, s = _ab(schedule, t)
    x0 = (x_t - s * teacher(x_t, t)) / a
    np.testing.assert_allclose(np.asarray(x_tilde), np.asarray(x0),
                               rtol=1e-6, atol=1e-6)
    assert np.all(np.isfinite(np.asarray(x_tilde)))


def _tiny_net():
    from sdm_tpu.models import UNet
    cfg = dict(in_channel=3, out_channel=3, num_layers=2, num_resnet_block=1,
               attn_layers=[], attn_heads=1, attn_dim_per_head=None,
               time_dim=16, min_channel=32, max_channel=32, img_recon=False,
               cond_dim=None)
    return UNet.from_config(cfg, dtype=None)


def test_distill_step_decreases_loss():
    net = _tiny_net()
    schedule = make_schedule("LINEAR", beta_1=0.02, beta_T=0.2,
                             max_noise_step=50)
    x0 = jnp.zeros((1, 8, 8, 3), jnp.float32)
    t0 = jnp.array([1], jnp.int32)
    teacher_params = net.init(jax.random.PRNGKey(2), x0, t0, None)["params"]
    apply_fn = lambda p, x, t, l: net.apply({"params": p}, x, t, l)

    tx = make_optimizer(1e-3, 10 ** 9)
    state = create_train_state(jax.tree.map(jnp.array, teacher_params), tx)
    step_fn = jax.jit(make_distill_step(
        apply_fn, schedule, tx, step_list=ddim_step_list(1, 50, 10)))

    images = jax.random.uniform(jax.random.PRNGKey(3), (8, 8, 8, 3),
                                jnp.float32, -1.0, 1.0)
    losses = []
    rng = jax.random.PRNGKey(4)
    for _ in range(40):
        rng, k = jax.random.split(rng)
        state, metrics = step_fn(state, teacher_params, {"image": images}, k)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-8:]) < 0.5 * np.mean(losses[:8]), losses


def test_distill_grad_clip_matches_scaled_gradient():
    """grad_clip_norm on the distill step (same direct pre-optimizer clip as
    make_train_step): with SGD(1.0) the parameter delta IS the gradient, so
    a tight clip must rescale the delta to exactly clip/||g|| of the
    unclipped one, and a loose clip must be a bit-identical no-op. (The
    truncated-SNR weight makes distillation gradients heavy-tailed — the
    converged-flagship divergence this guards against, QUALITY.md.)"""
    import optax

    net = _tiny_net()
    schedule = make_schedule("LINEAR", beta_1=0.02, beta_T=0.2,
                             max_noise_step=50)
    x0 = jnp.zeros((1, 8, 8, 3), jnp.float32)
    t0 = jnp.array([1], jnp.int32)
    # Student != teacher so the distill gradient is far from the
    # self-consistency zero — the param-delta probe below would otherwise
    # drown in fp32 cancellation noise.
    params = net.init(jax.random.PRNGKey(3), x0, t0, None)["params"]
    apply_fn = lambda p, x, t, l: net.apply({"params": p}, x, t, l)
    teacher = jax.tree.map(
        jnp.asarray, net.init(jax.random.PRNGKey(2), x0, t0, None)["params"])
    tx = optax.sgd(1.0)
    step_list = ddim_step_list(1, 50, 10)
    rng = np.random.default_rng(7)
    batch = {"image": jnp.asarray(
        rng.uniform(-1.0, 1.0, (4, 8, 8, 3)).astype(np.float32))}
    key = jax.random.PRNGKey(5)

    def delta(clip):
        step = jax.jit(make_distill_step(apply_fn, schedule, tx,
                                         step_list=step_list,
                                         grad_clip_norm=clip))
        new_state, _ = step(create_train_state(
            jax.tree.map(jnp.array, params), tx), teacher, batch, key)
        return jax.tree.map(lambda a, b: np.asarray(a) - np.asarray(b),
                            params, new_state.params)

    grads = delta(None)  # -update == gradient under sgd(1.0)
    gnorm = float(optax.global_norm(grads))
    assert gnorm > 0

    loose = delta(gnorm * 10.0)
    for a, b in zip(jax.tree.leaves(grads), jax.tree.leaves(loose)):
        # Not assert_array_equal: the loose-clip program still multiplies by
        # g*1.0 — exact on CPU (where conftest pins the suite), but backends
        # that flush subnormals could flip subnormal gradient bits.
        np.testing.assert_allclose(a, b, rtol=0, atol=1e-12)

    clip = gnorm / 4.0
    tight = delta(clip)
    for a, b in zip(jax.tree.leaves(grads), jax.tree.leaves(tight)):
        # atol: the param-delta probe quantizes each delta to the fp32 ulp
        # of the ~0.5-magnitude params (~6e-8); a missing/wrong clip would
        # be a 4x (300%) relative error, far outside these tolerances.
        np.testing.assert_allclose(a * (clip / gnorm), b,
                                   rtol=1e-4, atol=2e-7)


def test_v_mode_distill_step_equals_eps_mode_on_same_function():
    """objective=V distillation must optimize the SAME loss as eps-mode when
    the v-model is the exact algebraic counterpart of the eps-model
    (v = (eps − s·x)/a): identical loss AND identical updated params, since
    the loss-as-a-function-of-params is the same composite."""
    from sdm_tpu.enums import Objective

    net = _tiny_net()
    schedule = make_schedule("LINEAR", beta_1=0.02, beta_T=0.2,
                             max_noise_step=50)
    x0 = jnp.zeros((1, 8, 8, 3), jnp.float32)
    t0 = jnp.array([1], jnp.int32)
    params = net.init(jax.random.PRNGKey(5), x0, t0, None)["params"]
    apply_eps = lambda p, x, t, l: net.apply({"params": p}, x, t, l)

    def apply_v(p, x, t, l):
        # v = (eps − s·x)/a — same function, velocity parameterization.
        abar = schedule.alpha_bar_at(t).astype(jnp.float32)
        abar = abar.reshape(abar.shape + (1,) * (x.ndim - abar.ndim))
        a, s = abar ** 0.5, (1.0 - abar) ** 0.5
        return (apply_eps(p, x, t, l).astype(jnp.float32) - s * x) / a

    # SGD, not Adam: Adam's m/(sqrt(v)+eps) normalizes fp32-rounding-level
    # differences of near-zero gradient entries up to full lr scale, which
    # would test optimizer noise amplification instead of the distill math.
    import optax
    tx = optax.sgd(1e-2)
    step_list = ddim_step_list(1, 50, 10)
    batch = {
        "image": jax.random.uniform(jax.random.PRNGKey(6), (4, 8, 8, 3),
                                    jnp.float32, -1.0, 1.0),
        "row": jnp.array([0, 1, 2, 4], jnp.int32),
        "eps": jax.random.normal(jax.random.PRNGKey(7), (4, 8, 8, 3)),
    }
    out = {}
    for name, fn, obj in (("eps", apply_eps, None),
                          ("v", apply_v, Objective.V)):
        state = create_train_state(jax.tree.map(jnp.array, params), tx)
        step = jax.jit(make_distill_step(fn, schedule, tx,
                                         step_list=step_list, objective=obj))
        new_state, metrics = step(state, params, batch, jax.random.PRNGKey(8))
        out[name] = (float(metrics["loss"]), new_state.params)

    # fp32 rounding through the extra v<->eps conversions: measured 3e-5
    # relative on a ~1e-5 loss.
    np.testing.assert_allclose(out["eps"][0], out["v"][0], rtol=5e-4)
    for a, b in zip(jax.tree.leaves(jax.tree.map(np.asarray, out["eps"][1])),
                    jax.tree.leaves(jax.tree.map(np.asarray, out["v"][1]))):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-7)


def test_v_mode_distill_is_well_conditioned_at_t_max():
    """v-mode distillation at COSINE t=T (abar ~ 2e-15): the native (eps, x0)
    derivation must reproduce a float64 reference of the whole target/loss
    math. The old route (v -> eps adapter, then x0 = (x − s·eps)/a) lost all
    x0 precision here — this pins the fix, using a constant-v model so
    nothing self-corrects."""
    from sdm_tpu.enums import Objective
    from sdm_tpu.train.distill import distill_pairs

    schedule = make_schedule("COSINE", max_noise_step=1000)
    rng = np.random.default_rng(9)
    v_const = jnp.asarray(rng.standard_normal((2, 8, 8, 3)).astype(np.float32))
    images = jnp.asarray(rng.uniform(-1, 1, (2, 8, 8, 3)).astype(np.float32))
    eps_in = jnp.asarray(rng.standard_normal((2, 8, 8, 3)).astype(np.float32))

    apply_v = lambda p, x, t, l: jnp.broadcast_to(v_const, x.shape)
    import optax
    tx = optax.sgd(1e-2)
    step_list = ddim_step_list(1, 1000, 999)          # [1000, 1]
    params = {"w": jnp.zeros((1,), jnp.float32)}
    state = create_train_state(params, tx)
    step = jax.jit(make_distill_step(apply_v, schedule, tx,
                                     step_list=step_list,
                                     objective=Objective.V))
    batch = {"image": images, "row": jnp.array([0, 0], jnp.int32),
             "eps": eps_in}
    _, metrics = step(state, params, batch, jax.random.PRNGKey(0))
    loss = float(metrics["loss"])

    # float64 reference of the same row (t, m, u) = (1000, 500, 1), from the
    # schedule's own fp32 abar values.
    t_, m_, u_ = distill_pairs(step_list)[0]
    ab = {s: float(schedule.alpha_bar_at(jnp.array([int(s)]))[0])
          for s in (t_, m_, u_)}
    a = {s: np.sqrt(v) for s, v in ab.items()}
    s_ = {s: np.sqrt(1.0 - v) for s, v in ab.items()}
    x0_np = np.asarray(images, np.float64)
    v_np = np.asarray(v_const, np.float64)
    x_t = a[t_] * x0_np + s_[t_] * np.asarray(eps_in, np.float64)
    eps1 = a[t_] * v_np + s_[t_] * x_t
    x0_1 = a[t_] * x_t - s_[t_] * v_np
    x_m = a[m_] * x0_1 + s_[m_] * eps1
    eps2 = a[m_] * v_np + s_[m_] * x_m
    x0_2 = a[m_] * x_m - s_[m_] * v_np
    z = a[u_] * x0_2 + s_[u_] * eps2
    ratio = s_[u_] / s_[t_]
    x_tilde = (z - ratio * x_t) / (a[u_] - ratio * a[t_])
    x0_hat = a[t_] * x_t - s_[t_] * v_np
    w = max(ab[t_] / (1.0 - ab[t_]), 1.0)
    expected = float(np.mean(
        w * np.mean((x0_hat - x_tilde) ** 2, axis=(1, 2, 3))))
    np.testing.assert_allclose(loss, expected, rtol=1e-4)


def test_v_teacher_distillation_runs(tmp_path):
    """run_distillation on a v-trained checkpoint (config objective V): one
    phase runs with finite losses and writes a student checkpoint that
    exports with the V tag."""
    import glob
    import json
    import os

    from sdm_tpu.train.loop import run_training, BASE_SPEC
    from sdm_tpu.train.distill import run_distillation
    from sdm_tpu.cli.export_models import export_bundle
    from tests.test_train_loop import _mk_images, _base_config

    _mk_images(tmp_path)
    cfg = _base_config(tmp_path, objective="V", skip_step=4,
                       checkpoint_steps=2)
    run_training(BASE_SPEC, cfg, max_steps=2)
    teacher = sorted(glob.glob(
        str(tmp_path / "out" / "checkpoint" / "diffusion_*.pt")))[-1]

    res = run_distillation(cfg, teacher_checkpoint=teacher, phases=1,
                           steps_per_phase=2, log=lambda *a, **k: None)
    assert res["phase_step_sizes"] == [8]
    assert np.isfinite(res["phase_losses"][0]).all()
    student = sorted(glob.glob(
        str(tmp_path / "out" / "checkpoint" / "distilled_ss8_*.pt")))[-1]
    bundle_dir = export_bundle("vdist", str(tmp_path), img_c=3, img_h=8,
                               img_w=8, model_type="BASE",
                               entries=[(cfg, student)])
    entry = json.load(open(os.path.join(bundle_dir,
                                        "config.json")))["models"][0]
    assert entry["objective"] == "V"


@pytest.mark.slow
def test_distilled_student_beats_teacher_at_coarse_grid(tmp_path):
    """Train the convergence-toy teacher (T=50, good at DDIM step 5), distill
    5 -> 10 -> 20 -> 40, then sample both at step size 40 (two intervals +
    final call = 3 model calls): the student must reproduce the gradient
    structure where the raw teacher at the same 3 calls visibly cannot."""
    import cv2

    from sdm_tpu.io.checkpoint import (load_checkpoint,
                                       load_params_from_checkpoint)
    from sdm_tpu.models import UNet
    from sdm_tpu.train.distill import run_distillation
    from sdm_tpu.train.loop import BASE_SPEC, run_training

    hw = 8
    ramp = np.linspace(-0.9, 0.9, hw, dtype=np.float32)
    target = np.broadcast_to(ramp[None, :, None], (hw, hw, 3)).copy()
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    u8 = np.clip((target + 1.0) * 127.5, 0, 255).astype(np.uint8)
    for i in range(32):
        cv2.imwrite(str(img_dir / f"im_{i}.png"), u8)
    target_decoded = (u8.astype(np.float32) - 127.5) / 127.5

    cfg = dict(
        dataset_path=str(tmp_path / "imgs" / "*.png"),
        use_conditional=False, cond_dim=None,
        out_dir=str(tmp_path / "out"),
        checkpoint_steps=10_000, lr_steps=600, max_epoch=5000,
        plot_img_count=4, flip_imgs=False, model_checkpoint=None,
        load_diffusion_optim=False, config_checkpoint=None,
        diffusion_lr=2e-3, batch_size=16,
        noise_scheduler="LINEAR", beta1=0.02, betaT=0.2,
        diffusion_alg="DDIM", skip_step=5, min_noise_step=1,
        max_noise_step=50, max_actual_noise_step=50,
        in_channel=3, out_channel=3, num_layers=2, num_resnet_block=1,
        attn_layers=[], attn_heads=1, attn_dim_per_head=None,
        time_dim=32, min_channel=32, max_channel=64, img_recon=False,
        compute_dtype="float32", seed=7, epoch_checkpoint_every=1000,
    )
    summary = run_training(BASE_SPEC, cfg, max_steps=800)
    assert np.isfinite(summary["last_loss"])
    teacher_params = summary["state"].params

    import glob as _glob
    import os
    ckpts = sorted(
        _glob.glob(os.path.join(cfg["out_dir"], "checkpoint",
                                "diffusion_*.pt")),
        key=lambda p: int(p.rsplit("_", 1)[1].split(".")[0]))
    result = run_distillation(cfg, teacher_checkpoint=ckpts[-1],
                              start_step_size=5, phases=3,
                              steps_per_phase=400, distill_lr=5e-4)
    assert result["phase_step_sizes"] == [10, 20, 40]

    # Reload the distilled checkpoint through the reference-format path to
    # prove it round-trips, then sample both models at step size 40.
    distilled = _glob.glob(os.path.join(cfg["out_dir"], "checkpoint",
                                        "distilled_ss40_*.pt"))
    assert len(distilled) == 1
    net = UNet.from_config(cfg, dtype=None)
    ok, ckpt = load_checkpoint(distilled[0], log=lambda *a, **k: None)
    assert ok
    student_params = jax.tree.map(jnp.asarray, load_params_from_checkpoint(
        ckpt, summary["state"].params, log=lambda *a, **k: None))

    schedule = make_schedule("LINEAR", beta_1=0.02, beta_T=0.2,
                             max_noise_step=50)
    noise = jax.random.normal(jax.random.PRNGKey(11), (4, hw, hw, 3),
                              jnp.float32)

    def sample(params, step_size):
        mf = lambda x, t, l: net.apply({"params": params}, x, t, l)
        out = ddim_sample(mf, schedule, noise, min_noise=1, max_noise=50,
                          ddim_step_size=step_size)
        return np.asarray(out)

    def mse(x):
        return float(np.mean((x - target_decoded[None]) ** 2))

    student_coarse = mse(sample(student_params, 40))
    teacher_coarse = mse(sample(teacher_params, 40))
    teacher_fine = mse(sample(teacher_params, 5))

    # The teacher is good on its fine grid; at 3 calls it degrades; the
    # distilled student at 3 calls must land near fine-grid quality.
    assert teacher_fine < 0.05, teacher_fine
    assert student_coarse < 0.6 * teacher_coarse, (student_coarse,
                                                   teacher_coarse)
    assert student_coarse < 0.1, (student_coarse, teacher_coarse,
                                  teacher_fine)


def test_distill_cli_smoke(tmp_path):
    """The CLI runs one tiny phase end-to-end and writes the distilled
    checkpoint in the reference format."""
    import json

    import cv2

    from sdm_tpu.cli.distill_diffusion import run as distill_run
    from sdm_tpu.io.checkpoint import (diffusion_checkpoint_dict,
                                       load_checkpoint, save_model)
    from sdm_tpu.models import UNet

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    for i in range(4):
        cv2.imwrite(str(img_dir / f"im_{i}.png"),
                    np.full((8, 8, 3), 128, np.uint8))

    cfg = dict(
        dataset_path=str(tmp_path / "imgs" / "*.png"),
        use_conditional=False, cond_dim=None,
        out_dir=str(tmp_path / "out"),
        checkpoint_steps=10, lr_steps=100, max_epoch=1,
        plot_img_count=2, flip_imgs=False, model_checkpoint=None,
        load_diffusion_optim=False, config_checkpoint=None,
        diffusion_lr=1e-4, batch_size=4,
        noise_scheduler="LINEAR", beta1=0.02, betaT=0.2,
        diffusion_alg="DDIM", skip_step=5, min_noise_step=1,
        max_noise_step=50, max_actual_noise_step=50,
        in_channel=3, out_channel=3, num_layers=2, num_resnet_block=1,
        attn_layers=[], attn_heads=1, attn_dim_per_head=None,
        time_dim=16, min_channel=32, max_channel=32, img_recon=False,
        compute_dtype="float32", seed=0,
    )
    cfg_path = tmp_path / "config.json"
    cfg_path.write_text(json.dumps(cfg))

    net = UNet.from_config(cfg, dtype=None)
    params = net.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 8, 8, 3), jnp.float32),
                      jnp.array([1], jnp.int32), None)["params"]
    (tmp_path / "out").mkdir()
    save_model(diffusion_checkpoint_dict(jax.tree.map(np.asarray, params)),
               "teacher", str(tmp_path / "out"), checkpoint=True, steps=0,
               log=lambda *a, **k: None)
    teacher_path = tmp_path / "out" / "checkpoint" / "teacher_0.pt"
    assert teacher_path.exists()

    result = distill_run(raw_args=[
        "-c", str(cfg_path),
        "--teacher-checkpoint", str(teacher_path),
        "--start-step-size", "5", "--phases", "1",
        "--steps-per-phase", "2", "--device", "cpu"])
    assert result["phase_step_sizes"] == [10]
    out = list((tmp_path / "out" / "checkpoint").glob("distilled_ss10_*.pt"))
    assert len(out) == 1
    ok, ckpt = load_checkpoint(str(out[0]), log=lambda *a, **k: None)
    assert ok and "model" in ckpt and "optimizer" in ckpt


def test_distill_uses_ema_teacher_when_asked(tmp_path):
    """use_ema_teacher selects the checkpoint's 'ema' weights as the
    teacher (and errors clearly when the key is absent)."""
    import json

    import cv2
    import pytest as _pytest

    from sdm_tpu.io.checkpoint import diffusion_checkpoint_dict, save_model
    from sdm_tpu.models import UNet
    from sdm_tpu.train.distill import run_distillation

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    for i in range(4):
        cv2.imwrite(str(img_dir / f"im_{i}.png"),
                    np.full((8, 8, 3), 128, np.uint8))
    cfg = dict(
        dataset_path=str(tmp_path / "imgs" / "*.png"),
        use_conditional=False, cond_dim=None,
        out_dir=str(tmp_path / "out"),
        checkpoint_steps=10, lr_steps=100, max_epoch=1,
        plot_img_count=2, flip_imgs=False, model_checkpoint=None,
        load_diffusion_optim=False, config_checkpoint=None,
        diffusion_lr=1e-4, batch_size=4,
        noise_scheduler="LINEAR", beta1=0.02, betaT=0.2,
        diffusion_alg="DDIM", skip_step=5, min_noise_step=1,
        max_noise_step=50, max_actual_noise_step=50,
        in_channel=3, out_channel=3, num_layers=2, num_resnet_block=1,
        attn_layers=[], attn_heads=1, attn_dim_per_head=None,
        time_dim=16, min_channel=32, max_channel=32, img_recon=False,
        compute_dtype="float32", seed=0,
    )
    net = UNet.from_config(cfg, dtype=None)
    params = net.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 8, 8, 3), jnp.float32),
                      jnp.array([1], jnp.int32), None)["params"]
    # Distinguishable EMA weights: zeros (vs the random 'model' weights).
    ema = jax.tree.map(lambda a: np.zeros_like(np.asarray(a)), params)
    (tmp_path / "out").mkdir()
    save_model(diffusion_checkpoint_dict(
        jax.tree.map(np.asarray, params), ema_params=ema),
        "teacher", str(tmp_path / "out"), checkpoint=True, steps=0,
        log=lambda *a, **k: None)
    teacher_path = str(tmp_path / "out" / "checkpoint" / "teacher_0.pt")

    result = run_distillation(cfg, teacher_checkpoint=teacher_path,
                              start_step_size=5, phases=1, steps_per_phase=0,
                              use_ema_teacher=True,
                              log=lambda *a, **k: None)
    # 0 optimizer steps: the student IS the selected teacher -> all zeros.
    leaves = jax.tree.leaves(result["params"])
    assert all(float(np.abs(np.asarray(l)).max()) == 0.0 for l in leaves)

    # Without EMA in the checkpoint, asking for it errors clearly.
    save_model(diffusion_checkpoint_dict(jax.tree.map(np.asarray, params)),
               "plain", str(tmp_path / "out"), checkpoint=True, steps=0,
               log=lambda *a, **k: None)
    with _pytest.raises(ValueError, match="ema"):
        run_distillation(cfg, teacher_checkpoint=str(
            tmp_path / "out" / "checkpoint" / "plain_0.pt"),
            start_step_size=5, phases=1, steps_per_phase=0,
            use_ema_teacher=True, log=lambda *a, **k: None)


def test_distill_device_dataset_path_runs(tmp_path):
    """Config "device_dataset": true routes distillation through the
    device-resident batch path (dataset shipped to device memory once,
    per-step gathers by index — the campaign's distill stage runs with the
    trainer's fused-loop config): one phase runs with finite losses and
    writes the same student checkpoint the loader path would."""
    import glob

    from sdm_tpu.train.loop import run_training, BASE_SPEC
    from sdm_tpu.train.distill import run_distillation
    from tests.test_train_loop import _mk_images, _base_config

    _mk_images(tmp_path)
    cfg = _base_config(tmp_path, skip_step=4, checkpoint_steps=2)
    run_training(BASE_SPEC, cfg, max_steps=2)
    teacher = sorted(glob.glob(
        str(tmp_path / "out" / "checkpoint" / "diffusion_*.pt")))[-1]

    seen = []
    cfg_dev = dict(cfg, device_dataset=True)
    res = run_distillation(cfg_dev, teacher_checkpoint=teacher, phases=1,
                           steps_per_phase=2, log=seen.append)
    assert np.isfinite(res["phase_losses"][0]).all()
    assert any("Device-resident dataset" in str(m) for m in seen)
    assert glob.glob(
        str(tmp_path / "out" / "checkpoint" / "distilled_ss8_*.pt"))
