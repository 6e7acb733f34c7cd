"""TPU-build extensions beyond the reference surface: EMA weight averaging
(config "ema_decay") and classifier-free guidance (training "cfg_drop_prob" +
generator --guidance-scale). Both default off; the golden parity suites pin
that the defaults reproduce the reference numerics unchanged."""

import glob
import json
import os

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from sdm_tpu.diffusion.guidance import cfg_model_fn, dropout_labels
from sdm_tpu.train.loop import run_training, BASE_SPEC
from sdm_tpu.data.tinydb_compat import write_tables
from tests.test_train_loop import _mk_images, _base_config
from tests.test_generation import MODEL_CFG, _train_cfg
from tests.reference_loader import load_reference

REF = load_reference()


# ---------------------------------------------------------------- guidance

def _linear_model(x, t, labels):
    # e(x, l) = x + sum(l): conditional and null branches differ by sum(l).
    return x + jnp.sum(labels, axis=-1)[:, None, None, None]


def test_cfg_formula_batched_labels():
    x = jnp.asarray(np.random.default_rng(0)
                    .standard_normal((3, 4, 4, 2)), jnp.float32)
    labels = jnp.asarray([[1.0, 2.0], [0.5, 0.0], [3.0, -1.0]])
    t = jnp.array([5], jnp.int32)
    for scale in (0.0, 2.0, 7.5):
        guided = cfg_model_fn(_linear_model, scale)(x, t, labels)
        # e_u = x (zero labels), e_c = x + sum(l)
        want = x + scale * jnp.sum(labels, axis=-1)[:, None, None, None]
        np.testing.assert_allclose(np.asarray(guided), np.asarray(want),
                                   rtol=1e-6, atol=1e-6)


def test_cfg_broadcasts_shared_label_vector():
    # Generators pass one (cond_dim,) vector for the whole batch
    # (generate_images_diffusion.py:180-185 in the reference).
    x = jnp.ones((2, 4, 4, 1), jnp.float32)
    lab = jnp.asarray([2.0, 3.0])
    out = cfg_model_fn(_linear_model, 4.0)(x, jnp.array([1]), lab)
    np.testing.assert_allclose(np.asarray(out), 1.0 + 4.0 * 5.0)


def test_cfg_scale_one_is_identity():
    assert cfg_model_fn(_linear_model, 1.0) is _linear_model


def test_cfg_requires_labels():
    with pytest.raises(ValueError, match="label conditioning"):
        cfg_model_fn(_linear_model, 2.0)(jnp.ones((1, 2, 2, 1)),
                                         jnp.array([1]), None)


def test_dropout_labels():
    labels = jnp.ones((400, 3), jnp.float32)
    key = jax.random.PRNGKey(0)
    assert dropout_labels(labels, key, 0.0) is labels
    assert dropout_labels(None, key, 0.5) is None
    out1 = np.asarray(dropout_labels(labels, key, 1.0))
    assert (out1 == 0).all()
    out = np.asarray(dropout_labels(labels, key, 0.25))
    row_zero = (out == 0).all(axis=1)
    row_kept = (out == 1).all(axis=1)
    assert (row_zero | row_kept).all()  # all-or-nothing per sample
    assert 0.15 < row_zero.mean() < 0.35


# --------------------------------------------------------------------- EMA

def test_ema_update_matches_manual_recursion():
    from sdm_tpu.enums import Objective
    from sdm_tpu.ops.schedules import LinearSchedule
    from sdm_tpu.train import (make_optimizer, make_train_step,
                               create_train_state)

    params = {"w": jnp.asarray(2.0, jnp.float32)}
    apply_fn = lambda p, x, t, l: x * p["w"]
    schedule = LinearSchedule.create(5e-3, 9e-3, 10)
    tx = make_optimizer(1e-2, 1000)
    decay = 0.5
    step = make_train_step(apply_fn, schedule, tx, objective=Objective.EPS,
                           min_noise_step=1, max_actual_noise_step=10,
                           ema_decay=decay)
    state = create_train_state(params, tx, ema=True)
    np.testing.assert_allclose(float(state.ema_params["w"]), 2.0)

    batch = {"image": jnp.asarray(
        np.random.default_rng(0).standard_normal((4, 8, 8, 3)), jnp.float32)}
    ema_manual = 2.0
    for i in range(3):
        state, _ = step(state, batch, jax.random.PRNGKey(i))
        w = float(state.params["w"])
        ema_manual = ema_manual + (1 - decay) * (w - ema_manual)
        np.testing.assert_allclose(float(state.ema_params["w"]), ema_manual,
                                   rtol=1e-6)
    # The average must lag the raw params after updates.
    assert float(state.ema_params["w"]) != float(state.params["w"])


def test_training_with_ema_checkpoints_and_resumes(tmp_path):
    _mk_images(tmp_path)
    cfg = _base_config(tmp_path, ema_decay=0.5)
    result = run_training(BASE_SPEC, cfg, max_steps=3)
    assert np.isfinite(result["last_loss"])

    ckpt_path = sorted(glob.glob(
        str(tmp_path / "out" / "checkpoint" / "diffusion_*.pt")))[-1]
    ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    assert set(ckpt["ema"].keys()) == set(ckpt["model"].keys())
    # After 3 Adam steps the average must differ from the raw weights but
    # only slightly (it starts at the init and chases the params).
    diffs = [float((ckpt["model"][k].float() - ckpt["ema"][k].float())
                   .abs().max()) for k in ckpt["model"]]
    assert max(diffs) > 0

    # The reference loader must still accept the checkpoint (extra "ema" key
    # is simply not read — train_diffusion.py:207-220).
    ref_net = REF.U_Net(
        in_channel=3, out_channel=3, num_layers=1, num_resnet_blocks=1,
        attn_layers=[0], num_heads=1, dim_per_head=None, time_dim=8,
        cond_dim=None, min_channel=32, max_channel=32, image_recon=False)
    ref_net.load_state_dict(ckpt["model"])

    # Resume restores the stored average (not the params): run 1 more step
    # from the checkpoint and confirm the new checkpoint's ema evolved from
    # the OLD ema by one decay update, not from a reset-to-params state.
    cfg2 = _base_config(tmp_path, ema_decay=0.5, model_checkpoint=ckpt_path,
                        load_diffusion_optim=True,
                        out_dir=str(tmp_path / "out2"))
    run_training(BASE_SPEC, cfg2, max_steps=1)
    ckpt2_path = sorted(glob.glob(
        str(tmp_path / "out2" / "checkpoint" / "diffusion_*.pt")))[-1]
    ckpt2 = torch.load(ckpt2_path, map_location="cpu", weights_only=False)
    k = "in_layer.0.conv_layer.0.weight"
    ema_pred = (ckpt["ema"][k].float()
                + 0.5 * (ckpt2["model"][k].float() - ckpt["ema"][k].float()))
    np.testing.assert_allclose(ckpt2["ema"][k].float().numpy(),
                               ema_pred.numpy(), rtol=1e-5, atol=1e-6)


def test_training_with_cfg_dropout_runs(tmp_path):
    paths = _mk_images(tmp_path)
    db = tmp_path / "cond.json"
    write_tables(str(db), {
        "Data": [{"filename": p, "a": float(i % 2), "b": 1.0}
                 for i, p in enumerate(paths)],
        "Labels": [{"labels": ["a", "b"]}],
    })
    cfg = _base_config(tmp_path, dataset_path=str(db), use_conditional=True,
                       cond_dim=2, diffusion_alg="DDPM", cfg_drop_prob=0.5)
    result = run_training(BASE_SPEC, cfg, max_steps=2)
    assert result["global_steps"] == 2
    assert np.isfinite(result["last_loss"])


# -------------------------------------------------- generator integration

def _export_bundle_with_ema(tmp_path, cond_dim=None):
    from sdm_tpu.cli.export_models import export_bundle
    torch.manual_seed(0)
    kw = dict(
        in_channel=3, out_channel=3, num_layers=2, num_resnet_blocks=1,
        attn_layers=[1], num_heads=1, dim_per_head=None, time_dim=16,
        cond_dim=cond_dim, min_channel=32, max_channel=64, image_recon=False)
    net_model = REF.U_Net(**kw)
    torch.manual_seed(1)
    net_ema = REF.U_Net(**kw)
    path = str(tmp_path / "m.pt")
    torch.save({"model": net_model.state_dict(),
                "ema": net_ema.state_dict()}, path)
    # A second bundle whose "model" IS the ema net: --use-ema on bundle 1
    # must reproduce plain sampling of bundle 2 exactly.
    path2 = str(tmp_path / "m2.pt")
    torch.save({"model": net_ema.state_dict()}, path2)
    tcfg = _train_cfg(1, 10, cond_dim=cond_dim)
    b1 = export_bundle("with_ema", str(tmp_path), img_c=3, img_h=16, img_w=16,
                       model_type="BASE", entries=[(tcfg, path)])
    b2 = export_bundle("ema_as_model", str(tmp_path), img_c=3, img_h=16,
                       img_w=16, model_type="BASE", entries=[(tcfg, path2)])
    return (os.path.join(b1, "config.json"), os.path.join(b2, "config.json"))


def test_generator_use_ema_samples_the_average(tmp_path):
    from sdm_tpu.cli.generate_images_diffusion import generate_images_diffusion
    cfg1, cfg2 = _export_bundle_with_ema(tmp_path)
    base = ["-n", "2", "--diff_alg", "ddim", "--ddim_step_size", "4",
            "-T", "10", "-s", "7"]
    plain = generate_images_diffusion(["-c", cfg1] + base, save_locally=False)
    ema = generate_images_diffusion(["-c", cfg1, "--use-ema"] + base,
                                    save_locally=False)
    ema_as_model = generate_images_diffusion(["-c", cfg2] + base,
                                             save_locally=False)
    assert np.abs(ema - plain).max() > 1e-3  # different weights
    np.testing.assert_allclose(ema, ema_as_model, rtol=1e-6, atol=1e-6)


def test_generator_use_ema_errors_without_ema_weights(tmp_path):
    from sdm_tpu.cli.generate_images_diffusion import generate_images_diffusion
    _, cfg2 = _export_bundle_with_ema(tmp_path)
    with pytest.raises(ValueError, match="no 'ema' weights"):
        generate_images_diffusion(
            ["-c", cfg2, "--use-ema", "-n", "1", "--diff_alg", "ddim",
             "--ddim_step_size", "4", "-T", "10", "-s", "7"],
            save_locally=False)


def test_generator_guidance_scale(tmp_path):
    from sdm_tpu.cli.generate_images_diffusion import generate_images_diffusion
    cfg1, _ = _export_bundle_with_ema(tmp_path, cond_dim=2)
    base = ["-c", cfg1, "-n", "2", "--diff_alg", "ddim",
            "--ddim_step_size", "4", "-T", "10", "-s", "7",
            "-l", "1.0", "0.0"]
    plain = generate_images_diffusion(base, save_locally=False)
    gs1 = generate_images_diffusion(base + ["--guidance-scale", "1.0"],
                                    save_locally=False)
    np.testing.assert_allclose(gs1, plain, rtol=1e-6, atol=1e-6)
    gs3 = generate_images_diffusion(base + ["--guidance-scale", "3.0"],
                                    save_locally=False)
    assert np.abs(gs3 - plain).max() > 1e-4

    # DDPM path wraps the model too (noise draws are seed-identical).
    ddpm = ["-c", cfg1, "-n", "2", "--diff_alg", "ddpm", "-T", "10",
            "-s", "7", "-l", "1.0", "0.0"]
    p0 = generate_images_diffusion(ddpm, save_locally=False)
    p3 = generate_images_diffusion(ddpm + ["--guidance-scale", "3.0"],
                                   save_locally=False)
    assert np.abs(p3 - p0).max() > 1e-4


def test_generator_guidance_requires_labels(tmp_path):
    from sdm_tpu.cli.generate_images_diffusion import generate_images_diffusion
    cfg1, _ = _export_bundle_with_ema(tmp_path)  # unconditional model
    with pytest.raises(ValueError, match="guidance"):
        generate_images_diffusion(
            ["-c", cfg1, "-n", "1", "--diff_alg", "ddim",
             "--ddim_step_size", "4", "-T", "10", "--guidance-scale", "2.0"],
            save_locally=False)
