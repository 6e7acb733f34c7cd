"""End-to-end generator parity: our CLI generators vs the reference's,
running the same exported bundles with identical starting noise.

Bundles are produced by our export_bundle (covering the export path), with
checkpoints written by torch.save of a reference model's state_dict — i.e.
exactly what a reference user would have on disk.
"""

import json
import os
import shutil

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from sdm_tpu.cli.export_models import export_bundle
from sdm_tpu.cli.generate_images_diffusion import generate_images_diffusion
from sdm_tpu.cli.generate_images_cold_diffusion import generate_images_cold_diffusion
from sdm_tpu.cli.generate_sr_images_diffusion import generate_sr_images_diffusion
from tests.reference_loader import load_reference

REF = load_reference()

MODEL_CFG = dict(
    in_channel=3, out_channel=3, num_layers=2, num_resnet_block=1,
    attn_layers=[1], attn_heads=1, attn_dim_per_head=None, time_dim=16,
    cond_dim=None, min_channel=32, max_channel=64, img_recon=False,
)


def _train_cfg(min_noise, max_noise, **over):
    cfg = dict(MODEL_CFG)
    cfg.update(min_noise_step=min_noise, max_noise_step=max_noise,
               noise_scheduler="LINEAR", beta1=5e-3, betaT=9e-3)
    cfg.update(over)
    return cfg


def _save_ref_ckpt(tmp_path, name, seed=0, **cfg_over):
    torch.manual_seed(seed)
    cfg = dict(MODEL_CFG)
    cfg.update({k: v for k, v in cfg_over.items() if k in MODEL_CFG})
    net = REF.U_Net(
        in_channel=cfg["in_channel"], out_channel=cfg["out_channel"],
        num_layers=cfg["num_layers"], num_resnet_blocks=cfg["num_resnet_block"],
        attn_layers=cfg["attn_layers"], num_heads=cfg["attn_heads"],
        dim_per_head=cfg["attn_dim_per_head"], time_dim=cfg["time_dim"],
        cond_dim=cfg["cond_dim"], min_channel=cfg["min_channel"],
        max_channel=cfg["max_channel"], image_recon=cfg["img_recon"])
    path = str(tmp_path / name)
    torch.save({"model": net.state_dict()}, path)
    return net, path


def _patch_noise(monkeypatch, noise_nhwc):
    """Make both frameworks start from the same gaussian draw."""
    fixed_torch = torch.from_numpy(
        np.ascontiguousarray(noise_nhwc.transpose(0, 3, 1, 2)))
    monkeypatch.setattr(torch, "randn",
                        lambda *a, **k: fixed_torch.clone())
    real_normal = jax.random.normal

    def fake_normal(key, shape, dtype=jnp.float32):
        if tuple(shape) == noise_nhwc.shape:
            return jnp.asarray(noise_nhwc)
        return real_normal(key, shape, dtype)
    monkeypatch.setattr(jax.random, "normal", fake_normal)


def test_ddim_generator_parity_ensemble(tmp_path, monkeypatch):
    net1, p1 = _save_ref_ckpt(tmp_path, "m1.pt", seed=0)
    net2, p2 = _save_ref_ckpt(tmp_path, "m2.pt", seed=1)
    bundle = export_bundle(
        "testmodel", str(tmp_path), img_c=3, img_h=16, img_w=16,
        model_type="BASE",
        entries=[(_train_cfg(11, 20), p1), (_train_cfg(1, 10), p2)])
    config = os.path.join(bundle, "config.json")

    rng = np.random.default_rng(0)
    noise = rng.standard_normal((2, 16, 16, 3)).astype(np.float32)
    _patch_noise(monkeypatch, noise)

    theirs = REF_generate(config, n=2, alg="ddim", step=4)
    ours = generate_images_diffusion(
        ["-c", config, "-n", "2", "--diff_alg", "ddim",
         "--ddim_step_size", "4"],
        save_locally=False)
    np.testing.assert_allclose(ours, theirs, rtol=5e-3, atol=5e-4)


def REF_generate(config, n, alg, step):
    from tests.reference_loader import load_reference_module
    gen_mod = load_reference_module("generate_images_diffusion")
    out = gen_mod.generate_images_diffusion(
        ["-c", config, "-n", str(n), "--diff_alg", alg,
         "--ddim_step_size", str(step)],
        log=lambda *a, **k: None, save_locally=False)
    return out.numpy().transpose(0, 2, 3, 1)


def test_cold_generator_parity_ensemble(tmp_path, monkeypatch):
    net1, p1 = _save_ref_ckpt(tmp_path, "c1.pt", seed=2, img_recon=True)
    net2, p2 = _save_ref_ckpt(tmp_path, "c2.pt", seed=3, img_recon=True)
    cfgs = [_train_cfg(11, 20, img_recon=True), _train_cfg(1, 10, img_recon=True)]
    bundle = export_bundle("coldmodel", str(tmp_path), img_c=3, img_h=16,
                           img_w=16, model_type="BASE-COLD",
                           entries=list(zip(cfgs, [p1, p2])))
    config = os.path.join(bundle, "config.json")
    # Our export writes beta_1/beta_T for BASE-COLD (reference bug fix) —
    # assert that, then also prove we can read a reference-style bundle
    # where they are missing.
    with open(config) as f:
        bd = json.load(f)
    assert "beta_1" in bd["models"][0]

    rng = np.random.default_rng(1)
    noise = rng.standard_normal((2, 16, 16, 3)).astype(np.float32)
    _patch_noise(monkeypatch, noise)

    from tests.reference_loader import load_reference_module
    gen_mod = load_reference_module("generate_images_cold_diffusion")
    theirs = gen_mod.generate_images_cold_diffusion(
        ["-c", config, "-n", "2", "--cold_step_size", "4"],
        log=lambda *a, **k: None, save_locally=False)
    theirs = theirs.numpy().transpose(0, 2, 3, 1)

    ours = generate_images_cold_diffusion(
        ["-c", config, "-n", "2", "--cold_step_size", "4"],
        save_locally=False)
    np.testing.assert_allclose(ours, theirs, rtol=5e-3, atol=5e-4)

    # Reference-style bundle (no beta keys on BASE-COLD): must still run.
    for m in bd["models"]:
        m.pop("beta_1", None)
        m.pop("beta_T", None)
    with open(config, "w") as f:
        json.dump(bd, f)
    out = generate_images_cold_diffusion(
        ["-c", config, "-n", "2", "--cold_step_size", "4"],
        save_locally=False)
    assert np.all(np.isfinite(out))


def test_sr_generator_parity(tmp_path, monkeypatch):
    sr_model = dict(MODEL_CFG, in_channel=6, img_recon=True)
    torch.manual_seed(4)
    net = REF.U_Net(
        in_channel=6, out_channel=3, num_layers=2, num_resnet_blocks=1,
        attn_layers=[1], num_heads=1, dim_per_head=None, time_dim=16,
        cond_dim=None, min_channel=32, max_channel=64, image_recon=True)
    p = str(tmp_path / "sr.pt")
    torch.save({"model": net.state_dict()}, p)
    cfg = dict(sr_model, min_noise_step=1, max_noise_step=10,
               noise_scheduler="LINEAR", beta1=5e-3, betaT=9e-3, cond_t=5)
    bundle = export_bundle("srmodel", str(tmp_path), img_c=3, img_h=16,
                           img_w=16, model_type="SR", entries=[(cfg, p)])
    config = os.path.join(bundle, "config.json")

    rng = np.random.default_rng(2)
    noise = rng.standard_normal((1, 16, 16, 3)).astype(np.float32)
    lr_img_u8 = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    _patch_noise(monkeypatch, noise)

    from tests.reference_loader import load_reference_module
    gen_mod = load_reference_module("generate_sr_images_diffusion")
    theirs = gen_mod.generate_sr_images_diffusion(
        ["-c", config, "--cold_step_size", "4"],
        log=lambda *a, **k: None, lr_img=lr_img_u8, save_locally=False)
    theirs = theirs.numpy().transpose(0, 2, 3, 1)

    ours = generate_sr_images_diffusion(
        ["-c", config, "--cold_step_size", "4"],
        lr_img=lr_img_u8, save_locally=False)
    np.testing.assert_allclose(ours, theirs, rtol=5e-3, atol=1e-3)


def test_generator_saves_grid(tmp_path, monkeypatch):
    _, p = _save_ref_ckpt(tmp_path, "m.pt", seed=5)
    bundle = export_bundle("saver", str(tmp_path), img_c=3, img_h=16,
                           img_w=16, model_type="BASE",
                           entries=[(_train_cfg(1, 10), p)])
    config = os.path.join(bundle, "config.json")
    dest = tmp_path / "outdir"
    dest.mkdir()
    out = generate_images_diffusion(
        ["-c", config, "-n", "2", "--diff_alg", "ddim",
         "--ddim_step_size", "4", "-d", str(dest), "-s", "7"],
        save_locally=True, log=lambda *a, **k: None)
    assert out is None
    import glob as g
    assert g.glob(str(dest / "plots" / "*.jpg"))


def test_ddim_generator_dp_sampling_matches_single_device(tmp_path):
    """--num-devices 8 (batch sharded over the data mesh) must reproduce the
    single-device output exactly (same seed, deterministic DDIM)."""
    _, p = _save_ref_ckpt(tmp_path, "dp.pt", seed=8)
    bundle = export_bundle("dpmodel", str(tmp_path), img_c=3, img_h=16,
                           img_w=16, model_type="BASE",
                           entries=[(_train_cfg(1, 10), p)])
    config = os.path.join(bundle, "config.json")
    common = ["-c", config, "-n", "8", "--diff_alg", "ddim",
              "--ddim_step_size", "4", "-s", "123"]
    out1 = generate_images_diffusion(common + ["--num-devices", "1"],
                                     save_locally=False)
    out8 = generate_images_diffusion(common + ["--num-devices", "8"],
                                     save_locally=False)
    np.testing.assert_allclose(out8, out1, rtol=1e-5, atol=1e-6)


def test_ddim_generator_pipeline_matches_sequential(tmp_path):
    """--pipeline M (each ensemble stage pinned to its own device, M
    microbatches streamed through the chain) must reproduce the sequential
    ensemble chain exactly for DDIM — the sampler is deterministic and the
    initial-noise RNG split order is mirrored."""
    _, p1 = _save_ref_ckpt(tmp_path, "pp1.pt", seed=10)
    _, p2 = _save_ref_ckpt(tmp_path, "pp2.pt", seed=11)
    bundle = export_bundle(
        "pipemodel", str(tmp_path), img_c=3, img_h=16, img_w=16,
        model_type="BASE",
        entries=[(_train_cfg(11, 20), p1), (_train_cfg(1, 10), p2)])
    config = os.path.join(bundle, "config.json")
    common = ["-c", config, "-n", "4", "--diff_alg", "ddim",
              "--ddim_step_size", "4", "-s", "77"]
    quiet = dict(save_locally=False, log=lambda *a, **k: None)
    seq = generate_images_diffusion(common, **quiet)
    pipe = generate_images_diffusion(common + ["--pipeline", "2"], **quiet)
    np.testing.assert_allclose(pipe, seq, rtol=1e-5, atol=1e-6)

    # DDPM through the pipeline (per-microbatch RNG folding — no sequential
    # bit-parity, but must run and stay finite).
    ddpm = generate_images_diffusion(
        ["-c", config, "-n", "4", "-s", "77", "--pipeline", "2"], **quiet)
    assert ddpm.shape == seq.shape and np.all(np.isfinite(ddpm))

    # Guard rails: DP and pipeline are mutually exclusive; microbatches must
    # divide the batch.
    with pytest.raises(ValueError, match="mutually exclusive"):
        generate_images_diffusion(
            common + ["--pipeline", "2", "--num-devices", "2"], **quiet)
    with pytest.raises(ValueError, match="divide"):
        generate_images_diffusion(common + ["--pipeline", "3"], **quiet)


def test_pipeline_rejects_single_model_bundle(tmp_path):
    _, p = _save_ref_ckpt(tmp_path, "solo.pt", seed=12)
    bundle = export_bundle("solomodel", str(tmp_path), img_c=3, img_h=16,
                           img_w=16, model_type="BASE",
                           entries=[(_train_cfg(1, 10), p)])
    config = os.path.join(bundle, "config.json")
    with pytest.raises(ValueError, match="multi-model"):
        generate_images_diffusion(
            ["-c", config, "-n", "2", "--pipeline", "2"],
            save_locally=False, log=lambda *a, **k: None)


def test_ddim_generator_bf16_dtype_close_to_fp32(tmp_path, monkeypatch):
    """--dtype bfloat16 (opt-in fast sampling) runs the same trajectory in
    bf16 with bf16-cast params; random weights + 4 DDIM steps keep it within
    a loose tolerance of the fp32 parity path."""
    _, p1 = _save_ref_ckpt(tmp_path, "b.pt", seed=5)
    bundle = export_bundle(
        "bfmodel", str(tmp_path), img_c=3, img_h=16, img_w=16,
        model_type="BASE", entries=[(_train_cfg(1, 20), p1)])
    config = os.path.join(bundle, "config.json")

    rng = np.random.default_rng(1)
    noise = rng.standard_normal((2, 16, 16, 3)).astype(np.float32)
    _patch_noise(monkeypatch, noise)

    fp32 = generate_images_diffusion(
        ["-c", config, "-n", "2", "--diff_alg", "ddim",
         "--ddim_step_size", "4"], save_locally=False)
    bf16 = generate_images_diffusion(
        ["-c", config, "-n", "2", "--diff_alg", "ddim",
         "--ddim_step_size", "4", "--dtype", "bfloat16"], save_locally=False)
    assert np.isfinite(bf16).all()
    np.testing.assert_allclose(bf16, fp32, rtol=0.15, atol=0.15)


def test_img2img_init_image_generation(tmp_path):
    """img2img (SDEdit-style, TPU-build extension): --init_img_path +
    --init_noise_step replaces the pure-noise start with q_sample(init, t0)
    using the generator's own noise draw, and the first model samples from
    t0 down — pinned against a hand-built trajectory with the same seed."""
    import cv2

    from sdm_tpu.cli.generate_images_diffusion import (
        generate_images_diffusion)
    from sdm_tpu.diffusion.samplers import ddim_sample
    from sdm_tpu.io.bundles import build_model_from_bundle, load_bundle_config
    from sdm_tpu.ops.schedules import make_schedule

    _, p = _save_ref_ckpt(tmp_path, "m1.pt", seed=3)
    bundle = export_bundle("i2i", str(tmp_path), img_c=3, img_h=16, img_w=16,
                           model_type="BASE",
                           entries=[(_train_cfg(1, 20), p)])
    cfg_path = os.path.join(bundle, "config.json")

    rng_img = np.random.default_rng(5)
    init_u8 = rng_img.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    init_path = str(tmp_path / "init.png")
    cv2.imwrite(init_path, init_u8)
    t0 = 12

    got = generate_images_diffusion(raw_args=[
        "-c", cfg_path, "-n", "2", "-s", "11", "--diff_alg", "ddim",
        "--ddim_step_size", "4", "-T", "20",
        "--init_img_path", init_path, "--init_noise_step", str(t0),
    ], log=lambda *a, **k: None, save_locally=False)

    # Hand-built expectation: same PRNGKey/seed discipline as the CLI.
    models_details, folder = load_bundle_config(cfg_path)
    md = models_details["models"][0]
    factory, schedule, _, params = build_model_from_bundle(md, folder,
                                                           max_T=20)
    rng = jax.random.PRNGKey(11)
    rng, nk = jax.random.split(rng)
    noise = jax.random.normal(nk, (2, 16, 16, 3), jnp.float32)
    decoded = (cv2.imread(init_path).astype(np.float32) - 127.5) / 127.5
    init_b = jnp.asarray(np.repeat(decoded[None], 2, axis=0))
    x_t = schedule.q_sample(init_b, jnp.array([t0]), noise)
    want = ddim_sample(factory(params), schedule, x_t, min_noise=1,
                       max_noise=t0, ddim_step_size=4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)

    # Validation: out-of-range t0 and missing partner flag error clearly.
    import pytest as _pytest
    with _pytest.raises(ValueError, match="init_noise_step"):
        generate_images_diffusion(raw_args=[
            "-c", cfg_path, "-n", "1", "-s", "1", "--diff_alg", "ddim",
            "--ddim_step_size", "4", "-T", "20",
            "--init_img_path", init_path, "--init_noise_step", "999",
        ], log=lambda *a, **k: None, save_locally=False)
    with _pytest.raises(ValueError, match="go together"):
        generate_images_diffusion(raw_args=[
            "-c", cfg_path, "-n", "1", "--init_img_path", init_path,
        ], log=lambda *a, **k: None, save_locally=False)


def test_inpainting_keeps_known_region(tmp_path):
    """Inpainting (--inpaint_img_path/--inpaint_mask_path): the kept region
    equals the known image exactly (final x0 blend) while the generated
    region actually differs from it; mutually exclusive with img2img and
    ddim-only."""
    import cv2

    from sdm_tpu.cli.generate_images_diffusion import (
        generate_images_diffusion)

    _, p = _save_ref_ckpt(tmp_path, "mi.pt", seed=4)
    bundle = export_bundle("inp", str(tmp_path), img_c=3, img_h=16, img_w=16,
                           model_type="BASE",
                           entries=[(_train_cfg(1, 20), p)])
    cfg_path = os.path.join(bundle, "config.json")

    rng_img = np.random.default_rng(6)
    known_u8 = rng_img.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    known_path = str(tmp_path / "known.png")
    cv2.imwrite(known_path, known_u8)
    mask = np.zeros((16, 16), np.uint8)
    mask[:, :8] = 255  # keep the left half
    mask_path = str(tmp_path / "mask.png")
    cv2.imwrite(mask_path, mask)

    got = generate_images_diffusion(raw_args=[
        "-c", cfg_path, "-n", "2", "-s", "13", "--diff_alg", "ddim",
        "--ddim_step_size", "4", "-T", "20",
        "--inpaint_img_path", known_path, "--inpaint_mask_path", mask_path,
    ], log=lambda *a, **k: None, save_locally=False)
    got = np.asarray(got)
    known = (cv2.imread(known_path).astype(np.float32) - 127.5) / 127.5

    # Kept region == known image exactly; generated region is synthesized.
    np.testing.assert_allclose(got[:, :, :8, :],
                               np.repeat(known[None], 2, 0)[:, :, :8, :],
                               rtol=0, atol=1e-6)
    assert np.abs(got[:, :, 8:, :]
                  - np.repeat(known[None], 2, 0)[:, :, 8:, :]).max() > 0.1

    import pytest as _pytest
    with _pytest.raises(ValueError, match="ddim"):
        generate_images_diffusion(raw_args=[
            "-c", cfg_path, "-n", "1", "--diff_alg", "ddpm", "-T", "20",
            "--inpaint_img_path", known_path,
            "--inpaint_mask_path", mask_path,
        ], log=lambda *a, **k: None, save_locally=False)
    with _pytest.raises(ValueError, match="go together"):
        generate_images_diffusion(raw_args=[
            "-c", cfg_path, "-n", "1", "--diff_alg", "ddim", "-T", "20",
            "--inpaint_img_path", known_path,
        ], log=lambda *a, **k: None, save_locally=False)


def test_cold_generator_karras(tmp_path):
    """--karras on the cold generator (cold_sample steps= extension,
    VERDICT r3 item 7): rho-spaced list, same step count as the uniform
    one — output changes but stays finite and shaped."""
    _, p = _save_ref_ckpt(tmp_path, "ck.pt", seed=9, img_recon=True)
    bundle = export_bundle(
        "coldkar", str(tmp_path), img_c=3, img_h=16, img_w=16,
        model_type="BASE-COLD",
        entries=[(_train_cfg(1, 20, img_recon=True), p)])
    config = os.path.join(bundle, "config.json")
    base = ["-c", config, "-n", "2", "-s", "3", "-T", "20",
            "--cold_step_size", "4"]
    quiet = dict(save_locally=False, log=lambda *a, **k: None)
    uni = np.asarray(generate_images_cold_diffusion(base, **quiet))
    kar = np.asarray(generate_images_cold_diffusion(base + ["--karras"],
                                                    **quiet))
    assert uni.shape == kar.shape == (2, 16, 16, 3)
    assert np.isfinite(kar).all()
    assert np.abs(kar - uni).max() > 1e-7


def test_bundle_param_cache_skips_reload_and_invalidates(tmp_path,
                                                         monkeypatch):
    """The most-recent-bundle param cache (io/bundles.py): a second
    build_model_from_bundle on the same unchanged checkpoint must not
    torch.load again (eval_batch runs many variants per bundle); rewriting
    the checkpoint must invalidate."""
    import sdm_tpu.io.bundles as bundles
    from sdm_tpu.io.bundles import build_model_from_bundle, \
        load_bundle_config

    _, ckpt = _save_ref_ckpt(tmp_path, "cachem.pt")
    bundle = export_bundle("cachem", str(tmp_path), img_c=3, img_h=16,
                           img_w=16, model_type="BASE",
                           entries=[(_train_cfg(1, 10), ckpt)])
    models, folder = load_bundle_config(os.path.join(bundle, "config.json"))
    md = models["models"][0]

    calls = {"n": 0}
    real = bundles.load_checkpoint

    def counting(path, log=print):
        calls["n"] += 1
        return real(path, log=log)

    monkeypatch.setattr(bundles, "load_checkpoint", counting)
    bundles._PARAM_CACHE.clear()
    _, _, _, p1 = build_model_from_bundle(md, folder, max_T=10)
    _, _, _, p2 = build_model_from_bundle(md, folder, max_T=10)
    assert calls["n"] == 1
    assert all(a is b for a, b in zip(jax.tree.leaves(p1),
                                      jax.tree.leaves(p2)))
    # Different load parameters -> different tree -> new load.
    _, _, _, p3 = build_model_from_bundle(md, folder, max_T=10,
                                          dtype=jnp.bfloat16,
                                          cast_params=True)
    assert calls["n"] == 2
    assert jax.tree.leaves(p3)[0].dtype == jnp.bfloat16

    # Rewriting the bundle's model file invalidates the cache (export
    # copies the checkpoint INTO the bundle, so overwrite that copy).
    _, fresh = _save_ref_ckpt(tmp_path, "cachem.pt", seed=1)
    shutil.copyfile(fresh, os.path.join(folder, md["model_name"]))
    _, _, _, p4 = build_model_from_bundle(md, folder, max_T=10)
    assert calls["n"] == 3
    leaf1 = np.asarray(jax.tree.leaves(p1)[0], np.float32)
    leaf4 = np.asarray(jax.tree.leaves(p4)[0], np.float32)
    assert not np.array_equal(leaf1, leaf4)
