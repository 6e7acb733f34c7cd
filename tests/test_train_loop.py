"""End-to-end training-loop smoke: tiny dataset -> few steps -> reference-
format checkpoints on disk that the actual reference model loads strictly."""

import glob
import os

import numpy as np
import torch

from sdm_tpu.train.loop import (
    run_training, BASE_SPEC, COLD_SPEC, DOODLE_SPEC, SR_SPEC)
from sdm_tpu.data.tinydb_compat import write_tables
from tests.reference_loader import load_reference

REF = load_reference()


def _mk_images(tmp_path, n=6, hw=8):
    import cv2
    rng = np.random.default_rng(0)
    d = tmp_path / "imgs"
    d.mkdir(exist_ok=True)
    paths = []
    for i in range(n):
        p = str(d / f"im_{i}.png")
        cv2.imwrite(p, rng.integers(0, 256, (hw, hw, 3), dtype=np.uint8))
        paths.append(p)
    return paths


def _base_config(tmp_path, **over):
    cfg = dict(
        dataset_path=str(tmp_path / "imgs" / "*.png"),
        use_conditional=False, cond_dim=None,
        out_dir=str(tmp_path / "out"),
        checkpoint_steps=2, lr_steps=100, max_epoch=1, plot_img_count=4,
        flip_imgs=True, model_checkpoint=None, load_diffusion_optim=False,
        config_checkpoint=None, diffusion_lr=1e-4, batch_size=2,
        noise_scheduler="LINEAR", beta1=5e-3, betaT=9e-3,
        diffusion_alg="DDIM", skip_step=5, min_noise_step=1,
        max_noise_step=10, max_actual_noise_step=10,
        in_channel=3, out_channel=3, num_layers=1, num_resnet_block=1,
        attn_layers=[0], attn_heads=1, attn_dim_per_head=None,
        time_dim=8, min_channel=32, max_channel=32, img_recon=False,
        compute_dtype="float32",
    )
    cfg.update(over)
    return cfg


def test_base_training_end_to_end(tmp_path):
    _mk_images(tmp_path)
    cfg = _base_config(tmp_path)
    result = run_training(BASE_SPEC, cfg, max_steps=3)
    assert result["global_steps"] == 3
    assert np.isfinite(result["last_loss"])

    ckpts = sorted(glob.glob(str(tmp_path / "out" / "checkpoint" / "diffusion_*.pt")))
    cfg_ckpts = sorted(glob.glob(str(tmp_path / "out" / "checkpoint" / "config_*.pt")))
    plots = glob.glob(str(tmp_path / "out" / "plots" / "*.jpg"))
    assert ckpts and cfg_ckpts and plots

    # The reference model must load our training checkpoint strictly.
    loaded = torch.load(ckpts[-1], map_location="cpu", weights_only=False)
    ref_net = REF.U_Net(
        in_channel=3, out_channel=3, num_layers=1, num_resnet_blocks=1,
        attn_layers=[0], num_heads=1, dim_per_head=None, time_dim=8,
        cond_dim=None, min_channel=32, max_channel=32, image_recon=False)
    ref_net.load_state_dict(loaded["model"])
    optim = torch.optim.Adam(ref_net.parameters(), lr=1e-4, betas=(0.5, 0.999))
    optim.load_state_dict(loaded["optimizer"])

    ok, cfg_state = (True, torch.load(cfg_ckpts[-1], map_location="cpu",
                                      weights_only=False))
    assert cfg_state["beta_1"] == 5e-3 and cfg_state["beta_T"] == 9e-3
    assert "global_steps" in cfg_state and "starting_epoch" in cfg_state


def test_base_training_resume_from_checkpoint(tmp_path):
    _mk_images(tmp_path)
    cfg = _base_config(tmp_path)
    run_training(BASE_SPEC, cfg, max_steps=2)
    ckpt = sorted(glob.glob(str(tmp_path / "out" / "checkpoint" / "diffusion_*.pt")))[-1]
    cfg_ckpt = sorted(glob.glob(str(tmp_path / "out" / "checkpoint" / "config_*.pt")))[-1]

    cfg2 = _base_config(tmp_path, model_checkpoint=ckpt,
                        load_diffusion_optim=True, config_checkpoint=cfg_ckpt)
    result = run_training(BASE_SPEC, cfg2, max_steps=4)
    assert result["global_steps"] == 4


def test_cold_training_end_to_end(tmp_path):
    _mk_images(tmp_path)
    cfg = _base_config(tmp_path, img_recon=True, noise_scheduler="COSINE",
                       diffusion_alg="DDPM")
    result = run_training(COLD_SPEC, cfg, max_steps=3)
    assert result["global_steps"] == 3
    assert np.isfinite(result["last_loss"])
    assert glob.glob(str(tmp_path / "out" / "plots" / "*.jpg"))


def test_doodle_training_end_to_end(tmp_path):
    paths = _mk_images(tmp_path)
    db = tmp_path / "doodle.json"
    write_tables(str(db), {
        "Data": [{"filename": p, "doodle": paths[(i + 1) % len(paths)]}
                 for i, p in enumerate(paths)],
        "Labels": [{"labels": ["doodle"]}],
    })
    cfg = _base_config(tmp_path, dataset_path=str(db), in_channel=6)
    del cfg["flip_imgs"], cfg["use_conditional"]
    result = run_training(DOODLE_SPEC, cfg, max_steps=3)
    assert result["global_steps"] == 3
    assert np.isfinite(result["last_loss"])
    # Startup grid of the doodle conditioning images
    # (reference train_doodle_diffusion.py:145-150).
    assert os.path.exists(str(tmp_path / "out" / "plots" / "label_plot.jpg"))


def test_sr_training_end_to_end(tmp_path):
    _mk_images(tmp_path, hw=8)
    cfg = _base_config(tmp_path, in_channel=6, img_recon=True,
                       lr_dim=4, sr_dim=8, cond_t=5)
    result = run_training(SR_SPEC, cfg, max_steps=3)
    assert result["global_steps"] == 3
    assert np.isfinite(result["last_loss"])
    assert glob.glob(str(tmp_path / "out" / "plots" / "*.jpg"))


def test_conditional_training_with_labels_txt(tmp_path):
    paths = _mk_images(tmp_path)
    db = tmp_path / "cond.json"
    write_tables(str(db), {
        "Data": [{"filename": p, "a": float(i % 2), "b": 1.0}
                 for i, p in enumerate(paths)],
        "Labels": [{"labels": ["a", "b"]}],
    })
    cfg = _base_config(tmp_path, dataset_path=str(db), use_conditional=True,
                       cond_dim=2, diffusion_alg="DDPM")
    result = run_training(BASE_SPEC, cfg, max_steps=2)
    assert result["global_steps"] == 2
    assert os.path.exists(str(tmp_path / "out" / "labels.txt"))


def test_ensemble_range_training_and_native_checkpoint(tmp_path):
    """max_actual_noise_step < max_noise_step (eDiff-I-style range
    specialization) exercises the q_sampled-plot-images preview branch;
    native_checkpoint=True additionally writes an Orbax checkpoint."""
    _mk_images(tmp_path)
    cfg = _base_config(tmp_path, max_noise_step=10, max_actual_noise_step=8,
                       skip_step=4, native_checkpoint=True)
    result = run_training(BASE_SPEC, cfg, max_steps=3)
    assert result["global_steps"] == 3
    assert glob.glob(str(tmp_path / "out" / "plots" / "*.jpg"))
    native = glob.glob(str(tmp_path / "out" / "checkpoint" / "native_*"))
    assert native
    from sdm_tpu.io.orbax_ckpt import load_native
    import jax
    restored = load_native(native[0], jax.tree.map(np.asarray,
                                                   result["state"]))
    assert restored is not None


def test_async_checkpointing(tmp_path):
    _mk_images(tmp_path)
    cfg = _base_config(tmp_path, async_checkpoint=True, max_epoch=2)
    result = run_training(BASE_SPEC, cfg, max_steps=4)
    assert result["global_steps"] == 4
    # All cadence + epoch-end checkpoints present and loadable.
    ckpts = sorted(glob.glob(str(tmp_path / "out" / "checkpoint" / "diffusion_*.pt")))
    assert len(ckpts) >= 2
    loaded = torch.load(ckpts[-1], map_location="cpu", weights_only=False)
    assert "model" in loaded and "optimizer" in loaded
    assert glob.glob(str(tmp_path / "out" / "plots" / "*.jpg"))


def test_nan_guard_fires_before_checkpoint_is_written(tmp_path):
    """Divergence at a checkpoint-cadence step must raise BEFORE that step's
    state is persisted (reference order, train_diffusion.py:354-400): a user
    resuming from the newest checkpoint must never get diverged weights."""
    import pytest
    _mk_images(tmp_path)
    # lr=1e30 destroys the params on the step-0 update -> step 1 forward
    # overflows through GroupNorm into NaN. checkpoint_steps=1 makes every
    # step a checkpoint step.
    cfg = _base_config(tmp_path, diffusion_lr=1e30, checkpoint_steps=1,
                       max_epoch=10)
    with pytest.raises(Exception, match="NaN"):
        run_training(BASE_SPEC, cfg, max_steps=10)
    ckpts = {os.path.basename(p) for p in
             glob.glob(str(tmp_path / "out" / "checkpoint" / "diffusion_*.pt"))}
    # Step 0 (pre-divergence) may be checkpointed; the NaN step must not be.
    assert ckpts <= {"diffusion_0.pt"}, ckpts


def test_training_with_grad_accum_and_remat(tmp_path):
    """Config-driven grad_accum_steps + remat through the full loop."""
    _mk_images(tmp_path, n=8)
    cfg = _base_config(tmp_path, batch_size=4, grad_accum_steps=2, remat=True,
                       checkpoint_steps=1000)
    result = run_training(BASE_SPEC, cfg, max_steps=2)
    assert result["global_steps"] == 2
    assert np.isfinite(result["last_loss"])


def test_training_with_min_snr_gamma(tmp_path):
    """Config min_snr_gamma (weighted loss) through the full loop."""
    _mk_images(tmp_path)
    cfg = _base_config(tmp_path, min_snr_gamma=5.0, checkpoint_steps=1000)
    result = run_training(BASE_SPEC, cfg, max_steps=2)
    assert result["global_steps"] == 2
    assert np.isfinite(result["last_loss"])


def test_training_is_deterministic_given_seed(tmp_path):
    """Same config + seed -> identical per-step losses (model init, t/eps
    draws, dataset shuffle, and batch order are all seeded)."""
    _mk_images(tmp_path)
    losses = []
    for run in range(2):
        cfg = _base_config(tmp_path, checkpoint_steps=1000, seed=11,
                           out_dir=str(tmp_path / f"out_{run}"))
        result = run_training(BASE_SPEC, cfg, max_steps=3)
        losses.append(result["last_loss"])
    assert losses[0] == losses[1], losses


def test_preemption_signal_checkpoints_and_resumes(tmp_path):
    """Preemption-safe checkpointing (config preempt_checkpoint, default on;
    TPU-build extension): a SIGTERM mid-training finishes the in-flight step,
    writes model+config checkpoints at that exact step, returns cleanly with
    summary["preempted"], restores the previous signal handlers, and the run
    resumes from the written checkpoint."""
    import signal
    import threading

    _mk_images(tmp_path)
    # No cadence/epoch checkpoints in range and an effectively endless run:
    # the ONLY way this returns is the preemption path.
    cfg = _base_config(tmp_path, max_epoch=10_000,
                       checkpoint_steps=10 ** 6,
                       epoch_checkpoint_every=10 ** 6)
    prev_handler = signal.getsignal(signal.SIGTERM)

    timer = threading.Timer(6.0, signal.raise_signal, (signal.SIGTERM,))
    timer.start()
    try:
        result = run_training(BASE_SPEC, cfg)
    finally:
        timer.cancel()

    assert result["preempted"] is True
    steps = result["global_steps"]
    assert steps > 0
    # Checkpointed at the exact stopping step, both files.
    assert os.path.exists(
        str(tmp_path / "out" / "checkpoint" / f"diffusion_{steps}.pt"))
    assert os.path.exists(
        str(tmp_path / "out" / "checkpoint" / f"config_{steps}.pt"))
    # Handlers restored for the caller.
    assert signal.getsignal(signal.SIGTERM) == prev_handler

    cfg2 = _base_config(
        tmp_path,
        model_checkpoint=str(tmp_path / "out" / "checkpoint"
                             / f"diffusion_{steps}.pt"),
        load_diffusion_optim=True,
        config_checkpoint=str(tmp_path / "out" / "checkpoint"
                              / f"config_{steps}.pt"),
        max_epoch=10_000, epoch_checkpoint_every=10 ** 6)
    result2 = run_training(BASE_SPEC, cfg2, max_steps=steps + 2)
    assert result2["global_steps"] == steps + 2
    assert result2["preempted"] is False


def test_checkpoint_dominates_epoch_predicate():
    from sdm_tpu.train.loop import checkpoint_dominates_epoch
    # Slow checkpoint vs a short epoch: nudge.
    assert checkpoint_dominates_epoch(30.0, 40.0)
    # Fast checkpoint never nudges, even if the epoch is trivially short.
    assert not checkpoint_dominates_epoch(2.0, 2.5)
    # Long epoch dominated by compute: no nudge.
    assert not checkpoint_dominates_epoch(30.0, 600.0)
    # Degenerate timing (checkpoint >= measured epoch) still nudges.
    assert checkpoint_dominates_epoch(10.0, 10.0)


def test_training_with_grad_clip_norm(tmp_path):
    """Config grad_clip_norm (clipped updates) through the full loop."""
    _mk_images(tmp_path)
    cfg = _base_config(tmp_path, grad_clip_norm=1.0, checkpoint_steps=1000)
    result = run_training(BASE_SPEC, cfg, max_steps=3)
    assert result["global_steps"] == 3
    assert np.isfinite(result["last_loss"])

def test_native_checkpoint_resume_matches_pt_resume(tmp_path):
    """model_checkpoint pointing at a native_<steps> dir restores the FULL
    state (params, Adam moments, EMA, step counter) and must continue
    training bit-identically to the torch .pt + config-checkpoint resume
    (VERDICT r3 item 4: orbax restore wired, not write-only)."""
    import jax
    _mk_images(tmp_path)
    cfg = _base_config(tmp_path, native_checkpoint=True, ema_decay=0.999,
                       checkpoint_steps=2)
    run_training(BASE_SPEC, cfg, max_steps=2)
    ckpt_dir = tmp_path / "out" / "checkpoint"
    pt = sorted(glob.glob(str(ckpt_dir / "diffusion_*.pt")))[-1]
    cfg_pt = sorted(glob.glob(str(ckpt_dir / "config_*.pt")))[-1]
    native = sorted(glob.glob(str(ckpt_dir / "native_*")))[-1]

    r_pt = run_training(BASE_SPEC, _base_config(
        tmp_path, out_dir=str(tmp_path / "out_pt"), ema_decay=0.999,
        model_checkpoint=pt, load_diffusion_optim=True,
        config_checkpoint=cfg_pt), max_steps=4)
    r_nat = run_training(BASE_SPEC, _base_config(
        tmp_path, out_dir=str(tmp_path / "out_nat"), ema_decay=0.999,
        model_checkpoint=native), max_steps=4)
    assert r_pt["global_steps"] == r_nat["global_steps"] == 4

    for name in ("params", "ema_params"):
        a = jax.tree.leaves(getattr(r_pt["state"], name))
        b = jax.tree.leaves(getattr(r_nat["state"], name))
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y),
                                          err_msg=name)


def test_native_checkpoint_resume_onto_fsdp_shardings(tmp_path):
    """A native checkpoint written by a replicated run restores directly
    onto the FSDP-sharded layout of the resuming run (the advertised point
    of io/orbax_ckpt.load_native) and trains on."""
    import jax
    _mk_images(tmp_path, n=8)
    cfg = _base_config(tmp_path, batch_size=8, native_checkpoint=True,
                       checkpoint_steps=2, max_epoch=4)
    run_training(BASE_SPEC, cfg, max_steps=2)
    native = sorted(glob.glob(str(
        tmp_path / "out" / "checkpoint" / "native_*")))[-1]

    r = run_training(BASE_SPEC, _base_config(
        tmp_path, batch_size=8, out_dir=str(tmp_path / "out_fsdp"),
        model_checkpoint=native, fsdp=True, fsdp_min_size=1024,
        max_epoch=4), max_steps=3)
    assert r["global_steps"] == 3 and np.isfinite(r["last_loss"])
    specs = {str(l.sharding.spec) for l in jax.tree.leaves(r["state"].params)}
    assert any("data" in s for s in specs), specs


def test_resume_uses_checkpointed_lr(tmp_path):
    """Resume LR parity: torch's optim.load_state_dict restores the saved
    param_groups lr (train_diffusion.py:219-220), so load_diffusion_optim
    continues at the checkpoint's halved LR — even when the resume config's
    diffusion_lr / lr_steps changed — instead of recomputing from the config
    (which can jump a converged model back to a hot LR and diverge it)."""
    import pytest
    _mk_images(tmp_path)
    # lr_steps=1 halves the LR every step: lr at step 3 = 1e-4 * 0.5^2.
    cfg = _base_config(tmp_path, lr_steps=1, checkpoint_steps=1000)
    run_training(BASE_SPEC, cfg, max_steps=3)
    ckpt = sorted(glob.glob(
        str(tmp_path / "out" / "checkpoint" / "diffusion_*.pt")))[-1]
    cfg_ckpt = sorted(glob.glob(
        str(tmp_path / "out" / "checkpoint" / "config_*.pt")))[-1]
    saved_lr = torch.load(ckpt, map_location="cpu",
                          weights_only=False)["optimizer"]["param_groups"][0]["lr"]
    assert saved_lr == pytest.approx(1e-4 * 0.25)

    # Resume with a 500x hotter config LR and a different lr_steps: the run
    # must pick up at saved_lr (and halve on the NEW lr_steps boundaries).
    cfg2 = _base_config(tmp_path, model_checkpoint=ckpt,
                        config_checkpoint=cfg_ckpt, load_diffusion_optim=True,
                        diffusion_lr=5e-2, lr_steps=100,
                        checkpoint_steps=1000,
                        out_dir=str(tmp_path / "out2"))
    run_training(BASE_SPEC, cfg2, max_steps=5)
    ckpt2 = sorted(glob.glob(
        str(tmp_path / "out2" / "checkpoint" / "diffusion_*.pt")))[-1]
    lr2 = torch.load(ckpt2, map_location="cpu",
                     weights_only=False)["optimizer"]["param_groups"][0]["lr"]
    # steps 4..5 cross no lr_steps=100 boundary: still exactly saved_lr.
    assert lr2 == pytest.approx(saved_lr)


def test_resume_lr_schedule_boundaries():
    """resume_lr_schedule halves from the restored lr at the NEW lr_steps
    boundaries of the global step count (reference: halve whenever
    global_steps % lr_steps == 0 after restoring param_groups' lr)."""
    import pytest
    from sdm_tpu.train.step import resume_lr_schedule
    s = resume_lr_schedule(2.5e-5, 16000, 10000)
    approx = pytest.approx
    assert float(s(10000)) == approx(2.5e-5)   # first resumed update
    assert float(s(16000)) == approx(2.5e-5)
    assert float(s(16001)) == approx(2.5e-5 * 0.5)
    assert float(s(32001)) == approx(2.5e-5 * 0.25)


def test_device_dataset_fused_training(tmp_path):
    """Fused device-resident mode (config device_dataset + steps_per_call):
    the dataset lives in device memory and K steps run as one lax.scan call.
    Same checkpoint artifacts; deterministic under a fixed seed."""
    _mk_images(tmp_path)
    losses = []
    for run in range(2):
        cfg = _base_config(tmp_path, device_dataset=True, steps_per_call=2,
                           checkpoint_steps=1000, max_epoch=50, seed=7,
                           out_dir=str(tmp_path / f"out_{run}"))
        result = run_training(BASE_SPEC, cfg, max_steps=4)
        assert result["global_steps"] == 4
        assert np.isfinite(result["last_loss"])
        losses.append(result["last_loss"])
    assert losses[0] == losses[1], losses
    ckpts = sorted(glob.glob(
        str(tmp_path / "out_0" / "checkpoint" / "diffusion_*.pt")))
    assert ckpts
    # Reference-format checkpoint: the actual reference loads it strictly.
    loaded = torch.load(ckpts[-1], map_location="cpu", weights_only=False)
    ref_net = REF.U_Net(
        in_channel=3, out_channel=3, num_layers=1, num_resnet_blocks=1,
        attn_layers=[0], num_heads=1, dim_per_head=None, time_dim=8,
        cond_dim=None, min_channel=32, max_channel=32, image_recon=False)
    ref_net.load_state_dict(loaded["model"])


def test_device_dataset_fused_doodle(tmp_path):
    """Fused mode gathers EVERY array field of the sample (image + doodle
    cond_img) from device memory by the same per-step index block."""
    paths = _mk_images(tmp_path)
    db = tmp_path / "doodle.json"
    write_tables(str(db), {
        "Data": [{"filename": p, "doodle": paths[(i + 1) % len(paths)]}
                 for i, p in enumerate(paths)],
        "Labels": [{"labels": ["doodle"]}],
    })
    cfg = _base_config(tmp_path, dataset_path=str(db), in_channel=6,
                       device_dataset=True, steps_per_call=2,
                       checkpoint_steps=1000, max_epoch=50)
    del cfg["flip_imgs"], cfg["use_conditional"]
    result = run_training(DOODLE_SPEC, cfg, max_steps=4)
    assert result["global_steps"] == 4
    assert np.isfinite(result["last_loss"])


def test_device_dataset_rejects_unsupported_modes(tmp_path):
    import pytest
    _mk_images(tmp_path)
    cfg = _base_config(tmp_path, device_dataset=True, grad_accum_steps=2)
    with pytest.raises(ValueError, match="device_dataset"):
        run_training(BASE_SPEC, cfg, max_steps=2)
