"""Tests for the quality-campaign tooling: the procedural shapes/doodle
dataset generator, the batched evaluator's real-feature cache, and the
loss-curve parser. These are the instruments behind QUALITY.md's evidence,
so their own behavior is pinned (SURVEY.md §4 numeric-contract tier)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.make_shapes_dataset import (make_image, make_scene,  # noqa: E402
                                       render_doodle, render_image)
from tools.loss_curve import bucketize, parse_log, plateau_stats  # noqa: E402


# ---------------------------------------------------------------------------
# make_shapes_dataset

def test_scene_rendering_is_deterministic():
    scene = make_scene(np.random.default_rng(3))
    a = render_image(scene, 64)
    b = render_image(scene, 64)
    np.testing.assert_array_equal(a, b)


def test_scene_renders_aligned_across_sizes():
    """The SR-cascade HR/LR contract: the same scene rendered at 128 and
    area-downsampled to 64 must match the direct 64 render closely (both
    are area-reductions of the same continuous scene)."""
    import cv2
    scene = make_scene(np.random.default_rng(11))
    lo = render_image(scene, 64).astype(np.float32)
    hi = render_image(scene, 128)
    hi_down = cv2.resize(hi, (64, 64),
                         interpolation=cv2.INTER_AREA).astype(np.float32)
    # Not bit-equal (different supersampling grids) but must agree to a few
    # gray levels on average — misaligned layouts would differ by ~50+.
    assert np.abs(lo - hi_down).mean() < 6.0


def test_doodle_is_outline_on_white():
    scene = make_scene(np.random.default_rng(5))
    d = render_doodle(scene, 64)
    assert d.shape == (64, 64, 3)
    # Mostly white background, some black strokes.
    frac_white = (d > 240).all(axis=-1).mean()
    frac_dark = (d < 100).all(axis=-1).mean()
    assert frac_white > 0.5
    assert frac_dark > 0.005


def test_make_image_backcompat_matches_scene_pipeline():
    """make_image(rng) must equal make_scene(rng)+render_image — round-4
    callers (and the committed 64² campaign dataset) depend on the RNG
    draw order being unchanged."""
    img_a = make_image(np.random.default_rng(42), 64)
    img_b = render_image(make_scene(np.random.default_rng(42)), 64)
    np.testing.assert_array_equal(img_a, img_b)


def test_doodle_db_roundtrips_through_doodle_dataset(tmp_path):
    out = tmp_path / "imgs"
    doodles = tmp_path / "doodles"
    db = tmp_path / "db.json"
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools/make_shapes_dataset.py"),
         "--out", str(out), "--doodle-out", str(doodles), "--db", str(db),
         "--n", "6", "--size", "32", "--seed", "1"],
        check=True, capture_output=True)
    from sdm_tpu.data.datasets import DoodleImgDataset
    ds = DoodleImgDataset(dataset_path=str(db), seed=0)
    assert len(ds) == 6
    assert ds.get_labels() == ["doodle"]
    row = ds[0]
    assert row["image"].shape == (32, 32, 3)
    assert row["cond_img"].shape == (32, 32, 3)
    # Doodle conditioning is near-white outside strokes ([-1,1] space).
    assert row["cond_img"].mean() > 0.5


# ---------------------------------------------------------------------------
# evaluate_samples real_cache (tools/eval_batch.py contract)

def _write_imgs(d, n, seed, size=16):
    import cv2
    rng = np.random.default_rng(seed)
    os.makedirs(d, exist_ok=True)
    for i in range(n):
        cv2.imwrite(os.path.join(d, f"i_{i}.png"),
                    rng.integers(0, 256, (size, size, 3), dtype=np.uint8))


def test_real_cache_reused_across_calls(tmp_path):
    from sdm_tpu.cli.evaluate_samples import evaluate_samples
    real = str(tmp_path / "real")
    gen = str(tmp_path / "gen")
    _write_imgs(real, 8, 0)
    _write_imgs(gen, 8, 1)
    cache = {}
    logs = []
    args = ["--real-path", real, "--gen-path", gen,
            "--features", "pixel:4", "--metrics", "fid,kid",
            "--image-size", "16"]
    r1 = evaluate_samples(args, log=logs.append, real_cache=cache)
    assert len(cache) == 1
    feats_id = id(next(iter(cache.values()))[0])
    r2 = evaluate_samples(args, log=logs.append, real_cache=cache)
    # Second call hit the cache (same object, logged as cached) and
    # produced identical metrics.
    assert id(next(iter(cache.values()))[0]) == feats_id
    assert any("in-process cached" in l for l in logs)
    assert r1["fid"] == r2["fid"]
    assert r1["kid"] == r2["kid"]


def test_real_cache_keyed_on_feature_spec(tmp_path):
    from sdm_tpu.cli.evaluate_samples import evaluate_samples
    real = str(tmp_path / "real")
    gen = str(tmp_path / "gen")
    _write_imgs(real, 6, 0)
    _write_imgs(gen, 6, 1)
    cache = {}
    base = ["--real-path", real, "--gen-path", gen, "--metrics", "fid",
            "--image-size", "16"]
    evaluate_samples(base + ["--features", "pixel:4"], log=lambda *a: None,
                     real_cache=cache)
    evaluate_samples(base + ["--features", "pixel:8"], log=lambda *a: None,
                     real_cache=cache)
    assert len(cache) == 2  # different feature specs never share stats


# ---------------------------------------------------------------------------
# loss_curve

def test_loss_curve_parse_resume_dedup(tmp_path):
    log = tmp_path / "train_x.log"
    lines = ["junk line\n"]
    # Original run: steps 1..6, loss 1.0; resume replays 5..8 with 0.5.
    for s in range(1, 7):
        lines.append(f"Cum. Steps: {s:,} | Steps: 1 / 2 | "
                     f"Diffusion: 1.00000 | LR: 0.0001\n")
    for s in range(5, 9):
        lines.append(f"Cum. Steps: {s:,} | Steps: 1 / 2 | "
                     f"Diffusion: 0.50000 | LR: 0.0001\n")
    log.write_text("".join(lines))
    curve = parse_log(str(log))
    assert len(curve) == 8
    assert curve[4] == 1.0 and curve[5] == 0.5  # last occurrence wins

    steps, losses = bucketize(curve, 4)
    assert steps == [4, 8]
    np.testing.assert_allclose(losses[0], 1.0)
    np.testing.assert_allclose(losses[1], 0.5)


def test_plateau_stats_flat_vs_falling():
    flat = plateau_stats([1.0] * 20)
    assert abs(flat["drop_pct"]) < 1e-9
    falling = plateau_stats(list(np.linspace(1.0, 0.1, 20)))
    assert falling["drop_pct"] > 5.0


# ---------------------------------------------------------------------------
# render_quality claims table

def _summary(**fids):
    return {"steps": 1, "variants": {k: {"fid": v} for k, v in fids.items()}}


def test_claims_backed_and_not_backed_from_numbers():
    """Verdicts are computed, not asserted: a dpmpp-10 row worse than 25%
    excess over ddim-50 renders 'not backed'; EMA better than raw renders
    'backed'; both carry the measured numbers inline."""
    from tools.render_quality import _claims
    txt = _claims(_summary(
        real_vs_real=1.0, eps_ddim50=2.0, eps_dpmpp10=3.0,
        eps_ddim50_noema=2.5))
    dpmpp_row = [l for l in txt.splitlines() if "dpmpp steps" in l][0]
    assert "**not backed**" in dpmpp_row
    assert "3.00" in dpmpp_row and "2.00" in dpmpp_row
    ema_row = [l for l in txt.splitlines() if "EMA improves" in l][0]
    assert "**backed**" in ema_row

    # Flip dpmpp within the 25% excess margin: backed.
    txt2 = _claims(_summary(real_vs_real=1.0, eps_ddim50=2.0,
                            eps_dpmpp10=2.2))
    assert "**backed**" in [l for l in txt2.splitlines()
                            if "dpmpp steps" in l][0]


def test_claims_pending_rows_never_guess():
    from tools.render_quality import _claims
    txt = _claims(_summary(real_vs_real=1.0))
    for line in txt.splitlines()[2:]:
        assert "pending (missing rows:" in line


def test_claims_sr_uses_hr_floor_and_ordering():
    from tools.render_quality import _claims
    txt = _claims(_summary(sr_hr_floor=1.5, sr_cascade=2.0,
                           sr_upsample_baseline=4.0))
    sr_row = [l for l in txt.splitlines() if "SR cascade" in l][0]
    assert "**backed**" in sr_row and "1.50" in sr_row


def test_family_demos_tool_runs_on_tiny_bundles(tmp_path, monkeypatch):
    """tools/family_demos.py end-to-end on tiny cold/doodle bundles: both
    demo grids render. Pins the jit-argument param contract (closing over
    real-size params would overflow remote-compile requests) and the
    bundle-T generalization."""
    import cv2
    import torch

    from sdm_tpu.cli.export_models import export_bundle
    from tests.test_generation import _train_cfg, REF

    wd = tmp_path
    (wd / "shapes").mkdir()
    rng = np.random.default_rng(0)
    for i in range(4):
        cv2.imwrite(str(wd / "shapes" / f"s_{i}.jpg"),
                    rng.integers(0, 256, (16, 16, 3), dtype=np.uint8))

    def save(name, in_ch, img_recon):
        torch.manual_seed(0)
        net = REF.U_Net(in_channel=in_ch, out_channel=3, num_layers=2,
                        num_resnet_blocks=1, attn_layers=[1], num_heads=1,
                        dim_per_head=None, time_dim=16, cond_dim=None,
                        min_channel=32, max_channel=64,
                        image_recon=img_recon)
        p = str(wd / f"{name}.pt")
        sd = net.state_dict()
        torch.save({"model": sd, "ema": sd}, p)
        return p

    exports = str(wd / "exports")
    export_bundle("cold", exports, img_c=3, img_h=16, img_w=16,
                  model_type="BASE-COLD",
                  entries=[(_train_cfg(1, 10, img_recon=True),
                            save("cold", 3, True))])
    export_bundle("doodle", exports, img_c=3, img_h=16, img_w=16,
                  model_type="BASE",
                  entries=[(_train_cfg(1, 10, in_channel=6),
                            save("doodle", 6, False))])

    import tools.family_demos as fd
    monkeypatch.setattr(sys, "argv",
                        ["family_demos", "--workdir", str(wd),
                         "--rows", "2"])
    fd.main()
    grids = wd / "results" / "grids"
    assert (grids / "cold_recon.jpg").exists()
    assert (grids / "doodle_steering.jpg").exists()
