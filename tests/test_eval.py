"""Sample-quality evaluation subsystem (sdm_tpu/eval + evaluate_samples CLI).

No reference counterpart to pin against (the reference ships zero quality
metrics — SURVEY.md §6); correctness is pinned by closed-form Gaussian cases
for the Frechet distance, the unbiasedness of the KID estimator, and
determinism/shape contracts of the feature extractors."""

import json
import os

import numpy as np
import pytest
import torch

from sdm_tpu.eval.features import make_feature_extractor
from sdm_tpu.eval.fid import (frechet_distance, frechet_from_features,
                              gaussian_stats, kernel_distance)
from tests.test_train_loop import _mk_images


# ------------------------------------------------------------ frechet math

def test_frechet_identical_is_zero():
    rng = np.random.default_rng(0)
    f = rng.standard_normal((500, 16))
    mu, sigma = gaussian_stats(f)
    assert frechet_distance(mu, sigma, mu, sigma) == pytest.approx(0, abs=1e-8)
    assert frechet_from_features(f, f) == pytest.approx(0, abs=1e-8)


def test_frechet_closed_form_diagonal_gaussians():
    # For diagonal covariances: FD = ||mu1-mu2||^2 + sum_i (s1_i + s2_i
    # - 2 sqrt(s1_i s2_i)).
    mu1 = np.array([0.0, 1.0, -2.0])
    mu2 = np.array([1.0, 1.0, 0.0])
    s1 = np.diag([1.0, 4.0, 0.25])
    s2 = np.diag([2.0, 1.0, 0.25])
    want = (np.sum((mu1 - mu2) ** 2)
            + np.sum(np.diag(s1) + np.diag(s2)
                     - 2 * np.sqrt(np.diag(s1) * np.diag(s2))))
    assert frechet_distance(mu1, s1, mu2, s2) == pytest.approx(want, rel=1e-9)


def test_frechet_nondiagonal_invariant_under_rotation():
    # FD is invariant under a joint orthogonal transform of both Gaussians.
    rng = np.random.default_rng(1)
    a = rng.standard_normal((400, 6))
    b = rng.standard_normal((400, 6)) * 1.5 + 0.3
    q, _ = np.linalg.qr(rng.standard_normal((6, 6)))
    d1 = frechet_from_features(a, b)
    d2 = frechet_from_features(a @ q, b @ q)
    assert d1 == pytest.approx(d2, rel=1e-6)
    assert d1 > 0.1


def test_frechet_grows_with_mean_shift():
    rng = np.random.default_rng(2)
    a = rng.standard_normal((300, 8))
    prev = -1.0
    for shift in (0.0, 0.5, 1.0, 2.0):
        d = frechet_from_features(a, a + shift)
        assert d > prev
        prev = d


def test_gaussian_stats_validation():
    with pytest.raises(ValueError, match=r"\(N, D\)"):
        gaussian_stats(np.zeros((4, 2, 2)))
    with pytest.raises(ValueError, match="at least 2"):
        gaussian_stats(np.zeros((1, 4)))


# ----------------------------------------------------------------- KID math

def test_kid_same_distribution_near_zero_different_far():
    rng = np.random.default_rng(3)
    a = rng.standard_normal((600, 10))
    b = rng.standard_normal((600, 10))
    c = rng.standard_normal((600, 10)) + 1.0
    same, _ = kernel_distance(a, b, block_size=200)
    diff, _ = kernel_distance(a, c, block_size=200)
    assert abs(same) < 0.05       # unbiased estimator straddles 0
    assert diff > 10 * max(abs(same), 1e-3)


def test_kid_handles_unequal_sizes_and_validates():
    rng = np.random.default_rng(4)
    a = rng.standard_normal((100, 5))
    b = rng.standard_normal((50, 5))
    mean, std = kernel_distance(a, b)
    assert np.isfinite(mean) and np.isfinite(std)
    with pytest.raises(ValueError, match="mismatch"):
        kernel_distance(a, rng.standard_normal((50, 6)))


# ------------------------------------------------------------------ features

def _imgs(n=6, hw=16, seed=0):
    rng = np.random.default_rng(seed)
    return rng.uniform(-1, 1, (n, hw, hw, 3)).astype(np.float32)


def test_pixel_features_shape_and_content():
    fn, name = make_feature_extractor("pixel:4")
    assert name == "pixel:4"
    x = _imgs(5, 8)
    f = fn(x)
    assert f.shape == (5, 4 * 4 * 3)
    # pixel:H on an HxH image is the identity flatten.
    fn8, _ = make_feature_extractor("pixel:8")
    np.testing.assert_allclose(fn8(x), x.reshape(5, -1), rtol=1e-6)


def test_randconv_features_deterministic_and_discriminative():
    fn, name = make_feature_extractor("randconv:16", batch_size=4)
    assert name == "randconv:16"
    x = _imgs(6, 16)
    f1, f2 = fn(x), fn(x)
    assert f1.shape == (6, 512)
    np.testing.assert_array_equal(f1, f2)  # fixed seed, fixed batching
    # Batch padding must not leak into features (6 = 4 + padded 2).
    f_whole = make_feature_extractor("randconv:16", batch_size=6)[0](x)
    np.testing.assert_allclose(f1, f_whole, rtol=2e-2, atol=2e-2)
    # Distribution shift must register in the embedding means (FID itself
    # needs n >> D=512 samples for a stable covariance, too slow here).
    mu = lambda arr: fn(arr).mean(axis=0)
    d_null = np.linalg.norm(mu(_imgs(64, 16, 3)) - mu(_imgs(64, 16, 4)))
    d_shift = np.linalg.norm(mu(_imgs(64, 16, 1)) - mu(_imgs(64, 16, 2) * 0.2))
    assert d_shift > 2 * d_null


def test_torch_feature_extractor(tmp_path):
    net = torch.jit.script(torch.nn.Sequential(
        torch.nn.AdaptiveAvgPool2d(4), torch.nn.Flatten()))
    path = str(tmp_path / "feat.pt")
    torch.jit.save(net, path)
    fn, name = make_feature_extractor(f"torch:{path}", batch_size=3)
    x = _imgs(5, 8)
    f = fn(x)
    assert f.shape == (5, 4 * 4 * 3)
    # AdaptiveAvgPool2d(4) on 8x8 == torch area-resize to 4x4 (NCHW order).
    want = make_feature_extractor("pixel:4")[0](x)
    got_nhwc = f.reshape(5, 3, 4, 4).transpose(0, 2, 3, 1).reshape(5, -1)
    np.testing.assert_allclose(got_nhwc, want, rtol=1e-4, atol=1e-5)


def test_feature_spec_validation():
    with pytest.raises(ValueError, match="unknown feature spec"):
        make_feature_extractor("inception")
    with pytest.raises(ValueError, match="needs a path"):
        make_feature_extractor("torch:")


# ----------------------------------------------------------------- CLI

def test_cli_identical_dirs_score_zero(tmp_path, capsys):
    from sdm_tpu.cli.evaluate_samples import evaluate_samples
    _mk_images(tmp_path, n=8, hw=16)
    d = str(tmp_path / "imgs")
    res = evaluate_samples(["--real-path", d, "--gen-path", d,
                            "--features", "pixel:4", "--metrics", "fid"],
                           log=lambda *a, **k: None)
    out = capsys.readouterr().out.strip().splitlines()[-1]
    assert json.loads(out) == res
    assert res["fid"] == pytest.approx(0, abs=1e-6)
    assert res["n_real"] == res["n_generated"] == 8


def test_cli_detects_distribution_shift_and_caches_stats(tmp_path):
    import cv2
    from sdm_tpu.cli.evaluate_samples import evaluate_samples
    _mk_images(tmp_path, n=8, hw=16)
    real = str(tmp_path / "imgs")
    shifted = tmp_path / "shifted"
    shifted.mkdir()
    for i, p in enumerate(sorted(os.listdir(real))):
        img = cv2.imread(os.path.join(real, p))
        cv2.imwrite(str(shifted / f"s_{i}.png"),
                    np.clip(img.astype(np.int32) + 64, 0, 255)
                    .astype(np.uint8))
    stats = str(tmp_path / "real.npz")
    res = evaluate_samples(
        ["--real-path", real, "--gen-path", str(shifted),
         "--features", "pixel:4", "--metrics", "fid",
         "--real-stats", stats], log=lambda *a, **k: None)
    assert res["fid"] > 0.1
    assert os.path.exists(stats)
    # Second run uses the cache (no --real-path needed) and agrees.
    res2 = evaluate_samples(
        ["--gen-path", str(shifted), "--features", "pixel:4",
         "--metrics", "fid", "--real-stats", stats],
        log=lambda *a, **k: None)
    assert res2["fid"] == pytest.approx(res["fid"], rel=1e-9)
    # Cache built with different features must be refused.
    with pytest.raises(ValueError, match="stats cache"):
        evaluate_samples(
            ["--gen-path", str(shifted), "--features", "pixel:8",
             "--metrics", "fid", "--real-stats", stats],
            log=lambda *a, **k: None)


def test_cli_generates_from_bundle(tmp_path):
    from sdm_tpu.cli.evaluate_samples import evaluate_samples
    from tests.test_extensions import _export_bundle_with_ema
    cfg1, _ = _export_bundle_with_ema(tmp_path)
    _mk_images(tmp_path, n=6, hw=16)
    res = evaluate_samples(
        ["--real-path", str(tmp_path / "imgs"),
         "--gen-config", cfg1, "-n", "5", "--gen-batch", "3",
         "--gen-args", "--diff_alg ddim --ddim_step_size 4 -T 10",
         "--features", "pixel:4"],
        log=lambda *a, **k: None)
    assert res["n_generated"] == 5
    assert np.isfinite(res["fid"]) and res["fid"] > 0
    assert np.isfinite(res["kid"])


def test_cli_argument_validation(tmp_path):
    from sdm_tpu.cli.evaluate_samples import evaluate_samples
    _mk_images(tmp_path, n=2, hw=8)
    d = str(tmp_path / "imgs")
    with pytest.raises(SystemExit):  # neither / both gen sources
        evaluate_samples(["--real-path", d], log=lambda *a, **k: None)
    with pytest.raises(SystemExit):
        evaluate_samples(["--real-path", d, "--gen-path", d,
                          "--metrics", "fid,ssim"], log=lambda *a, **k: None)
    with pytest.raises(FileNotFoundError, match="no images match"):
        evaluate_samples(["--real-path", str(tmp_path / "nope"),
                          "--gen-path", d, "--features", "pixel:4"],
                         log=lambda *a, **k: None)
