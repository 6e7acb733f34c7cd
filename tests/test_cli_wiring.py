"""All 11 reference entry points exist at the repo root and parse args
(capability surface check: a reference user finds every script)."""

import subprocess
import sys

import pytest

TRAINERS = ["train_diffusion", "train_noise_cold_diffusion",
            "train_doodle_diffusion", "train_SR_diffusion"]
GENERATORS = ["generate_images_diffusion", "generate_images_cold_diffusion",
              "generate_sr_images_diffusion"]
WIZARDS = ["create_diffusion_config", "create_sr_diffusion_config",
           "create_doodle_diffusion_config", "export_models"]


@pytest.mark.parametrize("script", TRAINERS + GENERATORS)
def test_script_help(script):
    out = subprocess.run(
        [sys.executable, f"{script}.py", "--help"],
        capture_output=True, text=True, timeout=300,
        env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu",
             "HOME": "/root", "PYTHONPATH": "/root/repo"})
    assert out.returncode == 0, out.stderr[-500:]
    assert "--config" in out.stdout or "config" in out.stdout


@pytest.mark.parametrize("script", TRAINERS)
def test_trainer_requires_config(script):
    out = subprocess.run(
        [sys.executable, f"{script}.py"],
        capture_output=True, text=True, timeout=300,
        env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu",
             "HOME": "/root", "PYTHONPATH": "/root/repo"})
    assert out.returncode != 0
    assert "required" in out.stderr.lower()


@pytest.mark.parametrize("script", WIZARDS)
def test_wizard_importable(script):
    mod = __import__(f"sdm_tpu.cli.{script}", fromlist=["run"])
    assert callable(mod.run)


def test_trainer_has_steps_flag():
    out = subprocess.run(
        [sys.executable, "train_diffusion.py", "--help"],
        capture_output=True, text=True, timeout=300,
        env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu",
             "HOME": "/root", "PYTHONPATH": "/root/repo"})
    assert out.returncode == 0
    assert "--steps" in out.stdout


def test_console_scripts_resolve():
    # Every [project.scripts] target in pyproject.toml imports and is callable.
    tomllib = pytest.importorskip("tomllib")  # stdlib from 3.11
    with open("pyproject.toml", "rb") as f:
        scripts = tomllib.load(f)["project"]["scripts"]
    # 11 reference-parity entry points + evaluate-samples + serve-diffusion
    # + distill-diffusion.
    assert len(scripts) == 14
    for target in scripts.values():
        mod_name, func_name = target.split(":")
        mod = __import__(mod_name, fromlist=[func_name])
        assert callable(getattr(mod, func_name)), target
