"""Config wizard prompt flows: drive the click prompts with scripted input
and validate the emitted JSON against the reference's key sets/defaults."""

import json

import click.testing

from sdm_tpu.cli.config_wizards import (
    create_diffusion_config, create_sr_diffusion_config,
    create_doodle_diffusion_config)

BASE_KEYS = {
    "dataset_path", "use_conditional", "cond_dim", "out_dir",
    "checkpoint_steps", "lr_steps", "max_epoch", "plot_img_count",
    "flip_imgs", "model_checkpoint", "load_diffusion_optim",
    "config_checkpoint", "diffusion_lr", "batch_size", "noise_scheduler",
    "beta1", "betaT", "diffusion_alg", "skip_step", "min_noise_step",
    "max_noise_step", "max_actual_noise_step", "in_channel", "out_channel",
    "num_layers", "num_resnet_block", "attn_layers", "attn_heads",
    "attn_dim_per_head", "time_dim", "min_channel", "max_channel",
    "img_recon",
}


def _drive(fn, answers):
    runner = click.testing.CliRunner()
    with runner.isolation(input="".join(a + "\n" for a in answers)):
        fn()


def test_create_diffusion_config_defaults(tmp_path):
    img = tmp_path / "d"
    img.mkdir()
    (img / "a.png").write_bytes(b"x")
    answers = [
        "mymodel", str(tmp_path),          # name, dest
        "n",                                # conditional? no
        str(img / "*.png"),                 # dataset regex
        str(tmp_path / "out"),              # out_dir
        "", "", "", "", "",                # checkpoint/lr/epoch/plot/flip defaults
        "n", "n",                           # no ckpt, no config ckpt
        "", "",                            # lr, batch defaults
        "",                                # scheduler LINEAR
        "", "",                            # beta1, betaT
        "",                                # alg DDPM
        "", "", "",                        # min/max/max_actual
        "", "", "", "",                    # in/out/num_layers/resnet
        "n", "n", "y", "y",                # attention per layer (4 layers)
        "", "",                            # heads, dim_per_head
        "", "", "",                        # time_dim, min/max channel
        "",                                # img_recon default False
        "y",                               # save confirm
    ]
    _drive(create_diffusion_config, answers)
    cfg = json.loads((tmp_path / "mymodel.json").read_text())
    assert set(cfg) == BASE_KEYS
    assert cfg["use_conditional"] is False and cfg["cond_dim"] is None
    assert cfg["diffusion_lr"] == 2e-5 and cfg["batch_size"] == 20
    assert cfg["beta1"] == 5e-3 and cfg["betaT"] == 9e-3
    assert cfg["noise_scheduler"] == "LINEAR" and cfg["diffusion_alg"] == "DDPM"
    assert cfg["attn_layers"] == [2, 3]
    assert cfg["time_dim"] == 512 and cfg["min_channel"] == 128
    assert cfg["max_channel"] == 512 and cfg["img_recon"] is False
    assert cfg["max_noise_step"] == 1000 and cfg["skip_step"] == 100


def test_create_sr_config_keys(tmp_path):
    img = tmp_path / "d"
    img.mkdir()
    (img / "a.png").write_bytes(b"x")
    answers = [
        "srmodel", str(tmp_path),
        "", "",                            # lr_dim 128, sr_dim 256
        "n", str(img / "*.png"),           # unconditional + regex
        str(tmp_path / "out"),
        "", "", "", "", "",               # training defaults
        "n", "n",
        "", "",
        "",                               # LINEAR
        "", "",
        "",                               # skip_step 100
        "", "", "",                       # noise steps
        "",                               # cond_t 250
        "", "", "", "",                   # in/out/layers/resnet
        "n", "n", "y", "y",
        "", "",
        "", "", "",
        "",                               # img_recon default True
        "y",
    ]
    _drive(create_sr_diffusion_config, answers)
    cfg = json.loads((tmp_path / "srmodel.json").read_text())
    assert set(cfg) == (BASE_KEYS - {"diffusion_alg"}) | {"lr_dim", "sr_dim", "cond_t"}
    assert cfg["lr_dim"] == 128 and cfg["sr_dim"] == 256 and cfg["cond_t"] == 250
    assert cfg["in_channel"] == 6 and cfg["img_recon"] is True


def test_create_doodle_config_keys(tmp_path):
    db = tmp_path / "db.json"
    db.write_text("{}")
    answers = [
        "doodle", str(tmp_path),
        str(db),                           # dataset path
        str(tmp_path / "out"),
        "", "", "", "",                   # training defaults (no flip prompt)
        "n", "n",
        "", "",
        "",                               # LINEAR
        "", "",
        "",                               # alg DDPM
        "", "", "",                       # noise steps
        "", "", "", "",                   # model in/out/layers/resnet
        "n", "n", "y", "y",
        "", "",
        "", "", "",
        "y",                              # save confirm (img_recon forced False)
    ]
    _drive(create_doodle_diffusion_config, answers)
    cfg = json.loads((tmp_path / "doodle.json").read_text())
    assert set(cfg) == BASE_KEYS - {"flip_imgs"}
    assert cfg["use_conditional"] is False and cfg["cond_dim"] is None
    assert cfg["in_channel"] == 6 and cfg["img_recon"] is False
