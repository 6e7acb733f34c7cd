"""Progressive distillation CLI (TPU-build extension — the reference has no
distillation; its fastest sampler is DDIM skip-stepping,
/root/reference/diffusion_sampling_algorithms.py:66-148).

Takes the SAME training-config JSON as train_diffusion plus a trained
eps-model checkpoint, and halves the student's DDIM grid for `--phases`
rounds (Salimans & Ho 2022 — see sdm_tpu/train/distill.py for the math).
Each phase writes a reference-format checkpoint `distilled_ss{N}_*.pt` that
exports through export_models and samples through
`generate_images_diffusion --diff_alg ddim --ddim_step_size N` unchanged.

Example: a teacher trained at T=1000 sampled well by DDIM-50 (skip 20):
  python distill_diffusion.py -c config.json \
      --teacher-checkpoint out/checkpoint/diffusion_100000.pt \
      --start-step-size 20 --phases 4 --steps-per-phase 4000
yields students at step sizes 40, 80, 160, 320 (25, 13, 7, 4 sampling calls).
"""

from __future__ import annotations

import argparse
import json
import pathlib

import jax


def parse_args(raw_args=None) -> dict:
    parser = argparse.ArgumentParser(
        description="Progressively distill a diffusion model for few-step "
                    "DDIM sampling.")
    parser.add_argument("-c", "--config-path", required=True,
                        type=pathlib.Path,
                        help="File path to load json config file.")
    parser.add_argument("--teacher-checkpoint", required=True, type=str,
                        help="Trained eps-model checkpoint (.pt) to distill.")
    parser.add_argument("--start-step-size", type=int, default=None,
                        help="DDIM step size the teacher samples well at "
                             "(default: the config's skip_step).")
    parser.add_argument("--phases", type=int, default=2,
                        help="Number of grid-halving phases (default 2).")
    parser.add_argument("--steps-per-phase", type=int, default=2000,
                        help="Optimizer steps per phase (default 2000).")
    parser.add_argument("--distill-lr", type=float, default=None,
                        help="Learning rate (default: config diffusion_lr).")
    parser.add_argument("--use-ema-teacher", action="store_true",
                        help="Distill from the checkpoint's EMA weights "
                             "(requires training with config ema_decay).")
    parser.add_argument("--dataset-kind",
                        choices=["auto", "glob", "conditional", "doodle"],
                        default="auto",
                        help="Dataset flavor ('auto' follows the config's "
                             "use_conditional; 'doodle' for doodle-"
                             "conditioned models).")
    parser.add_argument("--device", choices=["cpu", "cuda", "tpu"],
                        type=str, default="tpu",
                        help="Hardware device hint (JAX selects the backend).")
    parser.add_argument("--num-devices", type=int, default=None,
                        help="Devices for the data mesh (default: all).")
    return vars(parser.parse_args(raw_args))


def run(raw_args=None):
    from sdm_tpu.utils.jax_setup import setup_jax_cache
    setup_jax_cache()
    args = parse_args(raw_args)
    if args["device"] == "cpu":
        jax.config.update("jax_platforms", "cpu")
    with open(args["config_path"], "r") as f:
        config_dict = json.loads(f.read())

    import logging

    from sdm_tpu.train.distill import run_distillation
    from sdm_tpu.utils import setup_logging
    setup_logging(config_dict["out_dir"], "Distill-Diffusion")
    return run_distillation(
        config_dict,
        teacher_checkpoint=args["teacher_checkpoint"],
        start_step_size=args["start_step_size"],
        phases=args["phases"],
        steps_per_phase=args["steps_per_phase"],
        distill_lr=args["distill_lr"],
        num_devices=args["num_devices"],
        dataset_kind=args["dataset_kind"],
        use_ema_teacher=args["use_ema_teacher"],
        log=logging.info)


if __name__ == "__main__":
    run()
