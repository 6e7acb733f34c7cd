"""Super-resolution generation from exported SR bundles (cascaded pipeline).

CLI parity with /root/reference/generate_sr_images_diffusion.py: loads an LR
image (CLI path or numpy array parameter), area-upsamples it to the model's
img_H x img_W (:170-173), builds the conditioning by q_sampling the upsampled
image at the bundle's cond_t with the shared noise (:175-178), runs cold
sampling with that conditioning, and returns/saves `upsampled + delta`
(:237-252). Supports ensemble chaining of the delta model (:179-184).
"""

from __future__ import annotations

import argparse
import os
import pathlib
import uuid
from datetime import datetime

import numpy as np

from sdm_tpu.cli.generate_images_diffusion import (
    SUPPORTED_IMG_FORMATS, _detect_img_format)


def generate_sr_images_diffusion(raw_args=None, log=print, lr_img=None,
                                 save_locally=True):
    import jax
    import jax.numpy as jnp

    from sdm_tpu.utils.jax_setup import setup_jax_cache
    setup_jax_cache()

    from sdm_tpu.diffusion.samplers import cold_sample
    from sdm_tpu.ops.resize import area_resize
    from sdm_tpu.io.bundles import load_bundle_config, build_model_from_bundle
    from sdm_tpu.io.plotting import plot_sampled_images

    parser = argparse.ArgumentParser(
        description="Generate Super-Resolution Images using Diffusion models.")
    parser.add_argument("--device", choices=["cpu", "cuda", "tpu"], type=str,
                        default="tpu",
                        help="Hardware device hint (JAX selects the backend).")
    parser.add_argument("--num-devices", type=int, default=None,
                        help="Data-parallel devices for batched sampling "
                             "(default: largest count dividing the batch).")
    parser.add_argument("-c", "--config", required=True, type=pathlib.Path,
                        help="File path to load config file.")
    parser.add_argument("-s", "--seed", type=int, default=None,
                        help="Seed value for generating image(default: None).")
    parser.add_argument("-T", "--max_T", default=1_000, type=int,
                        help="Max T value for noise scheduling(In cases of Ensemble methods).")
    parser.add_argument("-d", "--dest_path", type=pathlib.Path,
                        help="File path to save images generated (Default: ./plots).")
    parser.add_argument("--cold_step_size", default=10, type=int,
                        help="Number of steps to skip when using cold diffusion.")
    parser.add_argument("--lr_img_path", type=pathlib.Path, default=None,
                        help="File path to low resolution image.")
    parser.add_argument("-l", "--labels", nargs="*", type=float, default=None,
                        help="Conditional Labels.")
    parser.add_argument("--dtype", choices=["float32", "bfloat16"],
                        default="float32",
                        help="Compute dtype for sampling. float32 matches the "
                             "reference's inference numerics; bfloat16 runs "
                             "the trajectory ~2x faster on TPU (params are "
                             "cast too, halving HBM traffic per model call).")
    parser.add_argument("--use-ema", action="store_true",
                        help="Sample from the EMA weights stored in the "
                             "checkpoint (training config \"ema_decay\").")
    parser.add_argument("--sp", type=int, default=1, metavar="N",
                        help="Spatial partitioning (TPU-build extension): "
                             "shard the image H axis over N devices so every "
                             "U-Net activation lives as an H/N slab per chip. "
                             "SR runs at batch 1 — the one case plain data "
                             "parallelism cannot split, and output "
                             "resolutions beyond one chip's memory need "
                             "exactly this.")
    args = vars(parser.parse_args(raw_args))
    if args["device"] == "cpu":
        # Honor the reference's --device cpu; "cuda"/"tpu" mean
        # "the accelerator JAX finds" on this platform.
        jax.config.update("jax_platforms", "cpu")
        if jax.devices()[0].platform != "cpu":  # backend already up
            import warnings
            warnings.warn("--device cpu ignored: JAX backend "
                          "already initialized in this process")

    rng = jax.random.PRNGKey(args["seed"] if args["seed"] is not None
                             else np.random.SeedSequence().entropy % (2**32))

    if args["dest_path"] is None:
        out_dir = "./"
    else:
        if not args["dest_path"].exists():
            raise ValueError("Invalid destination path!")
        out_dir = str(args["dest_path"])
    if args["cold_step_size"] < 0 or args["cold_step_size"] > args["max_T"]:
        raise ValueError("Invalid step size for Cold Diffusion!")

    if lr_img is not None:
        if not type(lr_img).__module__ == np.__name__:
            raise ValueError("Invalid low resolution image passed!")
    else:
        lr_img_path = args["lr_img_path"]
        if (lr_img_path is None or not os.path.isfile(lr_img_path)
                or _detect_img_format(lr_img_path) not in SUPPORTED_IMG_FORMATS):
            raise ValueError(
                "Invalid/No path for low resolution image or unsupported image.")
        import cv2
        lr_img = cv2.imread(str(lr_img_path))

    lr_img = (lr_img.astype(np.float32) - 127.5) / 127.5  # HWC BGR
    lr_img = jnp.asarray(lr_img)
    if lr_img.ndim == 3:                                   # (H,W,C) CLI path
        lr_img = lr_img[None]                              # -> (1,H,W,C)
    # Programmatic callers may pass a BATCH (N,H,W,C) of [0,255] arrays —
    # the cascade evaluator samples whole chunks per compiled trajectory.

    models_details, folder = load_bundle_config(args["config"])

    from sdm_tpu.parallel.sp import sampling_put_fn
    mesh, dp = sampling_put_fn(1, args["num_devices"], args["sp"])

    noise = None
    x0_approx_delta = None
    x0_approx_upsample = None
    x_t_cond_input = None
    img_h = img_w = None
    num_models = len(models_details["models"])
    for model_index, model_dict in enumerate(models_details["models"]):
        log(f"Sampling model {model_index + 1} / {num_models}: "
            f"{model_dict['model_name']} "
            f"[{model_dict['min_noise']}..{model_dict['max_noise']}]")
        compute_dtype = (jnp.bfloat16 if args["dtype"] == "bfloat16" else None)
        model_fn_factory, schedule, _, params = build_model_from_bundle(
            model_dict, folder, max_T=args["max_T"], dtype=compute_dtype,
            cast_params=compute_dtype is not None,
            param_key="ema" if args["use_ema"] else "model",
            # --sp: keep attention 1x-sharded on the XLA path
            # (parallel/sp.py kernel interaction).
            use_pallas=False if args["sp"] > 1 else None)

        if noise is None:
            img_num = lr_img.shape[0]
            img_c, img_h, img_w = (model_dict["img_C"], model_dict["img_H"],
                                   model_dict["img_W"])
            rng, nk = jax.random.split(rng)
            noise = dp(jax.random.normal(
                nk, (img_num, img_h, img_w, img_c), jnp.float32))
            x_t = 1 * noise
            h_lr, w_lr = lr_img.shape[1], lr_img.shape[2]
            if img_h < h_lr or img_w < w_lr:
                raise ValueError(
                    "Invalid shapes for High Resolution and Low Resolution images.")
            x0_approx_upsample = area_resize(lr_img, img_h, img_w)
            x_t_cond_input = schedule.q_sample(
                x0_approx_upsample, jnp.array([model_dict["cond_t"]]), noise)
        else:
            x_t = schedule.q_sample(
                x0_approx_delta, jnp.array([model_dict["max_noise"]]), noise)

        if model_dict["cond_dim"] is not None:
            if (args["labels"] is None
                    or len(args["labels"]) != model_dict["cond_dim"]):
                raise ValueError("Invalid/No conditional labels passed!")
            labels = jnp.asarray(np.asarray(args["labels"], np.float32))
        else:
            labels = None

        # params travel as a jit argument (not a closure) so the compiled
        # program is checkpoint-independent — see sdm_tpu/io/bundles.py.
        x0_approx_delta = jax.jit(lambda p, xt, nz, c, l: cold_sample(
            model_fn_factory(p), schedule, xt, nz,
            min_noise=model_dict["min_noise"],
            max_noise=model_dict["max_noise"],
            skip_step_size=args["cold_step_size"],
            cond_img=c, labels=l))(params, x_t, noise, x_t_cond_input, labels)

    x0_approx = np.asarray(x0_approx_upsample + x0_approx_delta)
    if save_locally:
        datetime_now = datetime.now().strftime("%d-%m-%Y %H:%M:%S")
        unique_name = (datetime_now + "_" + f"({img_h},{img_w})" + "_"
                       + uuid.uuid4().hex)
        plot_sampled_images(x0_approx, unique_name, dest_path=out_dir, log=log)
        return None
    return x0_approx


def run(raw_args=None):
    return generate_sr_images_diffusion(raw_args)


if __name__ == "__main__":
    run()
