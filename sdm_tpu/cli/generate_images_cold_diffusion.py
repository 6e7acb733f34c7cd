"""Cold-diffusion image generation from exported bundles.

CLI parity with /root/reference/generate_images_cold_diffusion.py:23-204:
same flags, same bundle format; ensemble chaining RE-DEGRADES the previous
model's x0 to the next model's max_noise with the shared initial noise
(:135-140). Fixes the reference's KeyError for BASE-COLD LINEAR bundles
(missing beta_1/beta_T — see sdm_tpu/io/bundles.py) rather than crashing.
"""

from __future__ import annotations

import argparse
import pathlib
import uuid
from datetime import datetime

import numpy as np


def generate_images_cold_diffusion(raw_args=None, log=print, save_locally=True):
    import jax
    import jax.numpy as jnp

    from sdm_tpu.utils.jax_setup import setup_jax_cache
    setup_jax_cache()

    from sdm_tpu.diffusion.samplers import cold_sample
    from sdm_tpu.io.bundles import load_bundle_config, build_model_from_bundle
    from sdm_tpu.io.plotting import plot_sampled_images

    parser = argparse.ArgumentParser(
        description="Generate Images using Cold Diffusion models.")
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
    parser.add_argument("-n", "--num_images", default=1, type=int,
                        help="Number of images to generate(default=1).")
    parser.add_argument("-d", "--dest_path", type=pathlib.Path,
                        help="File path to save images generated (Default: ./plots).")
    parser.add_argument("--karras", action="store_true",
                        help="Karras rho-7 step spacing (TPU-build "
                             "extension): same number of steps as the "
                             "uniform skip list, concentrated at low noise "
                             "— better few-step quality on cold bundles "
                             "too.")
    parser.add_argument("--cold_step_size", default=10, type=int,
                        help="Number of steps to skip when using cold diffusion.")
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
                             "U-Net activation lives as an H/N slab per chip "
                             "— samples huge images that exceed one chip's "
                             "memory (batch rows shard over the remaining "
                             "devices).")
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

    if args["num_images"] <= 0:
        raise ValueError("Invalid image numbers, should be greater than 0!")
    if args["dest_path"] is None:
        out_dir = "./"
    else:
        if not args["dest_path"].exists():
            raise ValueError("Invalid destination path!")
        out_dir = str(args["dest_path"])
    if args["cold_step_size"] < 0 or args["cold_step_size"] > args["max_T"]:
        raise ValueError("Invalid step size for Cold Diffusion!")

    models_details, folder = load_bundle_config(args["config"])

    from sdm_tpu.parallel.sp import sampling_put_fn
    mesh, dp = sampling_put_fn(args["num_images"], args["num_devices"],
                               args["sp"])

    noise = None
    x0_approx = None
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
            img_c, img_h, img_w = (model_dict["img_C"], model_dict["img_H"],
                                   model_dict["img_W"])
            rng, nk = jax.random.split(rng)
            noise = dp(jax.random.normal(
                nk, (args["num_images"], img_h, img_w, img_c), jnp.float32))
            x_t = 1 * noise
        else:
            # Ensemble chaining: re-degrade previous x0 to this model's
            # max_noise with the shared noise (:135-140).
            x_t = schedule.q_sample(
                x0_approx, jnp.array([model_dict["max_noise"]]), noise)

        if model_dict["cond_dim"] is not None:
            if (args["labels"] is None
                    or len(args["labels"]) != model_dict["cond_dim"]):
                raise ValueError("Invalid/No conditional labels passed!")
            labels = jnp.asarray(np.asarray(args["labels"], np.float32))
        else:
            labels = None

        kst = None
        if args["karras"]:
            from sdm_tpu.cli.generate_images_diffusion import _karras_steps
            kst = _karras_steps(model_dict["min_noise"],
                                model_dict["max_noise"],
                                args["cold_step_size"], schedule)
        # params travel as a jit argument (not a closure) so the compiled
        # program is checkpoint-independent — see sdm_tpu/io/bundles.py.
        x0_approx = jax.jit(lambda p, xt, nz, l: cold_sample(
            model_fn_factory(p), schedule, xt, nz,
            min_noise=model_dict["min_noise"],
            max_noise=model_dict["max_noise"],
            skip_step_size=args["cold_step_size"], steps=kst,
            labels=l))(params, x_t, noise, labels)

    x0_approx = np.asarray(x0_approx)
    if save_locally:
        datetime_now = datetime.now().strftime("%d-%m-%Y %H:%M:%S")
        unique_name = datetime_now + f"({img_h},{img_w})" + "_" + uuid.uuid4().hex
        plot_sampled_images(x0_approx, unique_name, dest_path=out_dir, log=log)
        return None
    return x0_approx


def run(raw_args=None):
    return generate_images_cold_diffusion(raw_args)


if __name__ == "__main__":
    run()
