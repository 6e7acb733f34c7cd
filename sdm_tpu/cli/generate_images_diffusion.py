"""Image generation from exported bundles — DDPM/DDIM, ensemble chaining.

CLI parity with /root/reference/generate_images_diffusion.py:35-273: same
flags (--device/-c/-s/-n/-d/--diff_alg/--ddim_step_size/-T/--cond_img_path/
-l), same bundle config.json, optional conditional image (channel-concat),
ensemble chaining of range-specialized models by passing x_t through the
chain. Each model's whole reverse trajectory runs as one jitted scan on
device; images return as NHWC BGR float in [-1,1] (save path identical to
the reference's grid naming scheme).
"""

from __future__ import annotations

import argparse
import os
import pathlib
import uuid
from datetime import datetime

import numpy as np

SUPPORTED_IMG_FORMATS = ["jpeg", "jpg", "png"]


def _detect_img_format(path) -> str:
    # stdlib imghdr was removed in py3.13; sniff the magic bytes directly
    # (parity with the reference's imghdr.what check,
    # generate_images_diffusion.py:127-136).
    with open(path, "rb") as f:
        head = f.read(12)
    if head.startswith(b"\xff\xd8\xff"):
        return "jpeg"
    if head.startswith(b"\x89PNG\r\n\x1a\n"):
        return "png"
    return "unknown"


def _karras_steps(min_noise: int, max_noise_eff: int, step_size: int,
                  schedule):
    """Karras rho-7 step list with the same step count as the uniform skip
    list. Callers must pass the EFFECTIVE max noise (img2img's
    --init_noise_step lowers the first model's start), so sequential and
    pipeline paths can never diverge on the spacing range."""
    from sdm_tpu.diffusion.samplers import karras_steps_matching
    return karras_steps_matching(min_noise, max_noise_eff, step_size,
                                 schedule)


def generate_images_diffusion(raw_args=None, log=print, cond_img=None,
                              save_locally=True):
    import jax
    import jax.numpy as jnp

    from sdm_tpu.utils.jax_setup import setup_jax_cache
    setup_jax_cache()

    from sdm_tpu.enums import DiffusionAlg
    from sdm_tpu.diffusion.samplers import ddpm_sample, ddim_sample
    from sdm_tpu.io.bundles import load_bundle_config, build_model_from_bundle
    from sdm_tpu.io.plotting import plot_sampled_images

    parser = argparse.ArgumentParser(
        description="Generate Images using Diffusion models.")
    parser.add_argument("--device", choices=["cpu", "cuda", "tpu"], type=str,
                        default="tpu",
                        help="Hardware device hint (JAX selects the backend).")
    parser.add_argument("--num-devices", type=int, default=None,
                        help="Data-parallel devices for batched sampling "
                             "(default: largest count dividing the batch).")
    parser.add_argument("-c", "--config", required=True, type=pathlib.Path,
                        help="File path to config file.")
    parser.add_argument("-s", "--seed", type=int, default=None,
                        help="Seed value for generating image(default: None).")
    parser.add_argument("-n", "--num_images", default=1, type=int,
                        help="Number of images to generate(default=1).")
    parser.add_argument("-d", "--dest_path", type=pathlib.Path,
                        help="File path to save images generated (Default: ./plots).")
    parser.add_argument("--diff_alg", default="ddpm",
                        choices=[a.name.lower() for a in DiffusionAlg]
                        + ["dpmpp", "heun"],
                        help="Diffusion Sampling Algorithm to use (default: "
                             "ddpm). dpmpp = DPM-Solver++(2M), a 2nd-order "
                             "ODE solver (TPU-build extension): same models "
                             "and bundles, an order less discretization "
                             "error per step than ddim — ~10 steps reach "
                             "ddim-50 quality, ~5x sampling throughput. "
                             "heun = Karras et al. 2022 predictor-corrector "
                             "(2nd-order, two model calls per step, no "
                             "multistep history — robust on short or "
                             "--karras-spaced step lists).")
    parser.add_argument("--ddim_step_size", default=10, type=int,
                        help="Number of steps to skip when using "
                             "ddim/dpmpp/heun.")
    parser.add_argument("--karras", action="store_true",
                        help="Karras rho-7 step spacing (TPU-build "
                             "extension) for ddim/dpmpp/heun: same number "
                             "of steps as the uniform skip list, "
                             "concentrated at low noise where trajectory "
                             "curvature lives — better quality at few "
                             "steps.")
    parser.add_argument("-T", "--max_T", default=1_000, type=int,
                        help="Max T value for noise scheduling (In cases of Ensemble methods).")
    parser.add_argument("--cond_img_path", type=pathlib.Path, default=None,
                        help="File path to conditional image e.g Doodle image.")
    parser.add_argument("--init_img_path", type=pathlib.Path, default=None,
                        help="img2img (SDEdit-style, TPU-build extension): "
                             "start the reverse chain from this image "
                             "q_sampled to --init_noise_step instead of "
                             "pure noise. Must match the model resolution.")
    parser.add_argument("--init_noise_step", type=int, default=None,
                        help="Noise level for --init_img_path (the first "
                             "model samples from this step down; higher = "
                             "freer reinterpretation, lower = more faithful "
                             "to the init image). Required with "
                             "--init_img_path.")
    parser.add_argument("--inpaint_img_path", type=pathlib.Path, default=None,
                        help="Inpainting (TPU-build extension, "
                             "ddim/dpmpp/heun): keep this image's pixels "
                             "where the mask is white and synthesize the "
                             "rest, conditioned on the kept context at "
                             "every step.")
    parser.add_argument("--inpaint_mask_path", type=pathlib.Path,
                        default=None,
                        help="Mask for --inpaint_img_path: pixels >= 128 "
                             "are KEPT from the image, < 128 are generated. "
                             "Required with --inpaint_img_path.")
    parser.add_argument("-l", "--labels", nargs="*", type=float, default=None,
                        help="Conditional Labels.")
    parser.add_argument("--dtype", choices=["float32", "bfloat16"],
                        default="float32",
                        help="Compute dtype for sampling. float32 matches the "
                             "reference's inference numerics; bfloat16 runs "
                             "the trajectory ~2x faster on TPU (params are "
                             "cast too, halving HBM traffic per model call).")
    parser.add_argument("--guidance-scale", type=float, default=1.0,
                        help="Classifier-free guidance scale for label-"
                             "conditional models (1.0 = off, the reference's "
                             "plain conditional sampling; >1 sharpens "
                             "conditional structure by extrapolating away "
                             "from the zero-label branch — train with "
                             "cfg_drop_prob > 0 for best results).")
    parser.add_argument("--use-ema", action="store_true",
                        help="Sample from the EMA weights stored in the "
                             "checkpoint (training config \"ema_decay\").")
    parser.add_argument("--sp", type=int, default=1, metavar="N",
                        help="Spatial partitioning (TPU-build extension): "
                             "shard the image H axis over N devices so every "
                             "U-Net activation lives as an H/N slab per chip "
                             "— samples huge images that exceed one chip's "
                             "memory (batch rows shard over the remaining "
                             "devices). Composable with --num-devices "
                             "(which must then be a multiple of N).")
    parser.add_argument("--pipeline", type=int, default=None, metavar="M",
                        help="Pipeline-parallel ensemble sampling: place "
                             "each bundle model on its own device and stream "
                             "M microbatches through the chain (throughput "
                             "~ slowest stage instead of sum of stages). "
                             "Needs a multi-model bundle and >1 device; "
                             "num_images must divide by M. Mutually "
                             "exclusive with --num-devices data parallelism.")
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
            raise ValueError(
                "Invalid destination path, kindly correct and ensure it exists!")
        out_dir = str(args["dest_path"])

    if args["diff_alg"] in (DiffusionAlg.DDIM.name.lower(), "dpmpp", "heun"):
        if args["ddim_step_size"] < 0 or args["ddim_step_size"] > args["max_T"]:
            raise ValueError("Invalid step size for DDIM!")
    elif args["karras"]:
        raise ValueError("--karras applies to --diff_alg ddim/dpmpp/heun")

    cond_img_path = args["cond_img_path"]
    if cond_img_path is not None:
        import cv2
        if not os.path.isfile(cond_img_path):
            raise FileNotFoundError(
                "Invalid path for conditional image, kindly correct and try again!")
        if _detect_img_format(cond_img_path) not in SUPPORTED_IMG_FORMATS:
            raise ValueError("Image format is not supported!")
        cond_img = cv2.imread(str(cond_img_path))

    if cond_img is not None:
        if not isinstance(cond_img, np.ndarray):
            raise ValueError("Unsupported conditional image.")
        cond_img = (cond_img.astype(np.float32) - 127.5) / 127.5  # HWC BGR
        cond_img = jnp.asarray(
            np.repeat(cond_img[None], args["num_images"], axis=0))

    models_details, folder = load_bundle_config(args["config"])

    if args["pipeline"]:
        if args["init_img_path"] is not None:
            raise ValueError("--pipeline does not support --init_img_path")
        if args["inpaint_img_path"] is not None:
            raise ValueError("--pipeline does not support inpainting")
        if args["num_devices"] and args["num_devices"] > 1:
            raise ValueError("--pipeline and --num-devices data parallelism "
                             "are mutually exclusive")
        if args["sp"] > 1:
            raise ValueError("--pipeline and --sp spatial partitioning "
                             "are mutually exclusive")
        if len(models_details["models"]) < 2:
            raise ValueError("--pipeline needs a multi-model (ensemble) "
                             "bundle; single-model bundles gain nothing")
        return _pipeline_generate(args, models_details, folder, rng,
                                  cond_img, out_dir, log, save_locally)

    from sdm_tpu.parallel.sp import sampling_put_fn
    mesh, dp = sampling_put_fn(args["num_images"], args["num_devices"],
                               args["sp"])

    # img2img (SDEdit-style): validate + load the init image up front.
    init_img = None
    if (args["init_img_path"] is None) != (args["init_noise_step"] is None):
        raise ValueError(
            "--init_img_path and --init_noise_step go together")
    if args["init_img_path"] is not None:
        import cv2
        if not os.path.isfile(args["init_img_path"]):
            raise FileNotFoundError(
                "Invalid path for init image, kindly correct and try again!")
        if _detect_img_format(args["init_img_path"]) not in SUPPORTED_IMG_FORMATS:
            raise ValueError("Image format is not supported!")
        init_img = (cv2.imread(str(args["init_img_path"]))
                    .astype(np.float32) - 127.5) / 127.5  # HWC BGR

    # Inpainting: known image + keep-mask, ddim-only (the projection rides
    # the deterministic trajectory).
    inpaint_img = inpaint_mask = None
    if (args["inpaint_img_path"] is None) != (args["inpaint_mask_path"] is None):
        raise ValueError(
            "--inpaint_img_path and --inpaint_mask_path go together")
    if args["inpaint_img_path"] is not None:
        import cv2
        if args["diff_alg"].lower() not in ("ddim", "dpmpp", "heun"):
            raise ValueError("inpainting is supported with --diff_alg "
                             "ddim/dpmpp/heun")
        if args["init_img_path"] is not None:
            raise ValueError("--inpaint_img_path and --init_img_path are "
                             "mutually exclusive")
        for p in (args["inpaint_img_path"], args["inpaint_mask_path"]):
            if not os.path.isfile(p):
                raise FileNotFoundError(
                    f"Invalid path {p}, kindly correct and try again!")
            if _detect_img_format(p) not in SUPPORTED_IMG_FORMATS:
                raise ValueError("Image format is not supported!")
        inpaint_img = (cv2.imread(str(args["inpaint_img_path"]))
                       .astype(np.float32) - 127.5) / 127.5  # HWC BGR
        m = cv2.imread(str(args["inpaint_mask_path"]), cv2.IMREAD_GRAYSCALE)
        inpaint_mask = (m >= 128).astype(np.float32)[..., None]  # (H,W,1)
        if inpaint_mask.shape[:2] != inpaint_img.shape[:2]:
            raise ValueError(
                f"mask {inpaint_mask.shape[:2]} must match the inpaint "
                f"image {inpaint_img.shape[:2]}")

    noise = None
    x_t = None
    img_h = img_w = None
    num_models = len(models_details["models"])
    for model_index, model_dict in enumerate(models_details["models"]):
        log(f"Sampling model {model_index + 1} / {num_models}: "
            f"{model_dict['model_name']} "
            f"[{model_dict['min_noise']}..{model_dict['max_noise']}]")
        if noise is None:
            img_c, img_h, img_w = (model_dict["img_C"], model_dict["img_H"],
                                   model_dict["img_W"])
            rng, nk = jax.random.split(rng)
            noise = dp(jax.random.normal(
                nk, (args["num_images"], img_h, img_w, img_c), jnp.float32))
            x_t = 1 * noise

        if model_dict["cond_dim"] is not None:
            if (args["labels"] is None
                    or len(args["labels"]) != model_dict["cond_dim"]):
                raise ValueError("Invalid / No conditional labels passed!")
            labels = jnp.asarray(np.asarray(args["labels"], np.float32))
        else:
            labels = None

        compute_dtype = (jnp.bfloat16 if args["dtype"] == "bfloat16" else None)
        raw_factory, schedule, _, params = build_model_from_bundle(
            model_dict, folder, max_T=args["max_T"], dtype=compute_dtype,
            cast_params=compute_dtype is not None,
            param_key="ema" if args["use_ema"] else "model",
            # --sp: keep attention 1x-sharded on the XLA path
            # (parallel/sp.py kernel interaction).
            use_pallas=False if args["sp"] > 1 else None)

        # img2img: replace the pure-noise start with the init image
        # q_sampled to init_noise_step (the reference's own ensemble-preview
        # semantics, train_diffusion.py:403-409, exposed at generation
        # time); the first model then samples from that step down.
        max_noise_eff = model_dict["max_noise"]
        if model_index == 0 and init_img is not None:
            t0 = int(args["init_noise_step"])
            if not (model_dict["min_noise"] < t0 <= model_dict["max_noise"]):
                raise ValueError(
                    f"--init_noise_step {t0} must lie in "
                    f"({model_dict['min_noise']}, {model_dict['max_noise']}]")
            if init_img.shape[:2] != (img_h, img_w):
                raise ValueError(
                    f"init image {init_img.shape[:2]} must match the model "
                    f"resolution ({img_h}, {img_w})")
            init_b = jnp.asarray(
                np.repeat(init_img[None], args["num_images"], axis=0))
            x_t = schedule.q_sample(dp(init_b), jnp.array([t0]), noise)
            max_noise_eff = t0

        ink = {}
        if inpaint_img is not None:
            if model_index == 0:
                if inpaint_img.shape[:2] != (img_h, img_w):
                    raise ValueError(
                        f"inpaint image {inpaint_img.shape[:2]} must match "
                        f"the model resolution ({img_h}, {img_w})")
                known_b = dp(jnp.asarray(
                    np.repeat(inpaint_img[None], args["num_images"],
                              axis=0)))
                mask_b = jnp.asarray(inpaint_mask)
                # Start the known region on its forward marginal.
                x_t = ((1.0 - mask_b) * x_t + mask_b * schedule.q_sample(
                    known_b, jnp.array([max_noise_eff]), noise))
            ink = dict(inpaint_known=known_b, inpaint_mask=mask_b,
                       inpaint_noise=noise)

        gs = args["guidance_scale"]
        if gs != 1.0 and labels is None:
            raise ValueError("--guidance-scale needs a label-conditional "
                             "model and -l labels")
        if gs != 1.0:
            from sdm_tpu.diffusion.guidance import cfg_model_fn
            model_fn_factory = lambda p: cfg_model_fn(raw_factory(p), gs)
        else:
            model_fn_factory = raw_factory

        # params travel as a jit argument (not a closure) so the compiled
        # program is checkpoint-independent — see sdm_tpu/io/bundles.py.
        kst = None
        if args["karras"]:
            kst = _karras_steps(model_dict["min_noise"], max_noise_eff,
                                args["ddim_step_size"], schedule)
        if args["diff_alg"].lower() == DiffusionAlg.DDPM.name.lower():
            rng, sk = jax.random.split(rng)
            x_t = jax.jit(lambda p, xt, k, l, c: ddpm_sample(
                model_fn_factory(p), schedule, xt, rng=k,
                min_noise=model_dict["min_noise"],
                max_noise=max_noise_eff,
                cond_img=c, labels=l))(params, x_t, sk, labels, dp(cond_img))
        elif args["diff_alg"].lower() == DiffusionAlg.DDIM.name.lower():
            x_t = jax.jit(lambda p, xt, l, c: ddim_sample(
                model_fn_factory(p), schedule, xt,
                min_noise=model_dict["min_noise"],
                max_noise=max_noise_eff,
                ddim_step_size=args["ddim_step_size"], steps=kst,
                cond_img=c, labels=l, **ink))(params, x_t, labels,
                                              dp(cond_img))
        elif args["diff_alg"].lower() in ("dpmpp", "heun"):
            from sdm_tpu.diffusion.samplers import dpmpp_sample, heun_sample
            sf = dpmpp_sample if args["diff_alg"].lower() == "dpmpp" \
                else heun_sample
            x_t = jax.jit(lambda p, xt, l, c: sf(
                model_fn_factory(p), schedule, xt,
                min_noise=model_dict["min_noise"],
                max_noise=max_noise_eff,
                step_size=args["ddim_step_size"], steps=kst,
                cond_img=c, labels=l, **ink))(params, x_t, labels,
                                              dp(cond_img))
        else:
            raise ValueError("Invalid Diffusion Algorithm type.")

    return _finish(x_t, img_h, img_w, out_dir, log, save_locally)


def _finish(x_t, img_h, img_w, out_dir, log, save_locally):
    from sdm_tpu.io.plotting import plot_sampled_images
    x_t = np.asarray(x_t)
    if save_locally:
        datetime_now = datetime.now().strftime("%d-%m-%Y %H:%M:%S")
        unique_name = (datetime_now + "_" + f"({img_h},{img_w})" + "_"
                       + uuid.uuid4().hex)
        plot_sampled_images(x_t, unique_name, dest_path=out_dir, log=log)
        return None
    return x_t


def _pipeline_generate(args, models_details, folder, rng, cond_img, out_dir,
                       log, save_locally):
    """Pipeline-parallel ensemble sampling: stage k (bundle model k) lives on
    device k mod n_devices; --pipeline M microbatches stream through the
    chain (sdm_tpu/parallel/pipeline.py). DDIM output is bit-identical to
    the sequential path for the same seed — the initial noise draw and RNG
    split order are mirrored exactly."""
    import jax
    import jax.numpy as jnp

    from sdm_tpu.enums import DiffusionAlg
    from sdm_tpu.diffusion.samplers import ddpm_sample, ddim_sample
    from sdm_tpu.io.bundles import build_model_from_bundle
    from sdm_tpu.parallel.pipeline import pipeline_chain

    models = models_details["models"]
    devices = jax.devices()
    n_imgs = args["num_images"]
    n_micro = args["pipeline"]
    alg = args["diff_alg"].lower()
    ddim = alg in (DiffusionAlg.DDIM.name.lower(), "dpmpp", "heun")
    if not ddim and alg != DiffusionAlg.DDPM.name.lower():
        raise ValueError("Invalid Diffusion Algorithm type.")
    compute_dtype = (jnp.bfloat16 if args["dtype"] == "bfloat16" else None)

    md0 = models[0]
    img_c, img_h, img_w = md0["img_C"], md0["img_H"], md0["img_W"]
    rng, nk = jax.random.split(rng)
    x_t = jax.random.normal(nk, (n_imgs, img_h, img_w, img_c), jnp.float32)
    if n_imgs % n_micro != 0:
        raise ValueError(f"--pipeline {n_micro} must divide -n {n_imgs}")
    size = n_imgs // n_micro

    stage_fns, stage_devs = [], []
    for i, model_dict in enumerate(models):
        dev = devices[i % len(devices)]
        log(f"Pipeline stage {i + 1}/{len(models)} on {dev}: "
            f"{model_dict['model_name']} "
            f"[{model_dict['min_noise']}..{model_dict['max_noise']}]")
        if model_dict["cond_dim"] is not None:
            if (args["labels"] is None
                    or len(args["labels"]) != model_dict["cond_dim"]):
                raise ValueError("Invalid / No conditional labels passed!")
            labels = jax.device_put(
                jnp.asarray(np.asarray(args["labels"], np.float32)), dev)
        else:
            labels = None
        model_fn_factory, schedule, _, params = build_model_from_bundle(
            model_dict, folder, max_T=args["max_T"], dtype=compute_dtype,
            cast_params=compute_dtype is not None,
            param_key="ema" if args["use_ema"] else "model")
        gs = args["guidance_scale"]
        if gs != 1.0:
            if labels is None:
                raise ValueError("--guidance-scale needs a label-conditional "
                                 "model and -l labels")
            from sdm_tpu.diffusion.guidance import cfg_model_fn
            model_fn_factory = (lambda p, f=model_fn_factory:
                                cfg_model_fn(f(p), gs))
        params = jax.device_put(params, dev)  # committed: jit runs on dev
        if cond_img is not None:
            cond_chunks = [jax.device_put(cond_img[m * size:(m + 1) * size],
                                          dev) for m in range(n_micro)]
        else:
            cond_chunks = None

        if ddim:
            if alg in ("dpmpp", "heun"):
                from sdm_tpu.diffusion.samplers import (dpmpp_sample,
                                                        heun_sample)
                kw = {"step_size": args["ddim_step_size"]}
                sample_fn = dpmpp_sample if alg == "dpmpp" else heun_sample
            else:
                kw = {"ddim_step_size": args["ddim_step_size"]}
                sample_fn = ddim_sample
            if args["karras"]:
                # max_noise IS the effective max here: --pipeline rejects
                # --init_img_path (the only thing that lowers it).
                kw = dict(kw, steps=_karras_steps(
                    model_dict["min_noise"], model_dict["max_noise"],
                    args["ddim_step_size"], schedule))
            jf = jax.jit(lambda p, xt, l, c, md=model_dict, sch=schedule,
                         f=model_fn_factory, sf=sample_fn, kw=kw: sf(
                             f(p), sch, xt, min_noise=md["min_noise"],
                             max_noise=md["max_noise"],
                             cond_img=c, labels=l, **kw))

            def stage(xm, m, jf=jf, params=params, labels=labels,
                      cc=cond_chunks):
                return jf(params, xm, labels, cc[m] if cc else None)
        else:
            rng, sk = jax.random.split(rng)
            jf = jax.jit(lambda p, xt, k, l, c, md=model_dict, sch=schedule,
                         f=model_fn_factory: ddpm_sample(
                             f(p), sch, xt, rng=k,
                             min_noise=md["min_noise"],
                             max_noise=md["max_noise"],
                             cond_img=c, labels=l))

            def stage(xm, m, jf=jf, params=params, labels=labels,
                      cc=cond_chunks, sk=sk):
                return jf(params, xm, jax.random.fold_in(sk, m), labels,
                          cc[m] if cc else None)
        stage_fns.append(stage)
        stage_devs.append(dev)

    x_t = pipeline_chain(stage_fns, stage_devs, x_t, n_micro)
    return _finish(x_t, img_h, img_w, out_dir, log, save_locally)


def run(raw_args=None):
    return generate_images_diffusion(raw_args)


if __name__ == "__main__":
    run()
