"""Generic training driver: one loop, four trainer personalities.

The reference ships four ~80%-identical training scripts
(train_diffusion.py, train_noise_cold_diffusion.py, train_doodle_diffusion.py,
train_SR_diffusion.py — SURVEY.md §2.5). Here a single driver is
parameterized by a `TrainerSpec`; the CLI entry points each instantiate one
spec, consuming the reference's training-config JSON **unchanged** (same keys,
same validation, same error strings) and writing the reference's checkpoint
files (torch-loadable model+optimizer and config-state .pt files,
train_diffusion.py:374-400) plus the same preview-grid plots.

TPU-native structure: the epoch loop feeds device-resident sharded batches to
one donated jitted train step (q_sample fused in); previews run the
scan-compiled samplers as jitted functions of params (compiled once per
shape). Mixed precision is bf16 compute / fp32 params (config key
"compute_dtype": "bfloat16"|"float32"; default bfloat16 — the TPU analogue of
the reference's fp16 AMP, no loss scaling needed). The NaN guard mirrors
train_diffusion.py:354-355 host-side.
"""

from __future__ import annotations

import argparse
import csv
import dataclasses
import glob
import json
import logging
import os
import pathlib
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from sdm_tpu.enums import DiffusionAlg, NoiseScheduler, Objective
from sdm_tpu.models import UNet
from sdm_tpu.ops.schedules import make_schedule
from sdm_tpu.ops.resize import area_resize
from sdm_tpu.diffusion.samplers import ddpm_sample, ddim_sample, cold_sample
from sdm_tpu.train.step import (
    make_optimizer, make_train_step, create_train_state, TrainState)
from sdm_tpu.parallel import make_mesh, shard_batch
from sdm_tpu.data import ImageDataset, ConditionalImgDataset, DoodleImgDataset, DataLoader
from sdm_tpu.io.checkpoint import (
    save_model, load_checkpoint, diffusion_checkpoint_dict,
    load_params_from_checkpoint, load_optimizer_from_checkpoint)
from sdm_tpu.io.plotting import plot_sampled_images
from sdm_tpu.utils import setup_logging
from sdm_tpu.utils.profiling import StepTimer, trace


@dataclasses.dataclass(frozen=True)
class TrainerSpec:
    project_name: str
    objective: Objective
    preview: str                 # "base" | "cold" | "doodle" | "sr"
    dataset: str                 # "cond_or_glob" | "doodle"
    uses_diffusion_alg: bool     # reads config "diffusion_alg" (base/doodle)
    has_flip: bool               # reads config "flip_imgs"
    is_sr: bool = False          # reads lr_dim/sr_dim/cond_t


BASE_SPEC = TrainerSpec("Diffusion", Objective.EPS, "base", "cond_or_glob",
                        uses_diffusion_alg=True, has_flip=True)
COLD_SPEC = TrainerSpec("Noise-Cold-Diffusion", Objective.X0, "cold",
                        "cond_or_glob", uses_diffusion_alg=False, has_flip=True)
DOODLE_SPEC = TrainerSpec("Doodle-Diffusion", Objective.EPS, "doodle",
                          "doodle", uses_diffusion_alg=True, has_flip=False)
SR_SPEC = TrainerSpec("SR-Cold-Diffusion", Objective.RESIDUAL_X0, "sr",
                      "cond_or_glob", uses_diffusion_alg=False, has_flip=True,
                      is_sr=True)


def parse_args(spec: TrainerSpec, raw_args=None) -> dict:
    parser = argparse.ArgumentParser(
        description=f"Train {spec.project_name} models.")
    parser.add_argument("-c", "--config-path", required=True,
                        type=pathlib.Path,
                        help="File path to load json config file.")
    parser.add_argument("--device", choices=["cpu", "cuda", "tpu"],
                        type=str, default="tpu",
                        help="Hardware device hint (JAX selects the backend).")
    parser.add_argument("--num-devices", type=int, default=None,
                        help="Devices for the data mesh (default: all).")
    parser.add_argument("--steps", type=int, default=None,
                        help="Stop after this many global steps (smoke runs; "
                             "default: run to max_epoch).")
    return vars(parser.parse_args(raw_args))


def checkpoint_dominates_epoch(ckpt_seconds: float,
                               epoch_seconds: float) -> bool:
    """True when the epoch-end checkpoint ate more than half the epoch.

    Short-epoch footgun: with a small dataset / large batch, the
    reference-parity every-epoch checkpoint (a full device->host parameter
    fetch + .pt write, train_diffusion.py:463-495) can dwarf the epoch's
    compute. Only trips for checkpoints slow enough to matter (>5 s).
    """
    compute_s = max(epoch_seconds - ckpt_seconds, 0.0)
    return ckpt_seconds > 5.0 and ckpt_seconds > 0.5 * max(compute_s, 1e-9)


def run_training(spec: TrainerSpec, config_dict: dict, *,
                 num_devices: Optional[int] = None,
                 max_steps: Optional[int] = None,
                 max_epoch_override: Optional[int] = None) -> dict:
    """Run training from a reference-format config dict. Returns a summary
    (final step count, last loss) for programmatic use/tests."""
    project_name = spec.project_name

    # Preemption-safe checkpointing (config "preempt_checkpoint", default
    # true; TPU-build extension — the reference loses everything since the
    # last cadence on SIGTERM): the first SIGTERM/SIGINT sets a flag; the
    # loop finishes the in-flight step, checkpoints (NaN guard still ordered
    # first), and returns cleanly with summary["preempted"]=True so a
    # preemptible-pod manager can resume from the exact stopping step. A
    # second signal restores the default handler behavior (force quit).
    # Installed FIRST so a signal during dataset/model setup or the first
    # compile is also converted into a clean checkpoint-and-exit. Handlers
    # only install on the main thread (signal.signal is main-thread-only;
    # library callers on worker threads keep their own handling).
    import signal as _signal
    import threading as _threading
    preempt = {"flag": False, "prev": {}}

    def _on_preempt_signal(signum, frame):
        if preempt["flag"]:
            _signal.signal(signum, preempt["prev"].get(signum,
                                                       _signal.SIG_DFL))
            raise KeyboardInterrupt
        preempt["flag"] = True
        logging.info("Preemption signal received - checkpointing after the "
                     "in-flight step, then exiting cleanly.")

    if (bool(config_dict.get("preempt_checkpoint", True))
            and _threading.current_thread() is _threading.main_thread()):
        for s in (_signal.SIGTERM, _signal.SIGINT):
            preempt["prev"][s] = _signal.signal(s, _on_preempt_signal)

    def _restore_signal_handlers():
        for s, prev in preempt["prev"].items():
            try:
                _signal.signal(s, prev)
            except (ValueError, TypeError):
                pass

    # Multi-host: join the distributed runtime BEFORE any device query
    # (config "multihost": true on TPU pods, or SDM_COORDINATOR_ADDRESS env
    # for explicit launches — see sdm_tpu/parallel/multihost.py).
    from sdm_tpu.parallel import multihost as mh
    multi = mh.maybe_initialize(config_dict)
    n_proc = jax.process_count()
    is_main = jax.process_index() == 0

    # ---- Param unpack & validation (parity: train_diffusion.py:57-116) ----
    starting_epoch = 0
    global_steps = 0
    checkpoint_steps = config_dict["checkpoint_steps"]
    lr_steps = config_dict["lr_steps"]
    max_epoch = config_dict["max_epoch"]
    plot_img_count = config_dict["plot_img_count"]
    use_conditional = (config_dict["use_conditional"]
                       if spec.dataset == "cond_or_glob" else False)
    flip_imgs = config_dict["flip_imgs"] if spec.has_flip else False

    dataset_path = config_dict["dataset_path"]
    if dataset_path is None:
        raise ValueError("No dataset_path entered.")
    out_dir = config_dict["out_dir"]
    os.makedirs(out_dir, exist_ok=True)

    diffusion_checkpoint = config_dict["model_checkpoint"]
    config_checkpoint = config_dict["config_checkpoint"]
    diffusion_lr = config_dict["diffusion_lr"]
    batch_size = config_dict["batch_size"]

    beta_1 = beta_T = None
    if config_dict["noise_scheduler"] == "LINEAR":
        noise_scheduling = NoiseScheduler.LINEAR
        beta_1 = config_dict["beta1"]
        beta_T = config_dict["betaT"]
    elif config_dict["noise_scheduler"] == "COSINE":
        noise_scheduling = NoiseScheduler.COSINE
    else:
        raise ValueError("Invalid noise scheduler type.")

    diffusion_alg = None
    if spec.uses_diffusion_alg:
        if config_dict["diffusion_alg"] == "DDIM":
            diffusion_alg = DiffusionAlg.DDIM
        elif config_dict["diffusion_alg"] == "DDPM":
            diffusion_alg = DiffusionAlg.DDPM
        else:
            raise ValueError("Invalid diffusion algorithm type.")

    min_noise_step = config_dict["min_noise_step"]
    max_noise_step = config_dict["max_noise_step"]
    max_actual_noise_step = config_dict["max_actual_noise_step"]
    skip_step = config_dict["skip_step"]
    if (max_actual_noise_step < min_noise_step
            or max_noise_step < min_noise_step
            or skip_step > max_actual_noise_step
            or skip_step < 0
            or min_noise_step < 0):
        raise ValueError("Invalid step values entered!")

    lr_dim = sr_dim = cond_t = None
    if spec.is_sr:
        lr_dim = config_dict["lr_dim"]
        sr_dim = config_dict["sr_dim"]
        cond_t = config_dict["cond_t"]

    if max_epoch_override is not None:
        max_epoch = max_epoch_override

    if is_main:
        setup_logging(out_dir, project_name)
    else:
        logging.getLogger().setLevel(logging.WARNING)

    # Config "seed" (TPU-build extension, default 0) makes the WHOLE run
    # deterministic: model init, per-step t/eps/flip draws, dataset shuffles,
    # and batch order. The reference is unseeded throughout.
    seed = int(config_dict.get("seed", 0))

    # ---- Dataset & loaders (train_diffusion.py:132-172) ----
    # cache_dataset=true keeps decoded uint8 pixels in RAM (the reference
    # re-decodes every epoch; on decode-bound hosts this keeps the chips fed).
    cache = bool(config_dict.get("cache_dataset", False))
    # Training batches carry raw uint8 pixels; the jitted step normalizes
    # on-device (bit-exact, 4x less host->device transfer).
    if spec.dataset == "doodle":
        dataset = DoodleImgDataset(dataset_path=dataset_path, seed=seed,
                                   cache_decoded=cache, normalized=False)
    elif use_conditional:
        dataset = ConditionalImgDataset(dataset_path=dataset_path, seed=seed,
                                        cache_decoded=cache, normalized=False)
    else:
        img_list = glob.glob(dataset_path)
        if len(img_list) == 0:
            raise Exception("No dataset found!")
        dataset = ImageDataset(img_paths=img_list, cache_decoded=cache,
                               normalized=False)

    local_batch = batch_size
    if multi:
        # batch_size is the GLOBAL batch; each host loads its own shard of
        # the dataset and contributes batch_size / process_count rows.
        if batch_size % n_proc:
            raise ValueError(
                f"batch size {batch_size} must be divisible by "
                f"{n_proc} processes")
        local_batch = batch_size // n_proc
        from sdm_tpu.data.loader import DatasetShard
        dataset = DatasetShard(dataset, mh.shard_indices(len(dataset)))
        if len(dataset) < local_batch:
            raise ValueError(
                f"dataset shard of {len(dataset)} items cannot fill a "
                f"per-host batch of {local_batch}")

    native_decode = bool(config_dict.get("native_decode", True))
    dataloader = DataLoader(dataset, batch_size=local_batch, shuffle=True,
                            num_workers=8, seed=seed,
                            native_decode=native_decode)
    plot_loader = DataLoader(dataset,
                             batch_size=min(plot_img_count, len(dataset)),
                             shuffle=(spec.preview == "doodle"),
                             num_workers=2, drop_last=False)
    plot_batch = next(iter(plot_loader))

    def _host_norm(x):
        if x is not None and x.dtype == np.uint8:
            return (x.astype(np.float32) - 127.5) / 127.5
        return x

    plot_imgs = _host_norm(plot_batch["image"])
    plot_labels = plot_batch.get("labels")
    plot_cond_imgs = _host_norm(plot_batch.get("cond_img"))

    if use_conditional and plot_labels is not None and is_main:
        # labels.txt CSV append (train_diffusion.py:159-169).
        labels_path = os.path.join(out_dir, "labels.txt")
        header = dataset.get_labels()
        with open(labels_path, "a") as f:
            wr = csv.writer(f)
            wr.writerows([header] + [list(map(float, row))
                                     for row in plot_labels])

    if spec.preview == "doodle" and plot_cond_imgs is not None and is_main:
        # Startup grid of the doodle conditioning images
        # (train_doodle_diffusion.py:145-150).
        plot_sampled_images(plot_cond_imgs, "label_plot", dest_path=out_dir,
                            log=logging.info)

    # ---- Model (train_diffusion.py:174-201) ----
    compute_dtype = {"bfloat16": jnp.bfloat16, "float32": None,
                     "fp32": None, "bf16": jnp.bfloat16}[
                         str(config_dict.get("compute_dtype", "bfloat16")).lower()]
    if int(config_dict.get("sp", 1)) > 1 and \
            config_dict.get("use_pallas", "auto") is not False:
        # Under spatial partitioning the Pallas kernels would force H
        # all-gathers and sp-times redundant attention work (their
        # custom_partitioning declares non-batch dims replicated,
        # parallel/sp.py) — the XLA path lets GSPMD shard the attention
        # einsums at 1x FLOPs (queries stay H-sharded, keys/values
        # gathered; asserted in tests/test_sp.py), so force it.
        if config_dict.get("use_pallas") is True:
            logging.info('"sp" > 1: overriding use_pallas=True to False — '
                         "the kernels would replicate attention sp times; "
                         "the XLA path shards it at 1x work.")
        config_dict = dict(config_dict, use_pallas=False)
    net = UNet.from_config(config_dict, dtype=compute_dtype)

    rng = jax.random.PRNGKey(seed)
    rng, init_rng = jax.random.split(rng)
    sample_hw = plot_imgs.shape[1:3]
    init_x = jnp.zeros((1, sample_hw[0], sample_hw[1], net.in_channel),
                       jnp.float32)
    init_t = jnp.array([1], jnp.int32)
    init_cond = (jnp.zeros((1, net.cond_dim), jnp.float32)
                 if net.cond_dim is not None else None)
    params = net.init(init_rng, init_x, init_t, init_cond)["params"]

    load_diffusion_optim = config_dict["load_diffusion_optim"]

    pending_optimizer = None
    pending_ema = None
    pending_native = None
    if diffusion_checkpoint is not None and os.path.isdir(diffusion_checkpoint):
        # Native (orbax) checkpoint dir from "native_checkpoint": true runs:
        # the FULL train state (params, optimizer, EMA, step counter) is
        # restored in one shot — after the mesh/sharding setup below, so
        # leaves land directly on their final shardings (io/orbax_ckpt.py).
        pending_native = diffusion_checkpoint
        diffusion_checkpoint = None
    if diffusion_checkpoint is not None:
        ok, ckpt = load_checkpoint(diffusion_checkpoint, log=logging.info)
        if not ok:
            raise Exception("An error occured while loading model checkpoint!")
        params = load_params_from_checkpoint(ckpt, params, log=logging.info)
        params = jax.tree.map(jnp.asarray, params)
        if load_diffusion_optim:
            pending_optimizer = ckpt["optimizer"]
        pending_ema = ckpt if "ema" in ckpt else None

    if config_checkpoint is not None:
        ok, cfg_ckpt = load_checkpoint(config_checkpoint, log=logging.info)
        if not ok:
            raise Exception("An error occured while loading config checkpoint!")
        if noise_scheduling == NoiseScheduler.LINEAR:
            beta_1 = cfg_ckpt["beta_1"]
            beta_T = cfg_ckpt["beta_T"]
        starting_epoch = cfg_ckpt["starting_epoch"]
        global_steps = cfg_ckpt["global_steps"]

    # Resume LR parity (train_diffusion.py:219-220): torch's
    # optim.load_state_dict restores the param_groups' checkpointed lr, so
    # with load_diffusion_optim the run continues at the SAVED lr (halving
    # every lr_steps from there) — even when the config's diffusion_lr or
    # lr_steps changed since the checkpointed run. Recomputing from the
    # config instead can jump a converged model back to a hot LR (observed:
    # instant divergence on the shapes flagship resume).
    resume_lr = None
    if pending_optimizer is not None:
        pgs = pending_optimizer.get("param_groups") or []
        if pgs and pgs[0].get("lr") is not None:
            resume_lr = float(pgs[0]["lr"])
            logging.info(f"Resuming at checkpointed LR {resume_lr:.9f} "
                         f"(halving every {lr_steps:,} steps).")
    tx = make_optimizer(diffusion_lr, lr_steps, resume_lr=resume_lr,
                        resume_step=global_steps)
    resume_halvings = (max(0, (global_steps - 1) // lr_steps)
                       if resume_lr is not None else 0)

    schedule = make_schedule(config_dict["noise_scheduler"],
                             beta_1=beta_1 if beta_1 is not None else 5e-3,
                             beta_T=beta_T if beta_T is not None else 9e-3,
                             max_noise_step=max_noise_step)

    # EMA (config "ema_decay", e.g. 0.9999; TPU-build extension, default off):
    # track an exponential moving average of params in the train state;
    # previews sample from it and checkpoints carry it under an extra "ema"
    # key the reference's loader ignores.
    ema_decay = config_dict.get("ema_decay")
    ema_decay = float(ema_decay) if ema_decay is not None else None
    state = create_train_state(params, tx, step=global_steps,
                               ema=ema_decay is not None)
    if ema_decay is not None and pending_ema is not None:
        # Resume the average itself when the checkpoint carries one
        # (otherwise it restarts from the freshly-loaded params).
        ema_np = load_params_from_checkpoint(pending_ema, state.ema_params,
                                             log=logging.info, key="ema")
        state = state.replace(ema_params=jax.tree.map(jnp.asarray, ema_np))
    if pending_optimizer is not None:
        opt_state = load_optimizer_from_checkpoint(
            {"optimizer": pending_optimizer}, state.params, state.opt_state)
        state = state.replace(opt_state=opt_state)

    # Gradient accumulation (config "grad_accum_steps", default 1): the
    # optimizer still takes one step per global step on the full batch_size
    # gradient, but activations only ever exist for batch_size/A rows —
    # bigger effective batches per chip (see train/step.py).
    grad_accum = int(config_dict.get("grad_accum_steps", 1))
    if grad_accum < 1 or batch_size % grad_accum:
        raise ValueError(
            f"batch size {batch_size} must be divisible by "
            f"grad_accum_steps {grad_accum}")
    micro_batch = batch_size // grad_accum

    # ---- Mesh & sharding ----
    from sdm_tpu.parallel.mesh import auto_data_mesh
    # Spatial partitioning (config "sp", default 1 = off): image H sharded
    # over a "space" mesh axis so per-sample activation memory drops
    # ~sp per chip — the lever for huge-resolution training (parallel/sp.py).
    # Tensor parallelism (config "tp", default 1 = off): conv/dense kernels
    # whose output-channel width is >= "tp_min_width" (default 256) sharded
    # over a "model" mesh axis; GSPMD inserts the activation collectives
    # (parallel/tp.py). dp = devices / (tp * sp); all three compose with
    # FSDP and multihost in one SPMD program (mesh axes data[, model][,
    # space]; under multihost the model/space axes stay within a host so
    # their collectives ride ICI, DCN carries only the dp gradient reduce).
    sp = int(config_dict.get("sp", 1))
    tp = int(config_dict.get("tp", 1))
    if sp < 1:
        raise ValueError(f'"sp" must be >= 1, got {sp}')
    if tp < 1:
        raise ValueError(f'"tp" must be >= 1, got {tp}')
    if multi:
        # All processes run one SPMD program: the mesh must span every
        # global device, and the global batch must divide across them.
        n_total = len(jax.devices())
        if num_devices is not None and num_devices != n_total:
            raise ValueError(
                f"multi-host training uses all {n_total} devices")
        if tp * sp > 1 and jax.local_device_count() % (tp * sp):
            raise ValueError(
                f"tp*sp = {tp * sp} must divide the per-host device count "
                f"{jax.local_device_count()} (model/space groups must not "
                "span hosts)")
    else:
        n_total = (num_devices if num_devices is not None
                   else len(jax.devices()))
    if tp > 1 or sp > 1:
        from jax.sharding import Mesh
        if n_total % (tp * sp):
            raise ValueError(
                f"tp={tp} x sp={sp} must divide the device count {n_total}")
        dp = n_total // (tp * sp)
        if micro_batch % dp:
            raise ValueError(
                f"microbatch {micro_batch} must be divisible by the data-"
                f"axis size {dp} ({n_total} devices / tp={tp} / sp={sp})")
        shape = [dp] + ([tp] if tp > 1 else []) + ([sp] if sp > 1 else [])
        names = (["data"] + (["model"] if tp > 1 else [])
                 + (["space"] if sp > 1 else []))
        mesh = Mesh(np.array(jax.devices()[:n_total]).reshape(shape),
                    tuple(names))
    elif multi:
        if micro_batch % n_total:
            raise ValueError(
                f"global microbatch {micro_batch} must be divisible by "
                f"{n_total} devices")
        mesh = make_mesh(n_total)
    else:
        mesh = auto_data_mesh(micro_batch, num_devices)
    n_dev = mesh.devices.size
    state = mh.replicate(state, mesh)

    # TP kernel shardings (only when "tp" > 1): the widest kernels' output-
    # channel dim over "model"; Adam moments and EMA share the kernels'
    # shapes so the same shape rule shards them consistently.
    tp_on = tp > 1
    tp_base_params = None
    tp_min_width = int(config_dict.get("tp_min_width", 256))
    if tp_on:
        from sdm_tpu.parallel.tp import tp_param_shardings
        tp_base_params = tp_param_shardings(state.params, mesh,
                                            min_width=tp_min_width)

    # FSDP (config "fsdp", default off = replicated parity behavior): shard
    # every large state leaf (params, Adam moments, EMA) over the data axis —
    # at-rest state memory drops ~n_dev; XLA turns the gradient all-reduce
    # into reduce-scatter + per-use all-gathers (parallel/fsdp.py).
    fsdp_on = bool(config_dict.get("fsdp", False)) and n_dev > 1
    state_shardings = None
    if fsdp_on:
        from sdm_tpu.parallel.fsdp import shard_state_fsdp
        state, state_shardings = shard_state_fsdp(
            state, mesh,
            min_size=int(config_dict.get("fsdp_min_size", 2 ** 15)),
            base_params=tp_base_params)
    elif tp_on:
        from sdm_tpu.parallel.tp import tp_param_shardings
        state_shardings = tp_param_shardings(state, mesh,
                                             min_width=tp_min_width)
        state = jax.jit(lambda s: s, out_shardings=state_shardings)(state)

    if pending_native is not None:
        # Resume from a native checkpoint dir (config "model_checkpoint"
        # pointing at out_dir/checkpoint/native_<steps>): the whole state —
        # params, Adam moments, EMA when tracked, step counter — restores
        # onto the shardings established above. load_diffusion_optim is
        # irrelevant here (full-state restore is the native semantics); a
        # config_checkpoint still governs starting_epoch/betas, but the
        # step counter comes from the state itself.
        from sdm_tpu.io.orbax_ckpt import load_native
        try:
            state = load_native(pending_native, state)
        except Exception as e:
            raise Exception(
                f"Failed to restore native checkpoint {pending_native!r} "
                f"(the run's \"ema_decay\" on/off setting and model config "
                f"must match the checkpointed run's): {e}")
        global_steps = int(state.step)
        logging.info(f"Restored native checkpoint {pending_native} "
                     f"(full state, step {global_steps}).")

    apply_fn = lambda p, x, t, l: net.apply({"params": p}, x, t, l)
    jit_kwargs = {}
    if state_shardings is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        # Pin the updated state back to the FSDP/TP layout (and donate the
        # old one); without this GSPMD may legally round-trip to replicated.
        jit_kwargs["out_shardings"] = (
            state_shardings,
            jax.tree.map(lambda _: NamedSharding(mesh, P()), {"loss": 0.0}))
    # Objective override (config "objective", TPU-build extension): "V"
    # swaps the eps target for the velocity target (diffusion/vpred.py) on
    # the eps-family trainers; cold/SR keep their fixed parameterizations.
    objective = spec.objective
    obj_cfg = str(config_dict.get("objective", "")).upper()
    if obj_cfg and obj_cfg != objective.name:
        from sdm_tpu.enums import Objective
        if obj_cfg == "V" and objective == Objective.EPS:
            objective = Objective.V
        else:
            raise ValueError(
                f'config "objective": "{obj_cfg}" is not valid for this '
                f"trainer (supported: {objective.name}, or V on the "
                "eps-family trainers)")

    step_core = (
        make_train_step(apply_fn, schedule, tx, objective=objective,
                        min_noise_step=min_noise_step,
                        max_actual_noise_step=max_actual_noise_step,
                        flip_imgs=flip_imgs, cond_t=cond_t, lr_dim=lr_dim,
                        grad_accum_steps=grad_accum,
                        # CFG label dropout (config "cfg_drop_prob", default
                        # 0 = parity): see diffusion/guidance.py.
                        cfg_drop_prob=float(
                            config_dict.get("cfg_drop_prob", 0.0)),
                        ema_decay=ema_decay,
                        # min-SNR-gamma loss weighting (config
                        # "min_snr_gamma", TPU-build extension; default
                        # None = the reference's uniform MSE).
                        min_snr_gamma=(
                            float(config_dict["min_snr_gamma"])
                            if config_dict.get("min_snr_gamma") is not None
                            else None),
                        # Gradient clipping (config "grad_clip_norm", TPU-
                        # build extension; default None = the reference's
                        # unclipped updates).
                        grad_clip_norm=(
                            float(config_dict["grad_clip_norm"])
                            if config_dict.get("grad_clip_norm") is not None
                            else None)))
    step_fn = jax.jit(step_core, donate_argnums=(0,), **jit_kwargs)

    def lr_of(step_count) -> float:
        # Pure-python mirror of the active schedule (reference_lr_schedule,
        # or resume_lr_schedule after an optimizer restore) for logging —
        # avoids dispatching device ops per log line.
        s = int(step_count)
        halvings = max(0, (s - 1) // lr_steps)
        if resume_lr is not None:
            return resume_lr * 0.5 ** max(halvings - resume_halvings, 0)
        return float(diffusion_lr) * 0.5 ** halvings

    # ---- Hyperparameter banner (train_diffusion.py:254-286) ----
    logging.info("#" * 100)
    logging.info("Train Parameters:")
    logging.info(f"Max Epoch: {max_epoch:,}")
    logging.info(f"Dataset Path: {dataset_path}")
    logging.info(f"Output Path: {out_dir}")
    logging.info(f"Checkpoint Steps: {checkpoint_steps}")
    logging.info(f"Batch size: {batch_size:,}")
    logging.info(f"Diffusion LR: {lr_of(global_steps):.5f}")
    logging.info(f"Using Conditional Info.: {use_conditional}")
    logging.info(f"Image Augmentation (Random Horizontal Flip): {flip_imgs}")
    logging.info(f"Devices (data mesh): {n_dev}"
                 + (f" [tensor parallelism tp={tp}]" if tp > 1 else "")
                 + (f" [spatial partitioning sp={sp}]" if sp > 1 else "")
                 + (" [FSDP state sharding]" if fsdp_on else ""))
    logging.info(f"Compute dtype: {compute_dtype or jnp.float32}")
    if spec.is_sr:
        logging.info(f"Low Resolution Dim: {lr_dim:,}")
        logging.info(f"Super Resolution Dim: {sr_dim:,}")
    logging.info("#" * 100)
    if noise_scheduling == NoiseScheduler.LINEAR:
        logging.info(f"Beta_1: {beta_1:,.5f}")
        logging.info(f"Beta_T: {beta_T:,.5f}")
    logging.info(f"Min Noise Step: {min_noise_step:,}")
    logging.info(f"Max Noise Step: {max_noise_step:,}")
    logging.info(f"Max Actual Noise Step: {max_actual_noise_step:,}")
    logging.info("#" * 100)

    # ---- Preview sampler (jitted once, params as argument) ----
    preview_jit = {}

    def run_preview(state_params, rng_key):
        n = plot_imgs.shape[0]
        h, w = plot_imgs.shape[1], plot_imgs.shape[2]
        c = config_dict["out_channel"]
        rng_key, nk = jax.random.split(rng_key)
        noise_plot = jax.random.normal(nk, (n, h, w, c), jnp.float32)
        labels_j = (jnp.asarray(plot_labels)
                    if plot_labels is not None else None)

        def model_fn_factory(p):
            fn = lambda x, t, l: net.apply({"params": p}, x, t, l)
            from sdm_tpu.enums import Objective
            if objective == Objective.V:
                # Previews use the samplers' native v path (tag detected
                # at trace time — diffusion/vpred.py).
                from sdm_tpu.diffusion.vpred import tag_v
                fn = tag_v(fn)
            return fn

        if spec.preview in ("base", "cold", "doodle"):
            if max_actual_noise_step < max_noise_step:
                x_t_plot = schedule.q_sample(
                    jnp.asarray(plot_imgs),
                    jnp.array([max_actual_noise_step]), noise_plot)
            else:
                x_t_plot = noise_plot

        if spec.preview == "base" or spec.preview == "doodle":
            cond = (jnp.asarray(plot_cond_imgs)
                    if spec.preview == "doodle" else None)
            labels_arg = labels_j if spec.preview == "base" else None
            key = ("prev", diffusion_alg)
            if key not in preview_jit:
                def fn(p, x_t, k, labels, cond_img):
                    mf = model_fn_factory(p)
                    if diffusion_alg == DiffusionAlg.DDPM:
                        return ddpm_sample(
                            mf, schedule, x_t, rng=k,
                            min_noise=min_noise_step,
                            max_noise=max_actual_noise_step,
                            cond_img=cond_img, labels=labels)
                    return ddim_sample(
                        mf, schedule, x_t,
                        min_noise=min_noise_step,
                        max_noise=max_actual_noise_step,
                        ddim_step_size=skip_step,
                        cond_img=cond_img, labels=labels)
                preview_jit[key] = jax.jit(fn, static_argnames=())
            rng_key, sk = jax.random.split(rng_key)
            out = preview_jit[key](state_params, x_t_plot, sk, labels_arg, cond)
            return np.asarray(out)

        if spec.preview == "cold":
            key = ("cold",)
            if key not in preview_jit:
                def fn(p, x_t, noise, labels):
                    mf = model_fn_factory(p)
                    return cold_sample(
                        mf, schedule, x_t, noise,
                        min_noise=min_noise_step,
                        max_noise=max_actual_noise_step,
                        skip_step_size=skip_step, labels=labels)
                preview_jit[key] = jax.jit(fn)
            out = preview_jit[key](state_params, x_t_plot, noise_plot, labels_j)
            return np.asarray(out)

        # SR preview (train_SR_diffusion.py:424-462).
        key = ("sr",)
        lr_plot = area_resize(
            area_resize(jnp.asarray(plot_imgs), lr_dim, lr_dim), sr_dim, sr_dim)
        x_t_lr = schedule.q_sample(lr_plot, jnp.array([cond_t]), noise_plot)
        if key not in preview_jit:
            def fn(p, x_t, noise, cond_img, labels):
                mf = model_fn_factory(p)
                return cold_sample(
                    mf, schedule, x_t, noise,
                    min_noise=min_noise_step,
                    max_noise=max_actual_noise_step,
                    skip_step_size=skip_step,
                    cond_img=cond_img, labels=labels)
            preview_jit[key] = jax.jit(fn)
        x0 = preview_jit[key](state_params, noise_plot, noise_plot, x_t_lr,
                              labels_j)
        return np.asarray(x0 + lr_plot)

    # Async checkpointing (config "async_checkpoint": true): snapshot the
    # state on-device (cheap HBM copy, safe against donation by later steps)
    # and run the device->host fetch + torch.save + preview on a worker
    # thread while training continues. On this host the fetch of params +
    # Adam moments dominates checkpoint latency.
    import threading
    async_ckpt = bool(config_dict.get("async_checkpoint", False))
    ckpt_worker = {"thread": None}

    # Cross-host FSDP/TP checkpointing: sharded leaves span hosts, so process
    # 0 cannot read them directly. Every process first runs this collective
    # all-gather reshard back to the replicated layout (GSPMD turns the
    # sharding change into all-gathers over ICI/DCN); afterwards each process
    # holds a fully-addressable copy and the process-0-only I/O below works
    # unchanged. NOTE: because this is a collective, a preemption-triggered
    # checkpoint needs the signal delivered to EVERY host — which TPU
    # maintenance events do — or the gather would wait forever.
    gather_replicated = None
    if state_shardings is not None and multi:
        from jax.sharding import NamedSharding, PartitionSpec as P
        _rep = jax.tree.map(lambda _: NamedSharding(mesh, P()), state)
        gather_replicated = jax.jit(lambda s: s, out_shardings=_rep)

    def submit_checkpoint(state, rng_key, steps, with_preview=True):
        if gather_replicated is not None:
            state = gather_replicated(state)
        if not is_main:
            return  # params are replicated; process 0 owns all host I/O
        if multi:
            # Host-local copy first: checkpoint/preview must not launch
            # collective computations from a single process.
            state = TrainState(step=np.asarray(state.step),
                               params=mh.localize(state.params),
                               opt_state=mh.localize(state.opt_state),
                               ema_params=(mh.localize(state.ema_params)
                                           if state.ema_params is not None
                                           else None))
        if not async_ckpt:
            checkpoint_and_preview(state, rng_key, steps, with_preview)
            return
        if ckpt_worker["thread"] is not None:
            ckpt_worker["thread"].join()  # at most one in flight
        snap = TrainState(step=state.step,
                          params=jax.tree.map(jnp.copy, state.params),
                          opt_state=jax.tree.map(jnp.copy, state.opt_state),
                          ema_params=jax.tree.map(jnp.copy, state.ema_params))
        t = threading.Thread(target=checkpoint_and_preview,
                             args=(snap, rng_key, steps, with_preview),
                             daemon=True)
        t.start()
        ckpt_worker["thread"] = t

    def finish_checkpoints():
        if ckpt_worker["thread"] is not None:
            ckpt_worker["thread"].join()
            ckpt_worker["thread"] = None

    def checkpoint_and_preview(state, rng_key, steps, with_preview=True):
        config_state = {"starting_epoch": starting_epoch,
                        "global_steps": int(steps)}
        if noise_scheduling == NoiseScheduler.LINEAR:
            config_state["beta_1"] = beta_1
            config_state["beta_T"] = beta_T
        save_model(config_state, "config", out_dir, checkpoint=True,
                   steps=int(steps), log=logging.info)
        ckpt = diffusion_checkpoint_dict(
            state.params, state.opt_state,
            lr=lr_of(steps), ema_params=state.ema_params)
        save_model(ckpt, "diffusion", out_dir, checkpoint=True,
                   steps=int(steps), log=logging.info)
        if config_dict.get("native_checkpoint"):
            from sdm_tpu.io.orbax_ckpt import save_native
            save_native(state, out_dir, int(steps))
        if not with_preview:
            return
        try:
            # Previews sample from the EMA weights when tracked — the
            # standard diffusion practice the averaged weights exist for.
            pv_params = (state.ema_params if state.ema_params is not None
                         else state.params)
            imgs = run_preview(pv_params, rng_key)
            plot_sampled_images(imgs, f"diffusion_plot_{int(steps)}",
                                dest_path=out_dir, log=logging.info)
        except Exception as e:  # preview must never kill training
            logging.info(f"Preview sampling failed: {e}")

    # ---- Epoch loop (train_diffusion.py:288-495) ----
    # Observability beyond the reference (SURVEY.md §5.1): steps/sec rate
    # logging + optional jax.profiler trace via config "profile_trace_dir".
    timer = StepTimer()
    last_loss = float("nan")
    stop = False
    profile_ctx = trace(config_dict.get("profile_trace_dir"))
    profile_ctx.__enter__()

    # ---- Device-resident fused training (TPU-build extension) ----
    # Config "device_dataset": true keeps the ENTIRE decoded uint8 dataset
    # in HBM (one transfer at startup) and runs "steps_per_call" train steps
    # as ONE jitted lax.scan call: each scan iteration gathers its batch
    # rows from the resident array by index and runs the identical step_core
    # the per-step path jits. This removes BOTH per-step host->device batch
    # transfers and per-step dispatch round-trips — on hosts with a slow or
    # tunnel-attached device link (where shipping a batch can cost more than
    # the step computes) it is the difference between host-bound and
    # device-bound training. Numerics per step are identical to the default
    # path; only batch ORDER and the rng stream differ (shuffling happens on
    # a host index stream, one epoch-sized permutation at a time), so the
    # reference-parity default stays off.
    if bool(config_dict.get("device_dataset", False)):
        if multi or sp > 1 or grad_accum > 1:
            raise ValueError(
                '"device_dataset" fused training supports single-process '
                "runs without sp/grad_accum_steps (dp/tp/fsdp compose)")
        summary = _run_fused_loop(
            config_dict=config_dict, dataset=dataset,
            native_decode=native_decode, batch_size=batch_size, seed=seed,
            mesh=mesh, state=state, rng=rng, step_core=step_core,
            state_shardings=state_shardings, timer=timer, preempt=preempt,
            max_steps=max_steps, max_epoch=max_epoch,
            checkpoint_steps=checkpoint_steps,
            starting_epoch=starting_epoch, global_steps=global_steps,
            lr_of=lr_of, submit_checkpoint=submit_checkpoint,
            finish_checkpoints=finish_checkpoints)
        _restore_signal_handlers()
        profile_ctx.__exit__(None, None, None)
        mh.barrier("train-end")
        return summary

    # Overlapped loss fetch (config "overlapped_loss_fetch", default true):
    # the per-step `float(metrics["loss"])` host fetch blocks until the step
    # finishes, serializing host and device. Deferring the fetch of step k
    # until after step k+1 is dispatched keeps two steps in flight, hiding
    # the host's per-step work (RNG split, dataloader, logging) behind device
    # compute. Log lines stay byte-identical (same values, same order) — the
    # line for step k is simply emitted one step later in wall time, and the
    # NaN guard (train_diffusion.py:354-355) fires one step late.
    overlap_loss = bool(config_dict.get("overlapped_loss_fetch", True))
    ckpt_warned = False  # one-time short-epoch checkpoint nudge

    for epoch in range(starting_epoch, max_epoch):
        epoch_t0 = time.monotonic()
        total_diffusion_loss = 0.0
        training_count = 0
        batch_iter = iter(dataloader)
        pending = None  # deferred (metrics, epoch_index, global_steps)

        def fetch_loss(metrics):
            loss = float(metrics["loss"])
            timer.tick()
            if np.isnan(loss):
                raise Exception("NaN encountered during training")
            return loss

        def log_step(loss, idx, steps_at):
            nonlocal last_loss, total_diffusion_loss
            last_loss = loss
            total_diffusion_loss += loss
            temp_avg = total_diffusion_loss / (idx + 1)
            logging.info(
                "Cum. Steps: {:,} | Steps: {:,} / {:,} | Diffusion: {:.5f} | LR: {:.9f}".format(
                    steps_at + 1, idx + 1, len(dataloader), temp_avg,
                    lr_of(steps_at)))

        def process_metrics(metrics, idx, steps_at):
            log_step(fetch_loss(metrics), idx, steps_at)

        def _put(b):
            arrays = {k: v for k, v in b.items() if isinstance(v, np.ndarray)}
            spec_p = None
            if grad_accum > 1:
                # Pre-split into (A, N/A, ...) microbatch stacks; the step's
                # lax.scan walks axis 0, devices shard axis 1.
                from jax.sharding import PartitionSpec as P
                arrays = {k: v.reshape((grad_accum, v.shape[0] // grad_accum)
                                       + v.shape[1:])
                          for k, v in arrays.items()}
                spec_p = P(None, "data")
            if sp > 1 and not multi:
                from sdm_tpu.parallel.sp import put_batch_sp
                return put_batch_sp(arrays, mesh, sp=sp,
                                    leading_stack=grad_accum > 1)
            if multi:
                if sp > 1:
                    # sp x multihost: each host contributes its batch rows
                    # with FULL image height; the space shards of any row
                    # live on that host's own devices (enforced by the
                    # local-device divisibility check above), so the global
                    # assembly is still process-local-data per host.
                    from sdm_tpu.parallel.sp import (
                        spatial_batch_spec, validate_spatial_divisibility)
                    out = {}
                    for k, v in arrays.items():
                        validate_spatial_divisibility(
                            np.shape(v), sp, name=k,
                            leading_stack=grad_accum > 1)
                        out[k] = mh.put_global_batch(
                            v, mesh, spec=spatial_batch_spec(
                                np.ndim(v), leading_stack=grad_accum > 1))
                    return out
                return mh.put_global_batch(arrays, mesh, spec=spec_p)
            if spec_p is not None:
                from jax.sharding import NamedSharding
                sh = NamedSharding(mesh, spec_p)
                return jax.tree.map(lambda x: jax.device_put(x, sh), arrays)
            return shard_batch(arrays, mesh)

        try:
            device_batch = _put(next(batch_iter))
        except StopIteration:
            device_batch = None
        index = -1
        while device_batch is not None:
            index += 1
            training_count += 1
            rng, step_rng = jax.random.split(rng)
            state, metrics = step_fn(state, device_batch, step_rng)
            # Ship the next batch while the device runs this step.
            try:
                device_batch = _put(next(batch_iter))
            except StopIteration:
                device_batch = None
            if pending is not None:
                process_metrics(*pending)
                pending = None

            is_ckpt = global_steps % checkpoint_steps == 0 and global_steps >= 0
            if is_ckpt:
                # Checkpoint steps drain synchronously: the snapshot must be
                # taken before the post-k state buffer is donated to step k+1,
                # and the NaN guard must fire BEFORE anything is persisted
                # (never save a diverged state), mirroring the reference's
                # raise-before-checkpoint order (train_diffusion.py:354-400).
                loss = fetch_loss(metrics)
                rng, prev_rng = jax.random.split(rng)
                submit_checkpoint(state, prev_rng, global_steps)
                sps = timer.steps_per_sec()
                if np.isfinite(sps):
                    logging.info(
                        "Rate: {:.3f} steps/sec | {:.1f} imgs/sec".format(
                            sps, sps * batch_size))
                log_step(loss, index, global_steps)
            elif overlap_loss and device_batch is not None:
                pending = (metrics, index, global_steps)
            else:
                process_metrics(metrics, index, global_steps)
            global_steps += 1
            if preempt["flag"]:
                # Flush the deferred loss first so the NaN guard still fires
                # BEFORE anything is persisted, then checkpoint and exit.
                if pending is not None:
                    process_metrics(*pending)
                    pending = None
                rng, prev_rng = jax.random.split(rng)
                submit_checkpoint(state, prev_rng, global_steps,
                                  with_preview=False)
                logging.info(
                    "Preempted: checkpointed at step {:,}; exiting.".format(
                        global_steps))
                stop = True
                break
            if max_steps is not None and global_steps >= max_steps:
                stop = True
                break
        if pending is not None:
            process_metrics(*pending)
            pending = None

        # End-of-epoch checkpoint (train_diffusion.py:463-495); under
        # async_checkpoint it runs on the worker thread (no preview) so short
        # epochs don't stall on the device->host parameter fetch. Config
        # "epoch_checkpoint_every": N saves only every N-th epoch (default 1
        # = reference parity) — with short epochs and slow host links the
        # parameter fetch otherwise dominates wall time.
        rng, epoch_rng = jax.random.split(rng)
        every = int(config_dict.get("epoch_checkpoint_every", 1))
        if ((every <= 1 or (epoch + 1) % every == 0 or stop
             or epoch + 1 == max_epoch) and not preempt["flag"]):
            # (preemption already checkpointed this exact step)
            t_ck = time.monotonic()
            submit_checkpoint(state, epoch_rng, global_steps, with_preview=False)
            ck_s = time.monotonic() - t_ck
            epoch_s = time.monotonic() - epoch_t0
            # Nudge once toward the two knobs that fix a checkpoint-dominated
            # epoch (see checkpoint_dominates_epoch).
            if checkpoint_dominates_epoch(ck_s, epoch_s) and not ckpt_warned:
                ckpt_warned = True
                logging.warning(
                    "Epoch-end checkpoint took {:.0f}s vs {:.0f}s of epoch "
                    "compute — epochs are short for this dataset/batch. Set "
                    '"epoch_checkpoint_every": N and/or "async_checkpoint": '
                    "true to stop checkpoint I/O dominating the run."
                    .format(ck_s, max(epoch_s - ck_s, 0.0)))
        if training_count:
            avg = total_diffusion_loss / training_count
            logging.info("Epoch: {:,} | Diffusion: {:.5f} | LR: {:.9f}".format(
                epoch, avg, lr_of(global_steps)))
        if stop:
            break

    finish_checkpoints()
    _restore_signal_handlers()
    profile_ctx.__exit__(None, None, None)
    mh.barrier("train-end")
    return {"global_steps": global_steps, "last_loss": last_loss,
            "preempted": preempt["flag"],
            "state": state,
            # Sliding-window rate over the last <=50 host-synced losses —
            # excludes the first (compile) step once enough steps ran; feeds
            # bench.py --metric train64_e2e.
            "steps_per_sec": timer.steps_per_sec(),
            # Per-step wall intervals (excluding compile) for distribution
            # diagnostics in the bench JSON (median/p90/recompile spikes).
            "step_times": timer.intervals()}


def _run_fused_loop(*, config_dict, dataset, native_decode, batch_size, seed,
                    mesh, state, rng, step_core, state_shardings, timer,
                    preempt, max_steps, max_epoch, checkpoint_steps,
                    starting_epoch, global_steps, lr_of, submit_checkpoint,
                    finish_checkpoints):
    """Fused device-resident main loop (config "device_dataset": true).

    The decoded uint8 dataset is shipped to device memory once; each device
    call runs `steps_per_call` train steps as one lax.scan whose body gathers
    its batch rows by index from the resident array and runs the same
    step_core the per-step path jits. Shuffling stays host-side: a stream of
    epoch-sized permutations, cut into (K, batch) index blocks — the only
    per-call transfers are that index block and the K fetched losses.

    Log lines keep the per-step format ("Cum. Steps: ... | Steps: i/n |
    Diffusion: avg | LR: ...") so curve tooling parses both paths
    identically; a chunk's K lines are emitted in a burst after its device
    call returns, and the NaN guard fires per chunk (before any checkpoint),
    not per step. --steps may overshoot by up to K-1 steps (chunks are never
    re-compiled at a shorter length). Step-cadence checkpoints land at the
    first chunk boundary at or after the configured step.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    # One pass through the dataset -> contiguous host arrays -> HBM.
    load_loader = DataLoader(dataset, batch_size=min(512, len(dataset)),
                             shuffle=False, num_workers=8, drop_last=False,
                             native_decode=native_decode)
    parts = {}
    for b in load_loader:
        for k, v in b.items():
            if isinstance(v, np.ndarray):
                parts.setdefault(k, []).append(v)
    if "image" not in parts:
        raise ValueError('"device_dataset" needs array-valued samples')
    host = {k: np.concatenate(v, axis=0) for k, v in parts.items()}
    n_rows = host["image"].shape[0]
    rep = NamedSharding(mesh, P())
    data_dev = {k: jax.device_put(v, rep) for k, v in host.items()}
    nbytes = sum(v.nbytes for v in host.values())

    b_sz = min(batch_size, n_rows)
    steps_per_epoch = max(n_rows // b_sz, 1)
    k_steps = int(config_dict.get("steps_per_call", 0)) or min(
        steps_per_epoch, 64)
    logging.info(
        "Device-resident dataset: {:,} rows ({:.1f} MiB) in device memory; "
        "{} steps fused per call.".format(n_rows, nbytes / 2 ** 20, k_steps))

    batch_shardings = {
        k: NamedSharding(mesh, P(*(("data",) + (None,) * (v.ndim - 1))))
        for k, v in host.items()}

    def fused_fn(st, data, idx, key):
        keys = jax.random.split(key, k_steps)

        def body(s, xs):
            ix, kk = xs
            batch = {
                f: jax.lax.with_sharding_constraint(
                    jnp.take(arr, ix, axis=0), batch_shardings[f])
                for f, arr in data.items()}
            s, m = step_core(s, batch, kk)
            return s, m["loss"]

        st, losses = jax.lax.scan(body, st, (idx, keys))
        return st, losses

    jit_kwargs = {}
    if state_shardings is not None:
        jit_kwargs["out_shardings"] = (state_shardings,
                                       NamedSharding(mesh, P()))
    fused_jit = jax.jit(fused_fn, donate_argnums=(0,), **jit_kwargs)

    perm_rng = np.random.default_rng((int(seed) + 0x9E3779B9) % 2 ** 63)
    buf = np.empty((0,), np.int64)
    epoch = starting_epoch
    epoch_idx = 0      # step index within the current epoch
    epoch_loss = 0.0
    last_loss = float("nan")
    last_ckpt_bucket = global_steps // max(checkpoint_steps, 1)
    every = int(config_dict.get("epoch_checkpoint_every", 1))
    stop = False

    while not stop and epoch < max_epoch:
        while buf.size < k_steps * b_sz:
            perm = perm_rng.permutation(n_rows)[:steps_per_epoch * b_sz]
            buf = np.concatenate([buf, perm])
        idx = buf[:k_steps * b_sz].astype(np.int32).reshape(k_steps, b_sz)
        buf = buf[k_steps * b_sz:]
        rng, call_rng = jax.random.split(rng)
        state, losses_dev = fused_jit(state, data_dev, idx, call_rng)
        losses = np.asarray(jax.device_get(losses_dev), np.float64)
        timer.tick()
        if np.isnan(losses).any():
            raise Exception("NaN encountered during training")
        for lv in losses:
            last_loss = float(lv)
            epoch_loss += last_loss
            epoch_idx += 1
            logging.info(
                "Cum. Steps: {:,} | Steps: {:,} / {:,} | Diffusion: {:.5f} "
                "| LR: {:.9f}".format(
                    global_steps + 1, epoch_idx, steps_per_epoch,
                    epoch_loss / epoch_idx, lr_of(global_steps)))
            global_steps += 1
            if epoch_idx == steps_per_epoch:
                logging.info(
                    "Epoch: {:,} | Diffusion: {:.5f} | LR: {:.9f}".format(
                        epoch, epoch_loss / steps_per_epoch,
                        lr_of(global_steps)))
                epoch += 1
                epoch_idx = 0
                epoch_loss = 0.0
                if every >= 1 and epoch % every == 0:
                    rng, ck_rng = jax.random.split(rng)
                    submit_checkpoint(state, ck_rng, global_steps,
                                      with_preview=False)
        bucket = global_steps // max(checkpoint_steps, 1)
        if bucket > last_ckpt_bucket:
            last_ckpt_bucket = bucket
            rng, ck_rng = jax.random.split(rng)
            submit_checkpoint(state, ck_rng, global_steps)
            iv = timer.intervals()
            if iv:
                logging.info(
                    "Rate: {:.3f} steps/sec | {:.1f} imgs/sec".format(
                        k_steps / iv[-1], k_steps * b_sz / iv[-1]))
        if preempt["flag"] or (max_steps is not None
                               and global_steps >= max_steps):
            stop = True

    rng, ck_rng = jax.random.split(rng)
    submit_checkpoint(state, ck_rng, global_steps,
                      with_preview=not preempt["flag"])
    if preempt["flag"]:
        logging.info("Preempted: checkpointed at step {:,}; exiting.".format(
            global_steps))
    finish_checkpoints()
    iv = timer.intervals()
    per_step = [s / k_steps for s in iv for _ in range(k_steps)]
    sps = (k_steps * len(iv) / sum(iv)) if iv else float("nan")
    return {"global_steps": global_steps, "last_loss": last_loss,
            "preempted": preempt["flag"], "state": state,
            "steps_per_sec": sps, "step_times": per_step}


def main(spec: TrainerSpec, raw_args=None):
    from sdm_tpu.utils.jax_setup import setup_jax_cache
    setup_jax_cache()
    args = parse_args(spec, raw_args)
    if args["device"] == "cpu":
        # Honor the reference's --device cpu (train_diffusion.py:40-44).
        # "cuda"/"tpu" mean "the accelerator JAX finds" on this platform.
        jax.config.update("jax_platforms", "cpu")
        if jax.devices()[0].platform != "cpu":  # backend was already up
            import warnings
            warnings.warn("--device cpu ignored: JAX backend already "
                          "initialized in this process")
    with open(args["config_path"], "r") as f:
        config_dict = json.loads(f.read())
    return run_training(spec, config_dict, num_devices=args["num_devices"],
                        max_steps=args["steps"])
