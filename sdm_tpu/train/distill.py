"""Progressive distillation (Salimans & Ho, ICLR 2022) for few-step sampling.

TPU-build extension beyond the reference (whose sampler set tops out at
DDIM skip-stepping, /root/reference/diffusion_sampling_algorithms.py:66-148):
train a *student* copy of an eps-predicting diffusion model so that ONE of its
deterministic DDIM steps reproduces TWO teacher DDIM steps, then halve again —
after P phases the student samples on a 2^P-times-coarser grid at teacher
quality. A distilled 3-5 call sampler turns the ~24 img/s single-chip physical
ceiling of DDIM-50 at 128^2 (BASELINE.md FLOP accounting) into >200 img/s.

Math (eps parameterization, eta=0 DDIM; a_t = sqrt(abar_t), s_t = sqrt(1-abar_t)):
  teacher, two steps t -> m -> u starting from x_t:
      eps1 = T(x_t, t);  x0_1 = (x_t - s_t eps1)/a_t;  x_m = a_m x0_1 + s_m eps1
      eps2 = T(x_m, m);  x0_2 = (x_m - s_m eps2)/a_m;  z   = a_u x0_2 + s_u eps2
  the student's one-step DDIM from x_t to u lands on z iff its x0 prediction is
      x~ = (z - (s_u/s_t) x_t) / (a_u - (s_u/s_t) a_t)          [SH22 eq. 8]
  loss = w(t) * ||x0_student(x_t, t) - x~||^2,  w = max(abar/(1-abar), 1)
  (the paper's truncated-SNR weighting).

The student trains on exactly the grid it will sample with: the framework's
`ddim_step_list(min, max, step_size)` (range with the reference's append-min
rule), with the teacher midpoint m = (t+u)//2. The list's final visited step
additionally does a plain x0-extraction call in `ddim_sample` (reference
return-x0-at-1 rule, :146-148), so that endpoint is trained too, against the
teacher's own x0 prediction there (the t == u row below; the closed form
degenerates because a_u s_t - a_t s_u = 0 at t == u).

Supports label-vector and channel-concat image conditioning (same entry
points as the EPS-objective trainers). Cold/SR models are x0-predicting cold
samplers — a different update rule — and are out of scope here.

Checkpoints are written in the reference's torch-loadable format, so a
distilled student exports through `export_models` and samples through
`generate_images_diffusion --diff_alg ddim --ddim_step_size <coarse>`
unchanged.
"""

from __future__ import annotations

import logging
from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from sdm_tpu.diffusion.samplers import ddim_step_list
from sdm_tpu.train.step import TrainState, create_train_state, make_optimizer


def _a_s(schedule, t, ndim: int = 4) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(sqrt(abar_t), sqrt(1-abar_t)) broadcast to image rank, fp32."""
    abar = schedule.alpha_bar_at(t).astype(jnp.float32)
    while abar.ndim < ndim:
        abar = abar[..., None]
    return abar ** 0.5, (1.0 - abar) ** 0.5


def distill_pairs(step_list: List[int]) -> np.ndarray:
    """(P, 3) int32 rows (t, m, u): one row per student DDIM interval with the
    teacher midpoint m = (t+u)//2, plus the endpoint row (t=m=u=last step) for
    the sampler's final x0-extraction call."""
    rows = [(t, (t + u) // 2, u)
            for t, u in zip(step_list[:-1], step_list[1:])]
    last = step_list[-1]
    rows.append((last, last, last))
    return np.asarray(rows, dtype=np.int32)


def distill_target(apply_teacher: Callable, schedule,
                   x_t: jnp.ndarray, t: jnp.ndarray, m: jnp.ndarray,
                   u: jnp.ndarray) -> jnp.ndarray:
    """x0-space target x~ for per-sample steps (t, m, u); rows with t == u get
    the teacher's direct x0 prediction (endpoint case). Gradients are stopped —
    the teacher is a constant.

    `apply_teacher(x, t)` returns either an eps prediction (x0 is then
    derived by the reference form (x − s·eps)/a) or an `(eps, x0)` PAIR —
    v-parameterized teachers pass natively computed pairs (eps = a·v + s·x,
    x0 = a·x − s·v) so no step of the target math divides by a→0 (the same
    t=T cosine conditioning issue diffusion/samplers.py's native tag_v path
    fixes for sampling)."""
    x_t = x_t.astype(jnp.float32)

    def _eps_x0(x, tt, a, s):
        res = apply_teacher(x, tt)
        if isinstance(res, tuple):
            eps, x0 = (r.astype(jnp.float32) for r in res)
        else:
            eps = res.astype(jnp.float32)
            x0 = (x - s * eps) / a
        return eps, x0

    a_t, s_t = _a_s(schedule, t, x_t.ndim)
    eps1, x0_1 = _eps_x0(x_t, t, a_t, s_t)

    a_m, s_m = _a_s(schedule, m, x_t.ndim)
    x_m = a_m * x0_1 + s_m * eps1
    eps2, x0_2 = _eps_x0(x_m, m, a_m, s_m)

    a_u, s_u = _a_s(schedule, u, x_t.ndim)
    z = a_u * x0_2 + s_u * eps2

    ratio = s_u / s_t
    denom = a_u - ratio * a_t          # == 0 exactly when t == u
    is_step = (t > u)
    while is_step.ndim < x_t.ndim:
        is_step = is_step[..., None]
    safe_denom = jnp.where(is_step, denom, 1.0)
    x_tilde = jnp.where(is_step, (z - ratio * x_t) / safe_denom, x0_1)
    return jax.lax.stop_gradient(x_tilde)


def make_distill_step(apply_fn: Callable, schedule, tx, *,
                      step_list: List[int],
                      objective=None,
                      grad_clip_norm: Optional[float] = None) -> Callable:
    """Build the jitted distillation step.

    apply_fn(params, x, t, labels) -> eps prediction (the same callable the
    trainers use). Returned step: (state, teacher_params, batch, rng) ->
    (new_state, metrics); batch = {"image" [, "labels"] [, "cond_img"]} with
    the trainers' uint8-or-float pixel convention.

    objective=Objective.V distills a v-parameterized teacher into a
    v-parameterized student: both models' (eps, x0) are derived NATIVELY
    from v (eps = a·v + s·x, x0 = a·x − s·v — no division by a→0) inside
    the same x0-space target math — checkpoints stay v-models, so the
    exported bundle keeps its "objective": "V" tag and samples through the
    native tag_v path."""
    from sdm_tpu.enums import Objective
    v_mode = objective == Objective.V
    pairs = jnp.asarray(distill_pairs(step_list))  # (P, 3)
    n_rows = int(pairs.shape[0])

    def _denorm(x):
        if x is not None and x.dtype == jnp.uint8:
            return (x.astype(jnp.float32) - 127.5) / 127.5
        return x

    def _loss(params, teacher_params, batch: Dict[str, jnp.ndarray],
              rng: jax.Array):
        images = _denorm(batch["image"]).astype(jnp.float32)
        labels = batch.get("labels")
        cond_img = _denorm(batch.get("cond_img"))
        n = images.shape[0]

        def _cat(x):
            if cond_img is None:
                return x
            return jnp.concatenate([x, cond_img.astype(x.dtype)], axis=-1)

        idx_key, eps_key = jax.random.split(rng)
        # Tests may inject "row" (pair index) / "eps" through the batch for
        # deterministic numeric checks, like the trainers' "t"/"eps" hooks.
        if "row" in batch:
            i = batch["row"].astype(jnp.int32)
        else:
            # Intervals uniform; the endpoint row (teacher's own x0 at the
            # final step — near-trivial since the student starts AS the
            # teacher) is capped at 10% so late phases with few intervals
            # don't spend a third of every batch on it.
            ikey, ekey = jax.random.split(idx_key)
            i = jax.random.randint(ikey, (n,), 0, n_rows - 1,
                                    dtype=jnp.int32)
            endpoint_p = min(0.1, 1.0 / n_rows)
            at_end = jax.random.bernoulli(ekey, endpoint_p, (n,))
            i = jnp.where(at_end, n_rows - 1, i)
        t, m, u = pairs[i, 0], pairs[i, 1], pairs[i, 2]
        if "eps" in batch:
            eps = batch["eps"].astype(jnp.float32)
        else:
            eps = jax.random.normal(eps_key, images.shape, jnp.float32)

        x_t = schedule.q_sample(images, t, eps)
        if v_mode:
            # Native (eps, x0) pair from v — both well-conditioned at every
            # t, like the samplers' tag_v path (diffusion/vpred.py).
            def teacher(x, tt):
                v = apply_fn(teacher_params, _cat(x), tt,
                             labels).astype(jnp.float32)
                a, s = _a_s(schedule, tt, x.ndim)
                return a * v + s * x, a * x - s * v
        else:
            teacher = lambda x, tt: apply_fn(teacher_params, _cat(x), tt,
                                             labels)
        x_tilde = distill_target(teacher, schedule, x_t, t, m, u)

        out = apply_fn(params, _cat(x_t), t, labels).astype(jnp.float32)
        a_t, s_t = _a_s(schedule, t, x_t.ndim)
        if v_mode:
            x0_hat = a_t * x_t - s_t * out
        else:
            x0_hat = (x_t - s_t * out) / a_t

        abar = schedule.alpha_bar_at(t).astype(jnp.float32)
        w = jnp.maximum(abar / (1.0 - abar), 1.0)          # truncated SNR
        per_sample = jnp.mean(jnp.square(x0_hat - x_tilde),
                              axis=tuple(range(1, x_t.ndim)))
        return jnp.mean(w * per_sample)

    def distill_step(state: TrainState, teacher_params,
                     batch: Dict[str, jnp.ndarray], rng: jax.Array):
        loss, grads = jax.value_and_grad(_loss)(state.params, teacher_params,
                                                batch, rng)
        if grad_clip_norm is not None:
            # Same direct pre-Adam clip as make_train_step (train/step.py):
            # the truncated-SNR weight reaches ~SNR(t_min) (hundreds), so a
            # rare low-t-heavy batch can spike the gradient and poison the
            # Adam moments — the trainer-documented divergence mode (README
            # grad-clip section) observed on the converged flagship distill.
            gnorm = optax.global_norm(grads)
            scale = jnp.minimum(
                1.0, jnp.float32(grad_clip_norm) / jnp.maximum(gnorm, 1e-12))
            grads = jax.tree.map(lambda g: g * scale, grads)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(step=state.step + 1, params=new_params,
                               opt_state=new_opt, ema_params=state.ema_params)
        return new_state, {"loss": loss}

    return distill_step


def run_distillation(config_dict: dict, *, teacher_checkpoint: str,
                     start_step_size: Optional[int] = None,
                     phases: int = 2,
                     steps_per_phase: int = 2000,
                     distill_lr: Optional[float] = None,
                     num_devices: Optional[int] = None,
                     dataset_kind: str = "auto",
                     use_ema_teacher: bool = False,
                     log=logging.info) -> dict:
    """Drive P halving phases from a trained eps-model checkpoint.

    `config_dict` is the reference-format training config (dataset, model
    architecture, schedule, out_dir). The teacher is assumed good at DDIM
    step size `start_step_size` (default: the config's skip_step); phase p
    trains a student on step size start * 2^(p+1). Each phase writes a
    reference-format checkpoint `distilled_ss{N}_{steps}.pt` under
    out_dir/checkpoint/, exportable via export_models unchanged.

    Returns {"phase_step_sizes", "phase_losses", "params", "state"}.
    """
    import glob as _glob
    import os

    from sdm_tpu.data import (ConditionalImgDataset, DataLoader,
                              DoodleImgDataset, ImageDataset)
    from sdm_tpu.io.checkpoint import (diffusion_checkpoint_dict,
                                       load_checkpoint,
                                       load_params_from_checkpoint,
                                       save_model)
    from sdm_tpu.models import UNet
    from sdm_tpu.ops.schedules import make_schedule
    from sdm_tpu.parallel import shard_batch
    from sdm_tpu.parallel.mesh import auto_data_mesh

    # v-parameterized teachers (config "objective": "V") distill into
    # v-parameterized students: make_distill_step converts both model
    # outputs to eps at their steps before the shared x0-space target math.
    from sdm_tpu.enums import Objective
    objective = (Objective.V
                 if str(config_dict.get("objective", "")).upper() == "V"
                 else Objective.EPS)
    out_dir = config_dict["out_dir"]
    os.makedirs(out_dir, exist_ok=True)
    seed = int(config_dict.get("seed", 0))
    batch_size = config_dict["batch_size"]
    min_noise = config_dict["min_noise_step"]
    max_noise = config_dict["max_noise_step"]
    ss0 = int(start_step_size if start_step_size is not None
              else config_dict["skip_step"])
    if phases < 1:
        raise ValueError("phases must be >= 1")
    if ss0 < 1 or ss0 * 2 ** phases > max_noise - min_noise + 1:
        raise ValueError(
            f"start step size {ss0} halved {phases} times exceeds the "
            f"[{min_noise}, {max_noise}] trajectory")

    # Dataset (same construction rules as the trainers). dataset_kind
    # "auto" follows the base trainer (conditional TinyDB when the config
    # says use_conditional, else glob); "doodle" selects the doodle pairs
    # dataset for distilling a doodle-conditioned eps model (the step
    # channel-concats batch["cond_img"] exactly like the trainer).
    use_conditional = bool(config_dict.get("use_conditional"))
    cache = bool(config_dict.get("cache_dataset", False))
    dataset_path = config_dict["dataset_path"]
    if dataset_kind == "doodle":
        dataset = DoodleImgDataset(dataset_path=dataset_path, seed=seed,
                                   cache_decoded=cache, normalized=False)
    elif use_conditional or dataset_kind == "conditional":
        dataset = ConditionalImgDataset(dataset_path=dataset_path, seed=seed,
                                        cache_decoded=cache, normalized=False)
    else:
        img_list = _glob.glob(dataset_path)
        if len(img_list) == 0:
            raise Exception("No dataset found!")
        dataset = ImageDataset(img_paths=img_list, cache_decoded=cache,
                               normalized=False)
    loader = DataLoader(dataset, batch_size=batch_size, shuffle=True,
                        num_workers=8, seed=seed,
                        native_decode=bool(
                            config_dict.get("native_decode", True)))

    compute_dtype = {"bfloat16": jnp.bfloat16, "float32": None,
                     "fp32": None, "bf16": jnp.bfloat16}[
                         str(config_dict.get("compute_dtype",
                                             "bfloat16")).lower()]
    net = UNet.from_config(config_dict, dtype=compute_dtype)

    beta_1 = config_dict.get("beta1", 5e-3)
    beta_T = config_dict.get("betaT", 9e-3)
    schedule = make_schedule(config_dict["noise_scheduler"],
                             beta_1=beta_1 if beta_1 is not None else 5e-3,
                             beta_T=beta_T if beta_T is not None else 9e-3,
                             max_noise_step=max_noise)

    # Teacher init from the reference-format checkpoint.
    rng = jax.random.PRNGKey(seed)
    rng, init_rng = jax.random.split(rng)
    probe = dataset[0]["image"]
    h, w = probe.shape[0], probe.shape[1]
    init_x = jnp.zeros((1, h, w, net.in_channel), jnp.float32)
    init_cond = (jnp.zeros((1, net.cond_dim), jnp.float32)
                 if net.cond_dim is not None else None)
    params = net.init(init_rng, init_x, jnp.array([1], jnp.int32),
                      init_cond)["params"]
    ok, ckpt = load_checkpoint(teacher_checkpoint, log=log)
    if not ok:
        raise Exception("An error occured while loading model checkpoint!")
    if use_ema_teacher and "ema" not in ckpt:
        raise ValueError(
            "use_ema_teacher: checkpoint carries no 'ema' key (train with "
            "config ema_decay to produce one)")
    teacher_params = jax.tree.map(
        jnp.asarray, load_params_from_checkpoint(
            ckpt, params, log=log,
            key="ema" if use_ema_teacher else "model"))

    lr = float(distill_lr if distill_lr is not None
               else config_dict["diffusion_lr"])
    lr_steps = int(config_dict["lr_steps"])
    grad_clip_norm = config_dict.get("grad_clip_norm")
    if grad_clip_norm is not None:
        grad_clip_norm = float(grad_clip_norm)
        log(f"Gradient clipping (global L2 norm): {grad_clip_norm}")
    mesh = auto_data_mesh(batch_size, num_devices)
    apply_fn = lambda p, x, t, l: net.apply({"params": p}, x, t, l)

    phase_losses: List[float] = []
    phase_sizes: List[int] = []
    state = None
    if bool(config_dict.get("device_dataset", False)):
        # Device-resident batches (config "device_dataset": true — the same
        # lever as the trainer's fused loop, train/loop.py _run_fused_loop):
        # the decoded uint8 dataset ships to device memory ONCE and each
        # step gathers its rows on-device from a host-side permutation
        # stream, so per-step host->device traffic is an index vector
        # instead of the pixel batch. On a tunnel-attached device that
        # transfer dominated the distillation step.
        from jax.sharding import NamedSharding, PartitionSpec as P
        load_loader = DataLoader(
            dataset, batch_size=min(512, len(dataset)), shuffle=False,
            num_workers=8, drop_last=False,
            native_decode=bool(config_dict.get("native_decode", True)))
        parts = {}
        for b in load_loader:
            for k, v in b.items():
                if isinstance(v, np.ndarray):
                    parts.setdefault(k, []).append(v)
        host_data = {k: np.concatenate(v, axis=0) for k, v in parts.items()}
        n_rows = host_data["image"].shape[0]
        data_dev = {k: jax.device_put(v, NamedSharding(mesh, P()))
                    for k, v in host_data.items()}
        gather_shardings = {
            k: NamedSharding(mesh, P(*(("data",) + (None,) * (v.ndim - 1))))
            for k, v in host_data.items()}
        gather = jax.jit(
            lambda data, idx: {k: jnp.take(v, idx, axis=0)
                               for k, v in data.items()},
            out_shardings=gather_shardings)
        perm_rng = np.random.default_rng((int(seed) + 0x51ED2705) % 2 ** 63)
        idx_buf = np.empty((0,), np.int64)
        log(f"Device-resident dataset: {n_rows:,} rows "
            f"({sum(v.nbytes for v in host_data.values()) / 2 ** 20:.1f} "
            "MiB) in device memory.")

        def next_batch():
            nonlocal idx_buf
            while idx_buf.size < batch_size:
                idx_buf = np.concatenate(
                    [idx_buf, perm_rng.permutation(n_rows)])
            idx, idx_buf = idx_buf[:batch_size], idx_buf[batch_size:]
            return gather(data_dev, jnp.asarray(idx))
    else:
        batch_iter = iter(loader)

        def next_batch():
            nonlocal batch_iter
            try:
                b = next(batch_iter)
            except StopIteration:
                batch_iter = iter(loader)
                b = next(batch_iter)
            arrays = {k: v for k, v in b.items()
                      if isinstance(v, np.ndarray)}
            return shard_batch(arrays, mesh)

    global_steps = 0
    for p in range(phases):
        ss = ss0 * 2 ** (p + 1)
        step_list = ddim_step_list(min_noise, max_noise, ss)
        log(f"Distillation phase {p + 1}/{phases}: student step size {ss} "
            f"({len(step_list)} visited steps), teacher step size {ss // 2}")
        tx = make_optimizer(lr, lr_steps)
        state = create_train_state(jax.tree.map(jnp.array, teacher_params), tx)
        step_fn = jax.jit(
            make_distill_step(apply_fn, schedule, tx, step_list=step_list,
                              objective=objective,
                              grad_clip_norm=grad_clip_norm),
            donate_argnums=(0,))

        last = float("nan")
        total = 0.0
        for i in range(steps_per_phase):
            rng, step_rng = jax.random.split(rng)
            state, metrics = step_fn(state, teacher_params, next_batch(),
                                     step_rng)
            global_steps += 1
            if (i + 1) % 50 == 0 or i + 1 == steps_per_phase:
                last = float(metrics["loss"])
                if np.isnan(last):
                    raise Exception("NaN encountered during training")
                total = last
                log("Phase {} | Steps: {:,} / {:,} | Distill: {:.6f}".format(
                    p + 1, i + 1, steps_per_phase, last))
        phase_losses.append(total)
        phase_sizes.append(ss)

        ckpt_dict = diffusion_checkpoint_dict(
            jax.tree.map(np.asarray, state.params), state.opt_state, lr=lr)
        save_model(ckpt_dict, f"distilled_ss{ss}", out_dir, checkpoint=True,
                   steps=global_steps, log=log)
        teacher_params = state.params  # student becomes the next teacher

    return {"phase_step_sizes": phase_sizes, "phase_losses": phase_losses,
            "params": state.params, "state": state,
            "global_steps": global_steps}
