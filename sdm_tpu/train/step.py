"""The jitted training step: q_sample -> forward -> MSE -> grad -> Adam,
fused into one XLA program, data-parallel over a device mesh.

Where the reference runs q_sample / forward / loss under fp16 autocast with a
GradScaler and a host sync every step (/root/reference/train_diffusion.py:
333-366), this fuses the whole step — including the forward-process noising
and the optimizer update — into a single `jax.jit` program. Batches arrive
sharded on the mesh "data" axis; XLA inserts the gradient all-reduce (psum
over ICI) automatically because params are replicated. bf16 compute needs no
loss scaling; the NaN guard lives host-side in the loop (mirroring
train_diffusion.py:354-355) on the asynchronously-fetched loss.

Objectives (SURVEY.md §2.5):
  EPS          eps-prediction, target = noise              (train_diffusion.py:350-352)
  X0           x0-prediction, target = clean image         (train_noise_cold_diffusion.py:340-342)
  RESIDUAL_X0  SR residual, target = x_hr - up(down(x_hr)) (train_SR_diffusion.py:350-374)
  V            velocity, target = a·eps − s·x0             (TPU-build extension, diffusion/vpred.py)

Conditioning:
  labels    — vector conditioning through the model's third arg;
  cond_img  — channel-concat image (doodle: train_doodle_diffusion.py:304);
  SR        — LR image q_sampled at fixed cond_t with the SAME eps as the HR
              branch, channel-concatenated (train_SR_diffusion.py:354-366).

t is drawn per-sample as randint(min_noise_step, max_actual_noise_step) with
EXCLUSIVE high (train_diffusion.py:321-326) — max_actual < max_noise is the
ensemble (eDiff-I style) range-specialization knob.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from sdm_tpu.enums import Objective
from sdm_tpu.ops.resize import area_resize


@struct.dataclass
class TrainState:
    step: jnp.ndarray   # global steps completed (reference "global_steps")
    params: Any
    opt_state: Any
    # EMA of params (config "ema_decay", TPU-build extension; None = off —
    # an empty pytree leaf, so parity-mode states are structurally unchanged).
    ema_params: Any = None


def reference_lr_schedule(base_lr: float, lr_steps: int) -> Callable:
    """LR halving every `lr_steps` global steps, matching the reference's
    post-step halving (train_diffusion.py:368-371): step s uses
    base_lr * 0.5 ** max(0, (s-1) // lr_steps)."""
    def schedule(count):
        exponent = jnp.maximum(0, (count - 1) // lr_steps)
        return base_lr * jnp.power(0.5, exponent.astype(jnp.float32))
    return schedule


def resume_lr_schedule(resume_lr: float, lr_steps: int,
                       resume_step: int) -> Callable:
    """Schedule continuing from a restored optimizer's saved lr.

    torch's optim.load_state_dict restores the param_groups' checkpointed
    lr (train_diffusion.py:219-220), so a reference resume with
    load_diffusion_optim continues at the SAVED lr — even when the config's
    diffusion_lr/lr_steps changed — and keeps halving whenever global_steps
    crosses a multiple of lr_steps. Step resume_step+1 sees exactly
    resume_lr; each later lr_steps boundary halves it."""
    base_halvings = max(0, (resume_step - 1) // lr_steps)

    def schedule(count):
        exponent = jnp.maximum(
            jnp.maximum(0, (count - 1) // lr_steps) - base_halvings, 0)
        return resume_lr * jnp.power(0.5, exponent.astype(jnp.float32))
    return schedule


def make_optimizer(base_lr: float, lr_steps: int,
                   resume_lr: Optional[float] = None,
                   resume_step: int = 0) -> optax.GradientTransformation:
    """Adam(betas=(0.5, 0.999), eps=1e-8) as in train_diffusion.py:214-217.

    resume_lr (from a restored checkpoint's optimizer param_groups) switches
    the schedule to resume_lr_schedule — reference load_state_dict parity."""
    sched = (reference_lr_schedule(base_lr, lr_steps) if resume_lr is None
             else resume_lr_schedule(resume_lr, lr_steps, resume_step))
    return optax.adam(sched, b1=0.5, b2=0.999, eps=1e-8)


def create_train_state(params, tx: optax.GradientTransformation,
                       step: int = 0, ema: bool = False) -> TrainState:
    """Fresh state at `step` (the reference's restored global_steps).

    The LR schedule's count is seeded with `step` so a resumed run applies
    the same halved LR it logs and checkpoints (continued-run semantics —
    also what a torch-side resume with load_diffusion_optim=True sees, since
    exported checkpoints carry the halved lr). Adam's own count stays 0 when
    the optimizer is not being restored, exactly like the reference's fresh
    Adam on resume (train_diffusion.py:214-227); restoring the optimizer
    overwrites all counts (io/torch_interop.torch_adam_to_optax).
    """
    opt_state = tx.init(params)
    if step:
        count = jnp.asarray(step, jnp.int32)

        def seed_schedule(node):
            if hasattr(node, "_fields"):
                if set(node._fields) == {"count"}:
                    return node._replace(count=count)
                return type(node)(*[seed_schedule(x) for x in node])
            if isinstance(node, tuple):
                return tuple(seed_schedule(x) for x in node)
            return node

        opt_state = seed_schedule(opt_state)
    ema_params = jax.tree.map(jnp.array, params) if ema else None
    return TrainState(step=jnp.asarray(step, jnp.int32), params=params,
                      opt_state=opt_state, ema_params=ema_params)


def make_train_step(apply_fn: Callable, schedule, tx: optax.GradientTransformation,
                    *, objective: Objective,
                    min_noise_step: int = 1,
                    max_actual_noise_step: int = 1000,
                    flip_imgs: bool = False,
                    cond_t: Optional[int] = None,
                    lr_dim: Optional[int] = None,
                    grad_accum_steps: int = 1,
                    cfg_drop_prob: float = 0.0,
                    ema_decay: Optional[float] = None,
                    min_snr_gamma: Optional[float] = None,
                    grad_clip_norm: Optional[float] = None) -> Callable:
    """Build the fused train step.

    apply_fn(params, x, t, labels) -> model output.
    batch: {"image": (N,H,W,C) [, "labels": (N,D)] [, "cond_img": (N,H,W,C)]}.
    Returns (new_state, metrics) with metrics["loss"] as an fp32 scalar.

    grad_accum_steps > 1 (config "grad_accum_steps"): the batch arrives
    pre-split as (A, N/A, ...) and a lax.scan accumulates the mean gradient
    over the A microbatches before ONE optimizer update — identical
    semantics to a full-batch step (the MSE mean of means equals the full
    mean), with activation memory of a single microbatch. Lets a chip train
    global batches that would not fit, without changing the config's
    batch_size meaning.

    TPU-build extensions beyond the reference (both default-off, parity
    untouched):
      cfg_drop_prob > 0 — per-sample label dropout to the zero (null) vector
        so the model learns the unconditional branch for classifier-free
        guidance at sampling time (diffusion/guidance.py).
      ema_decay — maintains an exponential moving average of params in the
        state's ema_params (updated after each optimizer step); previews,
        checkpoints, and generators can sample from the averaged weights.
      min_snr_gamma — min-SNR-gamma per-sample loss weighting (Hang et al.
        2023): caps each timestep's effective weight at gamma in SNR terms
        so easy high-SNR (low-noise) samples stop dominating the gradient.
        With SNR(t) = abar/(1-abar), the weight in the model's own output
        space is min(SNR,g)/SNR for EPS, min(SNR,g)/(SNR+1) for V, and
        min(SNR,g) for X0/RESIDUAL_X0. None (default) keeps the reference's
        uniform MSE.
      grad_clip_norm — clip the (accumulated, psum'd) gradient to this
        global L2 norm before the Adam update. Applied to the gradient
        directly rather than via optax.chain so the optimizer state keeps
        the plain-Adam structure torch checkpoints interop with. Motivation:
        at lr >= ~1e-4 with Adam(0.5, 0.999) in bf16 the flagship U-Net can
        hit a rare loss spike that poisons the moments and diverges
        (observed on the shapes converged-run demo, QUALITY.md); one bounded
        update instead of a 1e6-scale one keeps training on track.
    """
    if objective == Objective.RESIDUAL_X0:
        if cond_t is None or lr_dim is None:
            raise ValueError("RESIDUAL_X0 objective needs cond_t and lr_dim")
    if grad_accum_steps < 1:
        raise ValueError("grad_accum_steps must be >= 1")

    def _denorm(x):
        # Batches may arrive as raw uint8 pixels (4x less host->device
        # traffic); normalizing on-device is bit-exact with the host path.
        if x is not None and x.dtype == jnp.uint8:
            return (x.astype(jnp.float32) - 127.5) / 127.5
        return x

    def _loss(params, batch: Dict[str, jnp.ndarray], rng: jax.Array):
        images = _denorm(batch["image"])
        labels = batch.get("labels")
        cond_img = _denorm(batch.get("cond_img"))
        n = images.shape[0]

        if cfg_drop_prob > 0.0:
            t_key, eps_key, flip_key, drop_key = jax.random.split(rng, 4)
            from sdm_tpu.diffusion.guidance import dropout_labels
            labels = dropout_labels(labels, drop_key, cfg_drop_prob)
        else:
            # Parity path: exactly the reference's three draws per step.
            t_key, eps_key, flip_key = jax.random.split(rng, 3)

        if flip_imgs:
            # Per-image random horizontal flip, p=0.5 (train_diffusion.py:312-314)
            # done on-device (W is axis 2 in NHWC) instead of per-image host
            # lambdas — distributionally identical, fully fused.
            flip = jax.random.bernoulli(flip_key, 0.5, (n,))
            images = jnp.where(flip[:, None, None, None],
                               images[:, :, ::-1, :], images)

        # Exclusive-high randint, per-sample (train_diffusion.py:321-326).
        # Tests may inject "t"/"eps" through the batch for cross-framework
        # single-step parity checks.
        if "t" in batch:
            t = batch["t"].astype(jnp.int32)
        else:
            t = jax.random.randint(t_key, (n,), min_noise_step,
                                   max_actual_noise_step, dtype=jnp.int32)
        if "eps" in batch:
            eps = batch["eps"].astype(jnp.float32)
        else:
            eps = jax.random.normal(eps_key, images.shape, jnp.float32)
        images_f = images.astype(jnp.float32)

        if objective == Objective.RESIDUAL_X0:
            h, w = images.shape[1], images.shape[2]
            lr_up = area_resize(area_resize(images_f, lr_dim, lr_dim), h, w)
            target = images_f - lr_up
            x_t = schedule.q_sample(images_f, t, eps)
            cond_t_vec = jnp.array([cond_t], dtype=jnp.int32)
            x_t_lr = schedule.q_sample(lr_up, cond_t_vec, eps)
            x_in = jnp.concatenate([x_t, x_t_lr], axis=-1)
        else:
            x_t = schedule.q_sample(images_f, t, eps)
            x_in = x_t
            if cond_img is not None:
                x_in = jnp.concatenate([x_in, cond_img.astype(x_in.dtype)],
                                       axis=-1)
            if objective == Objective.EPS:
                target = eps
            elif objective == Objective.V:
                # v-parameterization (diffusion/vpred.py; TPU-build
                # extension, config "objective": "V").
                from sdm_tpu.diffusion.vpred import v_target
                target = v_target(schedule, t, images_f, eps)
            else:
                target = images_f

        pred = apply_fn(params, x_in, t, labels)
        sq = jnp.square(pred.astype(jnp.float32) - target)
        if min_snr_gamma is None:
            return jnp.mean(sq)
        g = jnp.float32(min_snr_gamma)
        abar = schedule.alpha_bar_at(t).astype(jnp.float32)
        snr = abar / (1.0 - abar)
        if objective == Objective.EPS:
            w = jnp.minimum(snr, g) / snr
        elif objective == Objective.V:
            w = jnp.minimum(snr, g) / (snr + 1.0)
        else:  # X0 / RESIDUAL_X0 predict in image space
            w = jnp.minimum(snr, g)
        per_sample = jnp.mean(sq, axis=tuple(range(1, sq.ndim)))
        return jnp.mean(w * per_sample)

    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray],
                   rng: jax.Array):
        if grad_accum_steps == 1:
            loss, grads = jax.value_and_grad(_loss)(state.params, batch, rng)
        else:
            keys = jax.random.split(rng, grad_accum_steps)

            def micro(carry, xs):
                g_acc, l_acc = carry
                mb, key = xs
                l, g = jax.value_and_grad(_loss)(state.params, mb, key)
                return (jax.tree.map(jnp.add, g_acc, g), l_acc + l), None

            zeros = jax.tree.map(jnp.zeros_like, state.params)
            (g_sum, l_sum), _ = jax.lax.scan(
                micro, (zeros, jnp.float32(0.0)), (batch, keys))
            grads = jax.tree.map(lambda x: x / grad_accum_steps, g_sum)
            loss = l_sum / grad_accum_steps

        if grad_clip_norm is not None:
            gnorm = optax.global_norm(grads)
            scale = jnp.minimum(
                1.0, jnp.float32(grad_clip_norm) / jnp.maximum(gnorm, 1e-12))
            grads = jax.tree.map(lambda g: g * scale, grads)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_ema = state.ema_params
        if ema_decay is not None and state.ema_params is not None:
            d = jnp.float32(ema_decay)
            new_ema = jax.tree.map(
                lambda e, p: e + (1.0 - d) * (p.astype(e.dtype) - e),
                state.ema_params, new_params)
        new_state = TrainState(step=state.step + 1, params=new_params,
                               opt_state=new_opt_state, ema_params=new_ema)
        return new_state, {"loss": loss}

    return train_step
