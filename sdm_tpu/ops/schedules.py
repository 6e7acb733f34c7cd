"""Forward-process noise schedules as jit-friendly pytrees.

Capability parity with /root/reference/degraders.py:
  - LinearSchedule  ~ NoiseDegradation (degraders.py:10-59): beta is a
    (T+1)-entry linspace so step indices 0..T index directly
    (degraders.py:26-30); alpha = 1-beta; alpha_bar = cumprod(alpha).
  - CosineSchedule  ~ CosineNoiseDegradation (degraders.py:63-104):
    Nichol-Dhariwal cosine alpha_bar computed on the fly (offset 0.008),
    beta = 1 - alpha_bar(t)/alpha_bar(t-1) clipped to [0.001, 0.999].

Unlike the reference (which owns a device and draws its own noise), these are
pure functions over explicit arrays: q_sample(img, steps, eps) takes the noise
as an argument so it can fuse directly into a jitted train step, and the whole
schedule is a flax.struct pytree that can be closed over by `lax.scan` sampler
bodies or passed through `jax.jit` boundaries.

Layout note: images are NHWC (TPU-native) — broadcasting uses [:, None, None, None]
on the batch axis exactly as the reference does for NCHW (degraders.py:56), which
is layout-agnostic.
"""

from __future__ import annotations

import math
from typing import Tuple, Union

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class LinearSchedule:
    """Linear beta schedule (DDPM-style) with precomputed tables."""

    beta: jnp.ndarray       # (T+1,)
    alpha: jnp.ndarray      # (T+1,)
    alpha_bar: jnp.ndarray  # (T+1,)
    beta_1: float = struct.field(pytree_node=False, default=5e-3)
    beta_T: float = struct.field(pytree_node=False, default=9e-3)
    max_noise_step: int = struct.field(pytree_node=False, default=1000)

    @classmethod
    def create(cls, beta_1: float, beta_T: float, max_noise_step: int,
               dtype=jnp.float32) -> "LinearSchedule":
        # T+1 entries so step indices 0..T are valid directly
        # (parity: degraders.py:26-30).
        beta = jnp.linspace(beta_1, beta_T, int(max_noise_step) + 1, dtype=dtype)
        alpha = 1.0 - beta
        alpha_bar = jnp.cumprod(alpha, axis=0)
        return cls(beta=beta, alpha=alpha, alpha_bar=alpha_bar,
                   beta_1=float(beta_1), beta_T=float(beta_T),
                   max_noise_step=int(max_noise_step))

    def timestep_params(self, steps) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        steps = jnp.asarray(steps)
        return self.beta[steps], self.alpha[steps], self.alpha_bar[steps]

    def alpha_bar_at(self, steps) -> jnp.ndarray:
        return self.alpha_bar[jnp.asarray(steps)]

    def q_sample(self, img: jnp.ndarray, steps, eps: jnp.ndarray) -> jnp.ndarray:
        """x_t = sqrt(alpha_bar_t) * x_0 + sqrt(1 - alpha_bar_t) * eps."""
        return _q_sample(self.alpha_bar_at(steps), img, eps)


@struct.dataclass
class CosineSchedule:
    """Nichol-Dhariwal cosine schedule; alpha_bar computed in-register (no tables)."""

    max_noise_step: int = struct.field(pytree_node=False, default=1000)
    offset: float = struct.field(pytree_node=False, default=0.008)

    @classmethod
    def create(cls, max_noise_step: int) -> "CosineSchedule":
        return cls(max_noise_step=int(max_noise_step))

    def alpha_bar_at(self, steps) -> jnp.ndarray:
        steps = jnp.asarray(steps, dtype=jnp.float32)
        half_pi = math.pi / 2
        f_t = jnp.cos(((steps / self.max_noise_step + self.offset)
                       / (1.0 + self.offset)) * half_pi) ** 2
        f_0 = math.cos((self.offset / (1.0 + self.offset)) * half_pi) ** 2
        return f_t / f_0

    def timestep_params(self, steps) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        steps = jnp.asarray(steps)
        alpha_bar = self.alpha_bar_at(steps)
        alpha_bar_prev = self.alpha_bar_at(steps - 1)
        beta = 1.0 - (alpha_bar / alpha_bar_prev)
        beta = jnp.clip(beta, 0.001, 0.999)
        alpha = 1.0 - beta
        return beta, alpha, alpha_bar

    def q_sample(self, img: jnp.ndarray, steps, eps: jnp.ndarray) -> jnp.ndarray:
        return _q_sample(self.alpha_bar_at(steps), img, eps)


Schedule = Union[LinearSchedule, CosineSchedule]


def _q_sample(alpha_bar: jnp.ndarray, img: jnp.ndarray, eps: jnp.ndarray) -> jnp.ndarray:
    alpha_bar = alpha_bar.astype(img.dtype)
    while alpha_bar.ndim < img.ndim:
        alpha_bar = alpha_bar[..., None]
    return alpha_bar ** 0.5 * img + (1.0 - alpha_bar) ** 0.5 * eps


def make_schedule(noise_scheduler: str, *, beta_1: float = 5e-3, beta_T: float = 9e-3,
                  max_noise_step: int = 1000) -> Schedule:
    """Build a schedule from the reference's config vocabulary ("LINEAR"/"COSINE")."""
    name = str(noise_scheduler).upper()
    if name == "LINEAR":
        return LinearSchedule.create(beta_1, beta_T, max_noise_step)
    if name == "COSINE":
        return CosineSchedule.create(max_noise_step)
    raise ValueError("Invalid noise scheduler type.")
