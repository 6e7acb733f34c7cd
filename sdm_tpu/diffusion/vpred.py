"""Velocity ("v") parameterization (Salimans & Ho 2022, eq. 9).

A TPU-build extension beyond the reference (its four trainers cover
eps/x0/residual only — train_diffusion.py:350-352 etc.). With
a_t = sqrt(abar_t), s_t = sqrt(1 - abar_t) and x_t = a_t·x0 + s_t·eps:

    v   = a_t·eps − s_t·x0          (training target)
    eps = a_t·v + s_t·x_t           (exact inversion given x_t)
    x0  = a_t·x_t − s_t·v

v-prediction keeps the target unit-variance across ALL noise levels (eps
collapses to the input at t→T, x0 at t→0), which is what makes few-step
students and progressive distillation stable — and it costs nothing at
sampling time. Two routes exist:

  - NATIVE (default for bundles/previews): `tag_v` marks a model_fn with
    `model_output = "v"`; the eps-family samplers (ddpm/ddim/dpmpp in
    diffusion/samplers.py) detect the tag at trace time and derive
    x0 = a·x − s·v and eps = a·v + s·x directly — BOTH well-conditioned at
    every t. The tag rides the existing model_fn interface, so ensembles,
    CFG, img2img, inpainting, serving, and pipeline sampling all work with
    zero signature changes.
  - ADAPTER (kept for interop/tests): `as_eps_factory` converts a v-model
    into the eps interface. Algebraically identical, but a downstream
    x0 = (x − s·eps)/a (the reference's DDIM form) then hits catastrophic
    cancellation as a→0 — at t=T under the COSINE schedule the recovered
    x0 loses all precision, which the native route avoids (pinned by
    tests/test_vpred.py::test_native_v_is_well_conditioned_at_t_max).

Bundles tag v-models with "objective": "V" (written by export_models from
the training config; read by io/bundles.build_model_from_bundle, which
applies `tag_v_factory`).
"""

from __future__ import annotations

import jax.numpy as jnp


def _a_s(schedule, t, ndim: int):
    """(sqrt(abar_t), sqrt(1-abar_t)) broadcast to an `ndim`-dim tensor."""
    abar = schedule.alpha_bar_at(t).astype(jnp.float32)
    abar = abar.reshape(abar.shape + (1,) * (ndim - abar.ndim))
    return abar ** 0.5, (1.0 - abar) ** 0.5


def v_target(schedule, t, x0: jnp.ndarray, eps: jnp.ndarray) -> jnp.ndarray:
    """The regression target v = a·eps − s·x0 at per-sample steps t."""
    a, s = _a_s(schedule, t, x0.ndim)
    return a * eps - s * x0


def eps_from_v(schedule, t, x_t: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    a, s = _a_s(schedule, t, x_t.ndim)
    return a * v + s * x_t


def x0_from_v(schedule, t, x_t: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    a, s = _a_s(schedule, t, x_t.ndim)
    return a * x_t - s * v


def tag_v(model_fn):
    """Mark `model_fn` as v-predicting for the samplers' NATIVE path.

    Returns a pass-through wrapper carrying `model_output = "v"`; the
    eps-family samplers read the attribute at trace time (it is a static
    Python string, never traced) and switch to the well-conditioned
    conversion x0 = a·x − s·v, eps = a·v + s·x. Wrapping (instead of
    setting the attribute on the caller's callable) keeps the input
    object unmutated."""
    def v_fn(x, t, labels):
        return model_fn(x, t, labels)
    v_fn.model_output = "v"
    return v_fn


def tag_v_factory(model_fn_factory):
    """Factory-level `tag_v` (params stay a jit argument — io/bundles.py)."""
    def factory(p):
        return tag_v(model_fn_factory(p))
    return factory


def as_eps_model(model_fn, schedule):
    """Wrap a v-predicting model_fn(x, t, labels) into the eps-predicting
    interface the samplers consume. `x` may carry concatenated conditioning
    channels (doodle/SR); only the leading out-channel block is x_t, so the
    conversion slices to the model's own output width."""
    def eps_fn(x, t, labels):
        v = model_fn(x, t, labels).astype(jnp.float32)
        x_t = x[..., :v.shape[-1]].astype(jnp.float32)
        return eps_from_v(schedule, t, x_t, v)
    return eps_fn


def as_eps_factory(model_fn_factory, schedule):
    """Factory-level wrapper (params stay a jit argument — io/bundles.py)."""
    def factory(p):
        return as_eps_model(model_fn_factory(p), schedule)
    return factory
