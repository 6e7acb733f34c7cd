"""Reverse-process samplers compiled as single on-device `lax.scan` programs.

Capability parity with /root/reference/diffusion_sampling_algorithms.py, but
where the reference runs a Python loop with a host round-trip per denoising
step (one model call + progress-bar print per step, :21-63), these compile the
entire T-step trajectory into one XLA program: the step vector is precomputed,
schedule parameters are gathered in-register, and `jax.random` keys are
threaded through the scan carry. No host transfers until the final image.

Algorithm parity notes (all asserted in tests/test_samplers.py):
  - ddpm_sample: sigma_t = sqrt(beta_t) (fixed-small variance choice, :48);
    z ~ N(0,I) only when t > 1 (:42-45);
    x_{t-1} = (1/sqrt(a))(x_t - ((1-a)/sqrt(1-abar)) eps_hat) + sigma z (:51-55).
  - ddim_sample: step list range(max, min-1, -size) with min appended if
    missed (:79-82); eta = 0 by default (deterministic, :84-86); final visit
    returns x0_approx when the last step is exactly 1, else x_t (:146-148).
  - cold_sample: model predicts x0; the injected `noise` tensor is held fixed
    for the whole trajectory (:155,:196,:204); improved cold update
    x_{t-1} = x_t - D(x0_hat, t) + D(x0_hat, t-1) (:193-208); returns the
    final x0_hat (:217).

`model_fn(x, t, labels)` is any callable closing over params — typically
`lambda x, t, l: net.apply({"params": p}, x, t, l)`. Conditional images are
channel-concatenated on the last (C) axis, mirroring the reference's dim=1
concat in NCHW (:28-31).

v-parameterized models (TPU-build extension, diffusion/vpred.py): a model_fn
carrying the attribute `model_output = "v"` (set by `vpred.tag_v`) is
consumed NATIVELY by the eps-family samplers here — with a = sqrt(abar_t),
s = sqrt(1-abar_t) they derive eps = a·v + s·x and x0 = a·x − s·v, both
well-conditioned at every t (the reference's x0 = (x − s·eps)/a form loses
all precision as a→0, e.g. at t=T under COSINE). The attribute is a static
Python string read at trace time; absent means "eps" and every formula below
stays bit-identical to the reference parity path.
"""

from __future__ import annotations

from typing import Callable, List, Optional

import jax
import jax.numpy as jnp
from jax import lax

ModelFn = Callable[..., jnp.ndarray]


def ddim_step_list(min_noise: int, max_noise: int, step_size: int) -> List[int]:
    """Skip-step schedule with the reference's append-min rule
    (diffusion_sampling_algorithms.py:79-82, :164-168)."""
    steps = list(range(max_noise, min_noise - 1, -step_size))
    if min_noise not in steps:
        steps = steps + [min_noise]
    return steps


def karras_step_list(min_noise: int, max_noise: int, n_steps: int,
                     schedule, rho: float = 7.0) -> List[int]:
    """Karras et al. (2022) rho-spaced step list, mapped onto this
    framework's integer timesteps (TPU-build extension — the reference only
    has the uniform skip list, diffusion_sampling_algorithms.py:79-82).

    The EDM noise level of step t is sigma_edm(t) = sqrt(1-abar_t)/
    sqrt(abar_t); the rho-warped grid spends most of its (few) steps at low
    noise where trajectory curvature concentrates:

        sigma_i = (smax^(1/rho) + i/(n-1) (smin^(1/rho) - smax^(1/rho)))^rho

    Each sigma_i is snapped to the nearest integer timestep (nearest in
    log-sigma), then deduplicated keeping order. Endpoints are pinned to
    max_noise / min_noise exactly, so the list composes with ensemble
    chaining and the x0-at-step-1 return rule like ddim_step_list output.
    """
    if n_steps < 2:
        return [max_noise] if max_noise == min_noise else [max_noise,
                                                           min_noise]
    import numpy as np
    ts = np.arange(min_noise, max_noise + 1)
    abar = np.asarray(schedule.alpha_bar_at(jnp.asarray(ts)), np.float64)
    log_sig = 0.5 * (np.log1p(-abar) - np.log(abar))   # log sigma_edm(t)
    smin, smax = np.exp(log_sig[0]), np.exp(log_sig[-1])
    grid = np.linspace(0.0, 1.0, n_steps)
    sig = (smax ** (1.0 / rho)
           + grid * (smin ** (1.0 / rho) - smax ** (1.0 / rho))) ** rho
    # log_sig is increasing in t; snap each target to the nearest t.
    idx = np.abs(log_sig[None, :] - np.log(sig)[:, None]).argmin(axis=1)
    steps = [int(ts[i]) for i in idx]
    steps[0], steps[-1] = max_noise, min_noise
    out: List[int] = []
    for s in steps:
        if not out or s < out[-1]:
            out.append(s)
    # steps[-1] is pinned to min_noise and ts is bounded below by it, so the
    # dedup above can never drop the endpoint.
    assert out[-1] == min_noise
    return out


def karras_steps_matching(min_noise: int, max_noise: int, step_size: int,
                          schedule, rho: float = 7.0) -> List[int]:
    """Karras rho-spaced step list with the SAME step count as the uniform
    ddim_step_list(min_noise, max_noise, step_size) — the drop-in spacing
    swap behind the generator CLIs' and the serving engine's --karras."""
    n_steps = len(ddim_step_list(min_noise, max_noise, step_size))
    return karras_step_list(min_noise, max_noise, n_steps, schedule, rho=rho)


def _concat_cond(x: jnp.ndarray, cond_img: Optional[jnp.ndarray]) -> jnp.ndarray:
    if cond_img is None:
        return x
    return jnp.concatenate([x, cond_img.astype(x.dtype)], axis=-1)


def _model_output(model_fn: ModelFn) -> str:
    """The model's output parameterization: "eps" (default) or "v"
    (vpred.tag_v). Static — resolved once at trace time."""
    mo = str(getattr(model_fn, "model_output", "eps")).lower()
    if mo not in ("eps", "v"):
        raise ValueError(f"unsupported model_output tag {mo!r} "
                         "(expected 'eps' or 'v')")
    return mo


def _to_eps_x0(raw: jnp.ndarray, x: jnp.ndarray, abar_t: jnp.ndarray,
               model_output: str):
    """(eps_hat, x0_hat) in fp32 from the model's raw output at abar_t.

    eps models keep the reference's exact expressions (bit-identical parity:
    x0 = (x − s·eps)/a, diffusion_sampling_algorithms.py:109-112); v models
    use x0 = a·x − s·v, eps = a·v + s·x — no division, well-conditioned
    everywhere (vpred module docstring)."""
    s = (1.0 - abar_t) ** 0.5
    if model_output == "v":
        a = abar_t ** 0.5
        return a * raw + s * x, a * x - s * raw
    return raw, (x - s * raw) / abar_t ** 0.5


def _inpaint_ctx(inpaint_known, inpaint_mask, inpaint_noise):
    """Validate + fp32-cast the RePaint-style inpainting inputs shared by
    ddim_sample / dpmpp_sample / heun_sample (TPU-build extension). Returns
    (known, mask, noise) or None when inpainting is off."""
    if inpaint_known is None:
        return None
    if inpaint_mask is None or inpaint_noise is None:
        raise ValueError(
            "inpainting needs inpaint_known, inpaint_mask AND "
            "inpaint_noise together")
    return (inpaint_known.astype(jnp.float32),
            inpaint_mask.astype(jnp.float32),
            inpaint_noise.astype(jnp.float32))


def _inpaint_project(ctx, schedule, x_new, t):
    """Project the known region onto its forward marginal at step `t`
    (RePaint per-step projection; shared degradation noise keeps
    deterministic samplers deterministic)."""
    known, mask, pnoise = ctx
    return (1.0 - mask) * x_new + mask * schedule.q_sample(known, t, pnoise)


def _inpaint_finalize(ctx, schedule, x0_approx, x_t, t_last):
    """Blend the final x0 back to the known pixels, and keep x_t projected
    so ensemble chaining stays consistent with the known region."""
    known, mask, _ = ctx
    x0_approx = (1.0 - mask) * x0_approx + mask * known
    x_t = _inpaint_project(ctx, schedule, x_t, t_last)
    return x0_approx, x_t


def ddpm_sample(model_fn: ModelFn, schedule, x_t: jnp.ndarray, *,
                rng: Optional[jax.Array] = None,
                min_noise: int = 1, max_noise: int = 1000,
                cond_img: Optional[jnp.ndarray] = None,
                labels: Optional[jnp.ndarray] = None,
                zs: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """DDPM ancestral sampling, whole trajectory in one scan.

    `zs` optionally injects the per-step gaussian noise (shape
    (num_steps, *x.shape)) for deterministic parity tests; otherwise noise is
    drawn from `rng` inside the scan.
    """
    mo = _model_output(model_fn)
    steps = jnp.arange(max_noise, min_noise - 1, -1, dtype=jnp.int32)
    num_steps = steps.shape[0]
    if zs is None:
        if rng is None:
            raise ValueError("ddpm_sample needs rng (or injected zs)")
        keys = jax.random.split(rng, num_steps)
        xs = (steps, keys)
    else:
        xs = (steps, zs)

    def body(x, scan_x):
        t, noise_src = scan_x
        tvec = t[None]
        beta, alpha, alpha_bar = schedule.timestep_params(tvec)
        raw = model_fn(_concat_cond(x, cond_img), tvec, labels)
        eps_hat, _ = _to_eps_x0(raw.astype(jnp.float32),
                                x.astype(jnp.float32),
                                alpha_bar.astype(jnp.float32), mo)
        if zs is None:
            z = jax.random.normal(noise_src, x.shape, jnp.float32)
        else:
            z = noise_src.astype(jnp.float32)
        sigma = beta.astype(jnp.float32) ** 0.5
        scale_1 = 1.0 / alpha.astype(jnp.float32) ** 0.5
        scale_2 = (1.0 - alpha.astype(jnp.float32)) / (
            (1.0 - alpha_bar.astype(jnp.float32)) ** 0.5)
        x = x.astype(jnp.float32)
        x_new = scale_1 * (x - scale_2 * eps_hat)
        # z only when t > 1 (diffusion_sampling_algorithms.py:42-45).
        x_new = x_new + jnp.where(t > 1, sigma, 0.0) * z
        return x_new, None

    x_out, _ = lax.scan(body, x_t.astype(jnp.float32), xs)
    return x_out


def ddim_sample(model_fn: ModelFn, schedule, x_t: jnp.ndarray, *,
                min_noise: int = 1, max_noise: int = 1000,
                ddim_step_size: int = 10,
                cond_img: Optional[jnp.ndarray] = None,
                labels: Optional[jnp.ndarray] = None,
                eta: float = 0.0,
                rng: Optional[jax.Array] = None,
                zs: Optional[jnp.ndarray] = None,
                inpaint_known: Optional[jnp.ndarray] = None,
                inpaint_mask: Optional[jnp.ndarray] = None,
                inpaint_noise: Optional[jnp.ndarray] = None,
                steps: Optional[List[int]] = None) -> jnp.ndarray:
    """DDIM sampling (eta=0 deterministic by default, matching the reference's
    hardcoded choice, :84-86). For eta > 0 the per-step gaussian noise comes
    from `rng`, or can be injected via `zs` (shape (len(steps)-1, *x.shape))
    for deterministic numeric tests — the same injection design as
    ddpm_sample.

    Inpainting (TPU-build extension, RePaint-style projection with a shared
    degradation noise so eta=0 stays deterministic): where `inpaint_mask` is
    1 the trajectory is projected onto q_sample(inpaint_known, t-1,
    inpaint_noise) after every update, and the final x0 is blended back to
    the known pixels — the model only synthesizes the mask==0 region,
    conditioned on the known context at every step."""
    mo = _model_output(model_fn)
    steps = (list(steps) if steps is not None
             else ddim_step_list(min_noise, max_noise, ddim_step_size))
    if eta != 0.0 and rng is None and zs is None:
        raise ValueError("eta > 0 needs rng (or injected zs)")
    ink = _inpaint_ctx(inpaint_known, inpaint_mask, inpaint_noise)

    t_pairs = jnp.array(list(zip(steps[:-1], steps[1:])), dtype=jnp.int32)
    if eta != 0.0 and zs is not None:
        noise_src = zs
    elif eta != 0.0:
        noise_src = jax.random.split(rng, max(len(steps) - 1, 1))
    else:
        noise_src = jnp.zeros((max(len(steps) - 1, 1), 2), dtype=jnp.uint32)

    def body(x, scan_x):
        pair, noise_in = scan_x
        t, tm1 = pair[0][None], pair[1][None]
        raw = model_fn(_concat_cond(x, cond_img), t, labels)
        _, _, abar_t = schedule.timestep_params(t)
        abar_t = abar_t.astype(jnp.float32)
        x = x.astype(jnp.float32)
        eps_hat, x0_approx = _to_eps_x0(raw.astype(jnp.float32), x,
                                        abar_t, mo)
        _, _, abar_tm1 = schedule.timestep_params(tm1)
        abar_tm1 = abar_tm1.astype(jnp.float32)
        if eta != 0.0:
            # Song et al. (2021) eq. 16 sigma — the exact expression the
            # reference computes at diffusion_sampling_algorithms.py:120-126
            # (with eta hardcoded to 0 at :86; exposing it is this
            # framework's extension, pinned by test_ddim_eta_matches_torch).
            sigma = eta * (((1.0 - abar_tm1) / (1.0 - abar_t)) ** 0.5
                           * (1.0 - abar_t / abar_tm1) ** 0.5)
            if zs is not None:
                noise = noise_in.astype(jnp.float32)
            else:
                noise = jax.random.normal(noise_in, x.shape, jnp.float32)
        else:
            sigma = jnp.zeros_like(abar_t)
            noise = 0.0
        x_new = (abar_tm1 ** 0.5 * x0_approx
                 + (1.0 - abar_tm1 - sigma ** 2) ** 0.5 * eps_hat
                 + sigma * noise)
        if ink is not None:
            # Project the known region onto its forward marginal at t-1.
            x_new = _inpaint_project(ink, schedule, x_new, tm1)
        return x_new, None

    if len(steps) > 1:
        x_t, _ = lax.scan(body, x_t.astype(jnp.float32), (t_pairs, noise_src))
    else:
        x_t = x_t.astype(jnp.float32)

    # Final visited step: predict eps and x0 once more (the loop's last
    # iteration computes x0 but performs no update, :114; :146-148).
    t_last = jnp.array([steps[-1]], dtype=jnp.int32)
    raw = model_fn(_concat_cond(x_t, cond_img), t_last, labels)
    _, _, abar_t = schedule.timestep_params(t_last)
    abar_t = abar_t.astype(jnp.float32)
    _, x0_approx = _to_eps_x0(raw.astype(jnp.float32), x_t, abar_t, mo)
    if ink is not None:
        x0_approx, x_t = _inpaint_finalize(ink, schedule, x0_approx, x_t,
                                           t_last)
    if steps[-1] == 1:  # static python condition (step list is static)
        return x0_approx
    return x_t


def dpmpp_sample(model_fn: ModelFn, schedule, x_t: jnp.ndarray, *,
                 min_noise: int = 1, max_noise: int = 1000,
                 step_size: int = 100,
                 cond_img: Optional[jnp.ndarray] = None,
                 labels: Optional[jnp.ndarray] = None,
                 steps: Optional[List[int]] = None,
                 inpaint_known: Optional[jnp.ndarray] = None,
                 inpaint_mask: Optional[jnp.ndarray] = None,
                 inpaint_noise: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """DPM-Solver++(2M): second-order multistep probability-flow ODE solver
    (Lu et al. 2022) — a TPU-build extension beyond the reference's sampler
    set (diffusion_sampling_algorithms.py has DDPM/DDIM/cold only).

    Same eps-predicting models, bundles, and step-list semantics as
    ddim_sample (skip list with append-min, x0-at-step-1 return rule,
    ensemble chaining via the returned x_t), but with a 2nd-order update:
    at equal step counts the discretization error is an order smaller than
    DDIM's (asserted against an analytic probability-flow solution in
    tests/test_dpm_solver.py), so ~10-step sampling reaches the quality
    DDIM needs ~50 steps for — a direct ~5x sampling-throughput lever.

    With alpha_t = sqrt(abar_t), sigma_t = sqrt(1-abar_t),
    lambda_t = log(alpha_t/sigma_t), h_i = lambda_{t_i} - lambda_{t_{i-1}}:

        D_i   = (1 + c_i) x0_i - c_i x0_{i-1},   c_i = h_i / (2 h_{i-1})
        x_{t_i} = (sigma_{t_i}/sigma_{t_{i-1}}) x_{t_{i-1}}
                  - alpha_{t_i} (e^{-h_i} - 1) D_i

    (first step: c_0 = 0, i.e. first-order / DDIM-equivalent). Deterministic
    (the ODE solver has no eta analogue). Whole trajectory is one lax.scan;
    the per-step lambda/ratio coefficients are precomputed outside it.
    """
    mo = _model_output(model_fn)
    steps = (list(steps) if steps is not None
             else ddim_step_list(min_noise, max_noise, step_size))
    ink = _inpaint_ctx(inpaint_known, inpaint_mask, inpaint_noise)

    abar = schedule.alpha_bar_at(jnp.asarray(steps)).astype(jnp.float32)
    alpha = abar ** 0.5
    sigma = (1.0 - abar) ** 0.5
    lam = jnp.log(alpha / sigma)
    h = lam[1:] - lam[:-1]                       # (n-1,), > 0
    # Multistep coefficient c_i = 1/(2 r_i) with r_i = h_{i-1}/h_i (Lu et
    # al. 2022, Algorithm 2) = h_i/(2 h_{i-1}); c_0 = 0 (no history).
    c = jnp.concatenate([jnp.zeros((1,)), h[1:] / (2.0 * h[:-1])])
    coefs = (jnp.array(steps[:-1], jnp.int32),   # s: level of the carry x
             jnp.array(steps[1:], jnp.int32),    # s_next: level of x_new
             sigma[1:] / sigma[:-1],             # sigma ratio
             alpha[1:] * (1.0 - jnp.exp(-h)),    # -alpha_t (e^{-h} - 1)
             c)

    def body(carry, scan_x):
        x, x0_prev = carry
        s, s_next, sig_ratio, gain, c_i = scan_x
        raw = model_fn(_concat_cond(x, cond_img), s[None], labels)
        abar_s = schedule.alpha_bar_at(s[None]).astype(jnp.float32)
        _, x0 = _to_eps_x0(raw.astype(jnp.float32), x, abar_s, mo)
        d = (1.0 + c_i) * x0 - c_i * x0_prev
        x_new = sig_ratio * x + gain * d
        if ink is not None:
            x_new = _inpaint_project(ink, schedule, x_new, s_next[None])
        return (x_new, x0), None

    x_t = x_t.astype(jnp.float32)
    if len(steps) > 1:
        (x_t, _), _ = lax.scan(body, (x_t, jnp.zeros_like(x_t)), coefs)

    # Final visited step: same return rule as ddim_sample (:146-148 parity
    # semantics — x0 when the trajectory lands exactly on step 1, else x_t
    # so ensemble chaining composes).
    t_last = jnp.array([steps[-1]], dtype=jnp.int32)
    raw = model_fn(_concat_cond(x_t, cond_img), t_last, labels)
    abar_t = schedule.alpha_bar_at(t_last).astype(jnp.float32)
    _, x0_approx = _to_eps_x0(raw.astype(jnp.float32), x_t, abar_t, mo)
    if ink is not None:
        x0_approx, x_t = _inpaint_finalize(ink, schedule, x0_approx, x_t,
                                           t_last)
    if steps[-1] == 1:  # static python condition (step list is static)
        return x0_approx
    return x_t


def heun_sample(model_fn: ModelFn, schedule, x_t: jnp.ndarray, *,
                min_noise: int = 1, max_noise: int = 1000,
                step_size: int = 100,
                cond_img: Optional[jnp.ndarray] = None,
                labels: Optional[jnp.ndarray] = None,
                steps: Optional[List[int]] = None,
                inpaint_known: Optional[jnp.ndarray] = None,
                inpaint_mask: Optional[jnp.ndarray] = None,
                inpaint_noise: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Heun (2nd-order predictor-corrector) probability-flow sampler
    (Karras et al. 2022, Algorithm 1) — a TPU-build extension beyond the
    reference's DDPM/DDIM/cold set (diffusion_sampling_algorithms.py).

    In the exponential-integrator coordinates y = x/alpha_t,
    s = sigma_t/alpha_t the PF-ODE is dy/ds = eps_hat(x, t), and Euler in
    (y, s) is EXACTLY the DDIM eta=0 update (asserted in
    tests/test_heun.py). Heun re-evaluates eps at the DDIM-predicted point
    and averages the two slopes:

        x~      = r x + g eps_hat(x, t)            (DDIM predictor)
        x_{t'}  = r x + g (eps_hat(x, t) + eps_hat(x~, t')) / 2

    with r = alpha_{t'}/alpha_t and g = sigma_{t'} - r sigma_t — both
    well-conditioned as abar -> 0 (no division by alpha of the current
    state). Two model calls per transition (vs dpmpp's one): same 2nd-order
    error decay, but single-step — no multistep history, so it is the
    robust choice for very short / strongly non-uniform (Karras-spaced)
    step lists where dpmpp's h_i/h_{i-1} ratio coefficient degrades.

    Same step-list semantics as ddim_sample (uniform skip list with
    append-min by default; pass `steps=karras_step_list(...)` for
    rho-spacing), same x0-at-step-1 return rule, same ensemble chaining,
    deterministic, and v-models consumed natively via _to_eps_x0.
    """
    mo = _model_output(model_fn)
    steps = (list(steps) if steps is not None
             else ddim_step_list(min_noise, max_noise, step_size))
    ink = _inpaint_ctx(inpaint_known, inpaint_mask, inpaint_noise)

    abar = schedule.alpha_bar_at(jnp.asarray(steps)).astype(jnp.float32)
    alpha = abar ** 0.5
    sigma = (1.0 - abar) ** 0.5
    r = alpha[1:] / alpha[:-1]
    g = sigma[1:] - r * sigma[:-1]
    coefs = (jnp.array(steps[:-1], jnp.int32),
             jnp.array(steps[1:], jnp.int32), r, g)

    def body(x, scan_x):
        t, tn, r_i, g_i = scan_x
        raw = model_fn(_concat_cond(x, cond_img), t[None], labels)
        abar_t = schedule.alpha_bar_at(t[None]).astype(jnp.float32)
        eps1, _ = _to_eps_x0(raw.astype(jnp.float32), x, abar_t, mo)
        x_pred = r_i * x + g_i * eps1
        raw2 = model_fn(_concat_cond(x_pred, cond_img), tn[None], labels)
        abar_tn = schedule.alpha_bar_at(tn[None]).astype(jnp.float32)
        eps2, _ = _to_eps_x0(raw2.astype(jnp.float32), x_pred, abar_tn, mo)
        x_new = r_i * x + g_i * 0.5 * (eps1 + eps2)
        if ink is not None:
            x_new = _inpaint_project(ink, schedule, x_new, tn[None])
        return x_new, None

    x_t = x_t.astype(jnp.float32)
    if len(steps) > 1:
        x_t, _ = lax.scan(body, x_t, coefs)

    # Final visited step: same return rule as ddim_sample (:146-148 parity
    # semantics — x0 when the trajectory lands exactly on step 1, else x_t
    # so ensemble chaining composes).
    t_last = jnp.array([steps[-1]], dtype=jnp.int32)
    raw = model_fn(_concat_cond(x_t, cond_img), t_last, labels)
    abar_t = schedule.alpha_bar_at(t_last).astype(jnp.float32)
    _, x0_approx = _to_eps_x0(raw.astype(jnp.float32), x_t, abar_t, mo)
    if ink is not None:
        x0_approx, x_t = _inpaint_finalize(ink, schedule, x0_approx, x_t,
                                           t_last)
    if steps[-1] == 1:  # static python condition (step list is static)
        return x0_approx
    return x_t


def cold_sample(model_fn: ModelFn, schedule, x_t: jnp.ndarray,
                noise: jnp.ndarray, *,
                min_noise: int = 1, max_noise: int = 1000,
                skip_step_size: int = 10,
                cond_img: Optional[jnp.ndarray] = None,
                labels: Optional[jnp.ndarray] = None,
                steps: Optional[List[int]] = None) -> jnp.ndarray:
    """Cold-diffusion sampling with an x0-predicting model; `noise` is the
    trajectory-shared degradation noise (:155). `steps` overrides the
    uniform skip list (same semantics as ddim_sample's `steps` — e.g. a
    karras_step_list for rho-spacing on cold bundles)."""
    if _model_output(model_fn) == "v":
        raise ValueError(
            "cold_sample consumes x0-predicting models; the v "
            "parameterization applies to the eps family (ddpm/ddim/dpmpp)")
    steps = (list(steps) if steps is not None
             else ddim_step_list(min_noise, max_noise, skip_step_size))
    noise = noise.astype(jnp.float32)

    t_pairs = jnp.array(list(zip(steps[:-1], steps[1:])), dtype=jnp.int32)

    def body(x, pair):
        t, tm1 = pair[0][None], pair[1][None]
        x0_hat = model_fn(_concat_cond(x, cond_img), t, labels)
        x0_hat = x0_hat.astype(jnp.float32)
        x_t_hat = schedule.q_sample(x0_hat, t, noise)
        x_tm1_hat = schedule.q_sample(x0_hat, tm1, noise)
        # Improved cold update (:193-208).
        x_new = x.astype(jnp.float32) - x_t_hat + x_tm1_hat
        return x_new, None

    if len(steps) > 1:
        x_t, _ = lax.scan(body, x_t.astype(jnp.float32), t_pairs)
    else:
        x_t = x_t.astype(jnp.float32)

    # Final step: return the model's reconstruction (:217).
    t_last = jnp.array([steps[-1]], dtype=jnp.int32)
    x0_hat = model_fn(_concat_cond(x_t, cond_img), t_last, labels)
    return x0_hat.astype(jnp.float32)
