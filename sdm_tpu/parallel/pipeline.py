"""Pipeline-parallel ensemble sampling.

The reference's headline ensemble feature (eDiff-I-style range-specialized
models, generate_images_diffusion.py:164-254) chains models SEQUENTIALLY:
model k denoises the whole batch over its [min_noise, max_noise] range, then
hands x_t to model k+1 — on one device the total time is the sum of all
stages. On a TPU slice the idiomatic schedule is a pipeline: place each
ensemble model on its own device, split the batch into microbatches, and let
microbatch m run stage k while microbatch m-1 runs stage k+1. JAX's async
dispatch builds this schedule for free — each stage's jitted computation is
pinned to its stage device (committed params), so the host loop below merely
enqueues work and device-to-device transfers; no explicit collectives are
needed and steady-state throughput approaches max(stage time) instead of
sum(stage times).

This is beyond the reference's scope (it has no distributed code at all,
SURVEY.md §2.10) — the single-device path remains the default; generators
opt in with --pipeline N.
"""

from __future__ import annotations

from typing import Callable, List, Sequence


def pipeline_chain(stage_fns: Sequence[Callable], stage_devices: Sequence,
                   x, num_microbatches: int):
    """Run `x` (batch-leading array) through `stage_fns` in order, split
    into `num_microbatches` along dim 0, each stage pinned to its device.

    stage_fns[k](x_m, m) -> x_m'  must be a jitted call whose captured
    params are committed to stage_devices[k] (so the computation runs
    there); `m` is the microbatch index (for per-microbatch RNG folding).
    The batch must divide evenly so every microbatch reuses one compiled
    program per stage.

    Returns the concatenated result (on stage_devices[-1]).
    """
    import jax
    import jax.numpy as jnp

    n = x.shape[0]
    if n % num_microbatches != 0:
        raise ValueError(
            f"batch {n} not divisible by --pipeline {num_microbatches} "
            "microbatches (uneven shapes would recompile every stage)")
    size = n // num_microbatches
    outs: List = []
    # Enqueue the full chain per microbatch; async dispatch overlaps
    # microbatch m's stage k with microbatch m+1's stage k-1 because the
    # stages live on different devices.
    for m in range(num_microbatches):
        xm = jax.lax.slice_in_dim(x, m * size, (m + 1) * size, axis=0)
        for fn, dev in zip(stage_fns, stage_devices):
            xm = jax.device_put(xm, dev)
            xm = fn(xm, m)
        outs.append(xm)
    return jnp.concatenate(outs, axis=0)
