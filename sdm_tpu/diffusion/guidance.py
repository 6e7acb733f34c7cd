"""Classifier-free guidance (CFG) — a TPU-build extension beyond the
reference's capability surface.

The reference's conditional models (use_conditional=True, label vectors
through ConditionalEmbedding — /root/reference/models/custom_layers.py:69-78)
are always sampled fully conditionally (generate_images_diffusion.py:180-185).
CFG (Ho & Salimans, 2022) sharpens conditional samples by extrapolating away
from an unconditional prediction:

    eps_guided = eps_uncond + scale * (eps_cond - eps_uncond)

The "null" condition is the ZERO label vector: the conditional MLP is a plain
4-layer Linear+Swish stack, so a zero input yields a constant embedding
determined by its bias parameters — a learnable null token that needs NO new
parameters and keeps checkpoints bit-compatible with the reference format.
Training-side label dropout (config "cfg_drop_prob") zeroes each sample's
label vector with that probability so the model learns the null branch;
sampling-side, `cfg_model_fn` wraps any `model_fn(x, t, labels)` so every
sampler (DDPM/DDIM/cold) gains guidance without modification.

Defaults preserve parity: cfg_drop_prob=0 and guidance scale unset reproduce
the reference numerics exactly (asserted by the golden sampler tests).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

ModelFn = Callable[..., jnp.ndarray]


def cfg_model_fn(model_fn: ModelFn, guidance_scale: float) -> ModelFn:
    """Wrap `model_fn` so each call evaluates the conditional and the
    zero-label (null) branch in ONE doubled-batch model call — on TPU the
    2N-batch convs/matmuls run at better MXU utilization than two N-batch
    calls, and XLA sees a single fusable program per sampler step.

    scale == 1.0 is mathematically the plain conditional model (returned
    unwrapped); scale == 0.0 is the pure null-label model.
    """
    scale = float(guidance_scale)
    if scale == 1.0:
        return model_fn

    def guided(x: jnp.ndarray, t: jnp.ndarray,
               labels: Optional[jnp.ndarray]) -> jnp.ndarray:
        if labels is None:
            raise ValueError(
                "classifier-free guidance needs label conditioning "
                "(the model was sampled without labels)")
        x2 = jnp.concatenate([x, x], axis=0)
        if labels.ndim == 1:
            # Generators pass one shared (cond_dim,) vector broadcast over
            # the batch (reference generate_images_diffusion.py:180-185) —
            # materialize the batch dim so the two halves can differ.
            labels = jnp.broadcast_to(labels, (x.shape[0],) + labels.shape)
        l2 = jnp.concatenate([labels, jnp.zeros_like(labels)], axis=0)
        out = model_fn(x2, t, l2)
        e_cond, e_uncond = jnp.split(out, 2, axis=0)
        e_cond = e_cond.astype(jnp.float32)
        e_uncond = e_uncond.astype(jnp.float32)
        return e_uncond + scale * (e_cond - e_uncond)

    # The CFG combine is affine with weights summing to 1, so it is the
    # same extrapolation in v space as in eps space (eps = a·v + s·x with a
    # shared x): a v-model's tag (vpred.tag_v) must ride through so the
    # samplers keep converting natively.
    guided.model_output = getattr(model_fn, "model_output", "eps")
    return guided


def dropout_labels(labels: Optional[jnp.ndarray], rng: jax.Array,
                   drop_prob: float) -> Optional[jnp.ndarray]:
    """Per-sample label dropout for CFG training: with probability
    `drop_prob` a sample's label vector is replaced by the zero (null)
    vector. No-op when labels is None or drop_prob == 0."""
    if labels is None or drop_prob <= 0.0:
        return labels
    keep = jax.random.bernoulli(rng, 1.0 - drop_prob, (labels.shape[0],))
    return jnp.where(keep[:, None], labels, jnp.zeros_like(labels))
