"""SamplerEngine: compile-once, keep-resident sampling over a bundle.

Serving analogue of the batch generator (sdm_tpu/cli/generate_images_
diffusion.py, itself parity with reference generate_images_diffusion.py:
152-254): the same ensemble chaining — model m's trajectory output is model
m+1's input — but bundle parsing, checkpoint conversion, device upload, and
XLA compilation all happen once at construction, at one fixed batch shape.
Requests of any size <= max_batch are zero-padded to that shape (static
shapes: one compiled executable forever) and sliced after.

Determinism contract: with diff_alg="ddim" (eta=0) every image depends only
on its own initial-noise draw, so a request's outputs are a pure function of
its seed — identical whether it runs alone or coalesced into a larger batch
(asserted in tests/test_serving.py). DDPM draws its per-step z from a batch
key, so outputs are reproducible only for identical batch composition.
"""

from __future__ import annotations

import threading
import time
from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np


@dataclass
class EngineStats:
    batches: int = 0
    images: int = 0
    padded_images: int = 0
    device_seconds: float = 0.0
    compile_seconds: float = 0.0
    lock: threading.Lock = field(default_factory=threading.Lock, repr=False)

    def snapshot(self) -> dict:
        with self.lock:
            return {"batches": self.batches, "images": self.images,
                    "padded_images": self.padded_images,
                    "device_seconds": round(self.device_seconds, 4),
                    "compile_seconds": round(self.compile_seconds, 4)}


class SamplerEngine:
    """Compiled ensemble sampling chain over one exported bundle."""

    def __init__(self, config_path: str, *, diff_alg: str = "ddim",
                 ddim_step_size: int = 10, max_T: int = 1000,
                 max_batch: int = 8, dtype: Optional[str] = None,
                 use_ema: bool = False, guidance: bool = False,
                 log=print):
        import jax
        import jax.numpy as jnp
        from sdm_tpu.io.bundles import (build_model_from_bundle,
                                        load_bundle_config)
        from sdm_tpu.diffusion.samplers import ddim_sample, ddpm_sample

        if diff_alg not in ("ddim", "ddpm"):
            raise ValueError(f"diff_alg must be ddim/ddpm, got {diff_alg!r}")
        self.diff_alg = diff_alg
        self.max_batch = int(max_batch)
        self.guidance = bool(guidance)
        self.stats = EngineStats()
        self._jnp = jnp
        self._jax = jax

        models_details, folder = load_bundle_config(config_path)
        self._entries = []
        first = models_details["models"][0]
        self.img_shape = (first["img_H"], first["img_W"], first["img_C"])
        self.cond_dim = first["cond_dim"]
        if guidance and self.cond_dim is None:
            raise ValueError("guidance=True needs a label-conditional bundle")
        compute_dtype = jnp.bfloat16 if dtype == "bfloat16" else None

        for model_dict in models_details["models"]:
            factory, schedule, _, params = build_model_from_bundle(
                model_dict, folder, max_T=max_T, dtype=compute_dtype,
                cast_params=compute_dtype is not None,
                param_key="ema" if use_ema else "model")
            params = jax.device_put(params)

            if guidance:
                # Guidance scale is a TRACED scalar: one compiled program
                # serves every scale (the CFG combine is linear in it), and
                # scale == 1 is mathematically the plain conditional branch.
                from sdm_tpu.diffusion.guidance import cfg_model_fn

                def mk_fn(p, gs, _f=factory):
                    base = _f(p)

                    def guided(x, t, labels):
                        x2 = jnp.concatenate([x, x], axis=0)
                        l2 = jnp.concatenate(
                            [labels, jnp.zeros_like(labels)], axis=0)
                        out = base(x2, t, l2).astype(jnp.float32)
                        e_c, e_u = jnp.split(out, 2, axis=0)
                        return e_u + gs * (e_c - e_u)

                    return guided
            else:
                def mk_fn(p, gs, _f=factory):
                    return _f(p)

            mn, mx = model_dict["min_noise"], model_dict["max_noise"]
            if diff_alg == "ddim":
                def run(p, x_t, rng, labels, gs, _mk=mk_fn, _s=schedule,
                        _mn=mn, _mx=mx):
                    return ddim_sample(_mk(p, gs), _s, x_t, min_noise=_mn,
                                       max_noise=_mx,
                                       ddim_step_size=ddim_step_size,
                                       labels=labels)
            else:
                def run(p, x_t, rng, labels, gs, _mk=mk_fn, _s=schedule,
                        _mn=mn, _mx=mx):
                    return ddpm_sample(_mk(p, gs), _s, x_t, rng=rng,
                                       min_noise=_mn, max_noise=_mx,
                                       labels=labels)

            self._entries.append(
                (model_dict["model_name"], params, jax.jit(run)))
        self._log = log

    # ------------------------------------------------------------- sampling

    def _noise_for(self, seed: int, n: int) -> np.ndarray:
        jax = self._jax
        h, w, c = self.img_shape
        # Same key discipline as the generator CLI (rng, nk = split(PRNGKey))
        # so engine output at n == max_batch matches the CLI bit-for-bit.
        rng, nk = jax.random.split(jax.random.PRNGKey(seed))
        return np.asarray(jax.random.normal(
            nk, (n, h, w, c), self._jnp.float32)), rng

    def generate(self, num_images: int, *, seed: int = 0,
                 labels: Optional[List[float]] = None,
                 guidance_scale: float = 1.0) -> np.ndarray:
        """One request -> (num_images, H, W, C) float images in [-1, 1]."""
        req = dict(num_images=num_images, seed=seed, labels=labels,
                   guidance_scale=guidance_scale)
        return self.generate_batch([req])[0]

    def generate_batch(self, requests: List[dict]) -> List[np.ndarray]:
        """Coalesced requests -> one padded fixed-shape trajectory chain.

        Each request: {num_images, seed, labels (cond_dim list | None),
        guidance_scale}. Total images must fit max_batch. Guidance scales
        may differ per request only when they are all equal (the scale is a
        scalar per batch); the server enforces compatible coalescing.
        """
        jnp, jax = self._jnp, self._jax
        total = sum(r["num_images"] for r in requests)
        if total > self.max_batch:
            raise ValueError(
                f"batch of {total} exceeds max_batch={self.max_batch}")
        if not requests:
            return []
        scales = {float(r.get("guidance_scale", 1.0)) for r in requests}
        if len(scales) > 1:
            raise ValueError("coalesced requests must share guidance_scale")
        gs = scales.pop()
        if gs != 1.0 and not self.guidance:
            raise ValueError(
                "engine built without guidance=True cannot apply "
                f"guidance_scale={gs}")

        noise_parts, label_parts, rng = [], [], None
        for r in requests:
            part, part_rng = self._noise_for(int(r.get("seed", 0)),
                                             r["num_images"])
            noise_parts.append(part)
            rng = part_rng if rng is None else rng  # batch key: 1st request
            if self.cond_dim is not None:
                lab = r.get("labels")
                if lab is None or len(lab) != self.cond_dim:
                    raise ValueError(
                        f"bundle needs {self.cond_dim} labels per request")
                label_parts.append(
                    np.tile(np.asarray(lab, np.float32),
                            (r["num_images"], 1)))
        pad = self.max_batch - total
        h, w, c = self.img_shape
        x_t = np.concatenate(noise_parts)
        if pad:
            x_t = np.concatenate([x_t, np.zeros((pad, h, w, c), np.float32)])
        if self.cond_dim is not None:
            labels = np.concatenate(label_parts) if label_parts else None
            if pad:
                labels = np.concatenate(
                    [labels, np.zeros((pad, self.cond_dim), np.float32)])
            labels = jnp.asarray(labels)
        else:
            labels = None

        x_t = jnp.asarray(x_t)
        gs_arr = jnp.float32(gs)
        t0 = time.monotonic()
        for i, (name, params, run) in enumerate(self._entries):
            rng, sk = jax.random.split(rng)
            x_t = run(params, x_t, sk, labels, gs_arr)
        out = np.asarray(x_t)
        dt = time.monotonic() - t0
        with self.stats.lock:
            self.stats.batches += 1
            self.stats.images += total
            self.stats.padded_images += pad
            self.stats.device_seconds += dt

        results, off = [], 0
        for r in requests:
            results.append(out[off:off + r["num_images"]])
            off += r["num_images"]
        return results

    def precompile(self) -> float:
        """Run one dummy full-shape batch so the first real request pays no
        compile. Returns the wall seconds spent."""
        t0 = time.monotonic()
        req = dict(num_images=self.max_batch, seed=0,
                   labels=([0.0] * self.cond_dim
                           if self.cond_dim is not None else None),
                   guidance_scale=1.0)
        self.generate_batch([req])
        dt = time.monotonic() - t0
        with self.stats.lock:
            self.stats.compile_seconds = dt
            # Warm-up traffic should not pollute serving stats.
            self.stats.batches = 0
            self.stats.images = 0
            self.stats.padded_images = 0
            self.stats.device_seconds = 0.0
        self._log(f"precompile: {dt:.1f}s "
                  f"(batch {self.max_batch}, {self.diff_alg})")
        return dt
