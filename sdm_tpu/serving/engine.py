"""SamplerEngine: compile-once, keep-resident sampling over a bundle.

Serving analogue of the three batch generators (sdm_tpu/cli/generate_*.py,
parity with reference generate_images_diffusion.py:152-254,
generate_images_cold_diffusion.py:95-140, generate_sr_images_diffusion.py:
120-166): the same ensemble chaining per bundle kind, but bundle parsing,
checkpoint conversion, device upload, and XLA compilation all happen once at
construction, at one fixed batch shape. Requests of any size <= max_batch
are zero-padded to that shape (static shapes: one compiled executable
forever) and sliced after.

Bundle kinds (auto-detected from the bundle entries):
  eps   BASE bundles, diff_alg ddim/ddpm — x_t chains model to model.
  cold  BASE-COLD bundles (diff_alg="cold") — shared initial noise; ensemble
        chaining re-degrades the previous x0 to the next model's max_noise.
  sr    SR bundles (entries carry "cond_t") — requests supply a low-res
        image; the engine area-upsamples it, builds the cond channel by
        q_sampling at cond_t with the shared noise, runs the cold delta
        chain, and returns upsample + delta.

Determinism contract: ddim (eta=0), cold, and sr trajectories depend only on
each image's own noise draw, so request outputs are a pure function of the
request seed — identical alone or coalesced (asserted in tests). DDPM draws
per-step z from a batch key: reproducible only for identical batch
composition.
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
                 step_size: int = 10, max_T: int = 1000,
                 max_batch: int = 8, dtype: Optional[str] = None,
                 use_ema: bool = False, guidance: bool = False,
                 num_devices: Optional[int] = None,
                 output_dtype: str = "float32",
                 karras: bool = False,
                 log=print):
        import jax
        import jax.numpy as jnp
        from sdm_tpu.io.bundles import (build_model_from_bundle,
                                        load_bundle_config)
        from sdm_tpu.diffusion.samplers import (cold_sample, ddim_sample,
                                                ddpm_sample, dpmpp_sample,
                                                heun_sample,
                                                karras_steps_matching)

        if diff_alg not in ("ddim", "ddpm", "cold", "dpmpp", "heun"):
            raise ValueError(
                f"diff_alg must be ddim/ddpm/cold/dpmpp/heun, "
                f"got {diff_alg!r}")
        if karras and diff_alg == "ddpm":
            raise ValueError("karras spacing applies to skip-list samplers "
                             "(ddim/dpmpp/heun/cold), not ddpm")
        if output_dtype not in ("float32", "uint8"):
            raise ValueError(
                f"output_dtype must be float32/uint8, got {output_dtype!r}")
        # uint8 output: quantize ON DEVICE with the framework's standard
        # image quantization (clip((x+1)*127.5, 0, 255), the png writer's
        # math) so the per-batch host fetch shrinks 4x — on tunnel-attached
        # devices the fetch bounds few-step serving throughput at large
        # batch (BASELINE.md serving section).
        self._out_u8 = output_dtype == "uint8"
        self.max_batch = int(max_batch)
        self.guidance = bool(guidance)
        self.stats = EngineStats()
        self._jnp = jnp
        self._jax = jax

        models_details, folder = load_bundle_config(config_path)
        first = models_details["models"][0]
        self.img_shape = (first["img_H"], first["img_W"], first["img_C"])
        self.cond_dim = first["cond_dim"]
        if "cond_t" in first:
            self.kind = "sr"           # SR bundles carry cond_t per entry
            self.diff_alg = "cold"     # SR sampling is always cold
        elif diff_alg == "cold":
            self.kind = "cold"
            self.diff_alg = "cold"
        else:
            self.kind = "eps"
            self.diff_alg = diff_alg
        if guidance and self.cond_dim is None:
            raise ValueError("guidance=True needs a label-conditional bundle")
        if guidance and self.kind != "eps":
            raise ValueError(
                "guidance is supported for eps (BASE ddim/ddpm) bundles "
                "only — cold/SR models predict x0, where CFG extrapolation "
                "is not the reference-compatible formulation")
        compute_dtype = jnp.bfloat16 if dtype == "bfloat16" else None

        # Data-parallel serving (num_devices > 1): the padded batch dim is
        # sharded over a 1-D "data" mesh (per-image-independent sampling
        # needs no collectives), params replicated — the engine analogue of
        # the generators' --num-devices. Default stays single-device.
        self._dp = None
        if num_devices is not None and num_devices > 1:
            from sdm_tpu.parallel.mesh import (auto_data_mesh,
                                               batch_sharding,
                                               replicated_sharding)
            mesh = auto_data_mesh(self.max_batch, num_devices)
            self._dp = batch_sharding(mesh)
            self._replicated = replicated_sharding(mesh)

        self._entries = []
        for model_dict in models_details["models"]:
            factory, schedule, _, params = build_model_from_bundle(
                model_dict, folder, max_T=max_T, dtype=compute_dtype,
                cast_params=compute_dtype is not None,
                param_key="ema" if use_ema else "model")
            params = jax.device_put(
                params, self._replicated) if self._dp is not None \
                else jax.device_put(params)

            if guidance:
                # Guidance scale is a TRACED scalar: one compiled program
                # serves every scale (the CFG combine is linear in it), and
                # scale == 1 is mathematically the plain conditional branch.
                def mk_fn(p, gs, _f=factory):
                    base = _f(p)

                    def guided(x, t, labels):
                        x2 = jnp.concatenate([x, x], axis=0)
                        l2 = jnp.concatenate(
                            [labels, jnp.zeros_like(labels)], axis=0)
                        out = base(x2, t, l2).astype(jnp.float32)
                        e_c, e_u = jnp.split(out, 2, axis=0)
                        return e_u + gs * (e_c - e_u)

                    # Affine combine (weights sum to 1) is valid in v space
                    # too — preserve a v-bundle's tag (diffusion/vpred.py).
                    guided.model_output = getattr(
                        base, "model_output", "eps")
                    return guided
            else:
                def mk_fn(p, gs, _f=factory):
                    return _f(p)

            mn, mx = model_dict["min_noise"], model_dict["max_noise"]
            # --karras feature parity with the generator CLIs: swap the
            # uniform skip list for the rho-7 spacing at equal step count.
            kst = (karras_steps_matching(mn, mx, step_size, schedule)
                   if karras else None)
            if self.diff_alg == "ddim":
                def run(p, x_t, rng, noise, cond, labels, gs, _mk=mk_fn,
                        _s=schedule, _mn=mn, _mx=mx, _kst=kst):
                    return ddim_sample(_mk(p, gs), _s, x_t, min_noise=_mn,
                                       max_noise=_mx,
                                       ddim_step_size=step_size, steps=_kst,
                                       labels=labels)
            elif self.diff_alg in ("dpmpp", "heun"):
                _sf = dpmpp_sample if self.diff_alg == "dpmpp" \
                    else heun_sample
                def run(p, x_t, rng, noise, cond, labels, gs, _mk=mk_fn,
                        _s=schedule, _mn=mn, _mx=mx, _sf=_sf, _kst=kst):
                    return _sf(_mk(p, gs), _s, x_t, min_noise=_mn,
                               max_noise=_mx, step_size=step_size,
                               steps=_kst, labels=labels)
            elif self.diff_alg == "ddpm":
                def run(p, x_t, rng, noise, cond, labels, gs, _mk=mk_fn,
                        _s=schedule, _mn=mn, _mx=mx):
                    return ddpm_sample(_mk(p, gs), _s, x_t, rng=rng,
                                       min_noise=_mn, max_noise=_mx,
                                       labels=labels)
            else:
                def run(p, x_t, rng, noise, cond, labels, gs, _mk=mk_fn,
                        _s=schedule, _mn=mn, _mx=mx, _kst=kst):
                    return cold_sample(_mk(p, gs), _s, x_t, noise,
                                       min_noise=_mn, max_noise=_mx,
                                       skip_step_size=step_size, steps=_kst,
                                       cond_img=cond, labels=labels)

            # Dispatch-fused single-request programs (the common serving
            # shape): on this platform EVERY jax call pays a tunnel
            # round-trip, and the flexible path below makes ~6 of them per
            # batch (key split, noise draw, x_t copy, per-entry split, run)
            # — measured ~0.6 s/batch of pure dispatch latency, which is
            # noise behind a DDIM-50 trajectory but dominates a distilled
            # 3-call one (41 vs 243 img/s). first_fused folds PRNGKey ->
            # split -> noise -> (SR cond) -> split -> trajectory into ONE
            # program; next_fused folds the per-entry key split (+ cold/SR
            # re-degrade) into the entry's program. The key math is
            # op-for-op the flexible path's, so draws are bit-identical.
            is_first = len(self._entries) == 0
            mb = self.max_batch
            h_, w_, c_ = self.img_shape
            kind = self.kind

            dp = self._dp

            def first_fused(p, seed, labels, gs, upsampled, _run=run,
                            _s=schedule, _ct=model_dict.get("cond_t")):
                rng, nk = jax.random.split(jax.random.PRNGKey(seed))
                noise = jax.random.normal(nk, (mb, h_, w_, c_), jnp.float32)
                if dp is not None:
                    # Pin the batch-dim sharding; GSPMD propagates it through
                    # the whole trajectory (draws are sharding-invariant
                    # under partitionable threefry).
                    noise = jax.lax.with_sharding_constraint(noise, dp)
                cond = None
                if kind == "sr":
                    cond = _s.q_sample(upsampled, jnp.array([_ct]), noise)
                rng, sk = jax.random.split(rng)
                res = _run(p, 1 * noise, sk, noise, cond, labels, gs)
                return res, noise, cond, rng

            def next_fused(p, prev, rng, noise, cond, labels, gs, _run=run,
                           _s=schedule, _mx=mx):
                rng, sk = jax.random.split(rng)
                if kind == "eps":
                    x_t = prev
                else:
                    x_t = _s.q_sample(prev, jnp.array([_mx]), noise)
                return _run(p, x_t, sk, noise, cond, labels, gs), rng

            self._entries.append(dict(
                name=model_dict["model_name"], params=params,
                run=jax.jit(run),
                first_fused=jax.jit(first_fused) if is_first else None,
                next_fused=jax.jit(next_fused),
                schedule=schedule,
                max_noise=mx, cond_t=model_dict.get("cond_t")))
        self._prefix_ok = None  # lazily checked (see _noise_prefix_ok)
        self._log = log

    def _noise_prefix_ok(self) -> bool:
        """True when normal(key, (max_batch, ...))[:n] equals
        normal(key, (n, ...)) — the property that lets the fused path draw
        full-batch noise for a partial request (holds under partitionable
        threefry: bits are a function of the flat index). Checked ONCE on
        the live backend; if a jax change breaks it, partial single
        requests simply fall back to the flexible path."""
        if self._prefix_ok is None:
            jax, jnp = self._jax, self._jnp
            k = jax.random.PRNGKey(0)
            a = jax.random.normal(k, (4, 3, 2, 1), jnp.float32)
            b = jax.random.normal(k, (2, 3, 2, 1), jnp.float32)
            self._prefix_ok = bool(jnp.all(a[:2] == b))
        return self._prefix_ok

    # ------------------------------------------------------------- sampling

    def _noise_for(self, seed: int, n: int):
        jax = self._jax
        h, w, c = self.img_shape
        # Same key discipline as the generator CLIs (rng, nk = split(
        # PRNGKey)) so engine output at n == max_batch matches them.
        # Stays a DEVICE array: fetching it to host only to re-upload costs
        # two image-batch transfers per request over the axon tunnel
        # (measured 23% served-vs-raw gap before this was removed).
        rng, nk = jax.random.split(jax.random.PRNGKey(seed))
        return jax.random.normal(nk, (n, h, w, c), self._jnp.float32), rng

    def generate(self, num_images: int = 1, *, seed: int = 0,
                 labels: Optional[List[float]] = None,
                 guidance_scale: float = 1.0,
                 lr_image: Optional[np.ndarray] = None) -> np.ndarray:
        """One request -> (num_images, H, W, C) images: float in [-1, 1]
        by default, uint8 in [0, 255] when the engine was built with
        output_dtype="uint8".

        SR bundles require `lr_image` (H_lr, W_lr, C) in [-1, 1]; it is
        shared by the request's num_images (each gets its own noise)."""
        req = dict(num_images=num_images, seed=seed, labels=labels,
                   guidance_scale=guidance_scale, lr_image=lr_image)
        return self.generate_batch([req])[0]

    def generate_batch(self, requests: List[dict]) -> List[np.ndarray]:
        """Coalesced requests -> one padded fixed-shape trajectory chain.

        Each request: {num_images, seed, labels (cond_dim list | None),
        guidance_scale, lr_image (SR only)}. Total images must fit
        max_batch; coalesced requests must share guidance_scale (a scalar
        per batch) — the server enforces compatible coalescing.
        """
        return self.finalize(self.dispatch(requests))

    def dispatch(self, requests: List[dict]):
        """Enqueue all device work for one batch (no host sync) and start
        the async device->host copy of the result; returns a handle for
        finalize(). Calling dispatch(k+1) BEFORE finalize(k) overlaps batch
        k's host fetch with batch k+1's device compute — on tunnel-attached
        devices the fetch is a large fraction of few-step batch time
        (generate_pipelined, and the HTTP worker keeps one batch in
        flight)."""
        jnp, jax = self._jnp, self._jax
        if not requests:
            return None
        total = sum(r["num_images"] for r in requests)
        if total > self.max_batch:
            raise ValueError(
                f"batch of {total} exceeds max_batch={self.max_batch}")
        scales = {float(r.get("guidance_scale", 1.0)) for r in requests}
        if len(scales) > 1:
            raise ValueError("coalesced requests must share guidance_scale")
        gs = scales.pop()
        if gs != 1.0 and not self.guidance:
            raise ValueError(
                "engine built without guidance=True cannot apply "
                f"guidance_scale={gs}")

        # Single-request batches (the common serving shape) take the
        # dispatch-fused path: one device call per bundle entry instead of
        # ~6 per batch. Draws are bit-identical to the flexible path: at
        # full batch by construction, below it via the noise prefix
        # property (checked once on the live backend).
        if (len(requests) == 1
                and (requests[0]["num_images"] == self.max_batch
                     or self._noise_prefix_ok())):
            return self._dispatch_single(requests[0], gs)

        h, w, c = self.img_shape
        noise_parts, label_parts, lr_parts, rng = [], [], [], None
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
            if self.kind == "sr":
                lr = r.get("lr_image")
                if lr is None or np.ndim(lr) != 3 or lr.shape[-1] != c:
                    raise ValueError(
                        "SR bundle requests need lr_image (H, W, "
                        f"{c}) in [-1, 1]")
                if lr.shape[0] > h or lr.shape[1] > w:
                    raise ValueError(
                        f"lr_image {lr.shape[:2]} exceeds the model's "
                        f"output {h}x{w}")
                lr_parts.append(np.repeat(
                    np.asarray(lr, np.float32)[None], r["num_images"],
                    axis=0))

        def _pad_cat(parts, pad_shape):
            # Concatenate + pad on DEVICE (parts may be device arrays; the
            # values are identical to a host-side concat of the same draws,
            # so the engine==CLI parity pin is unaffected).
            arr = jnp.concatenate(parts) if len(parts) > 1 else parts[0]
            pad = self.max_batch - total
            if pad:
                arr = jnp.concatenate(
                    [arr, jnp.zeros((pad,) + pad_shape, jnp.float32)])
            if self._dp is not None:
                arr = jax.device_put(arr, self._dp)
            return arr

        noise = _pad_cat(noise_parts, (h, w, c))
        labels = None
        if self.cond_dim is not None:
            labels = _pad_cat([jnp.asarray(p) for p in label_parts],
                              (self.cond_dim,))
        upsampled = None
        if self.kind == "sr":
            from sdm_tpu.ops.resize import area_resize
            # Per-request LR sizes may differ; upsample each to the model
            # resolution (exact torch area semantics) before padding.
            ups = [area_resize(jnp.asarray(p), h, w) for p in lr_parts]
            upsampled = _pad_cat(ups, (h, w, c))

        gs_arr = jnp.float32(gs)
        x_t = 1 * noise
        x0 = None
        cond = None
        if self.kind == "sr":
            # Conditioning is built ONCE from the first model's schedule and
            # cond_t and reused across the ensemble chain — exactly the SR
            # generator's behavior (generate_sr_images_diffusion.py:142-145,
            # computed only on the first iteration).
            e0 = self._entries[0]
            cond = e0["schedule"].q_sample(
                upsampled, jnp.array([e0["cond_t"]]), noise)
        t0 = time.monotonic()
        for entry in self._entries:
            rng, sk = jax.random.split(rng)
            schedule = entry["schedule"]
            if self.kind == "eps":
                x_t = entry["run"](entry["params"], x_t, sk, noise, None,
                                   labels, gs_arr)
            elif self.kind == "cold":
                if x0 is not None:
                    # Re-degrade the previous x0 to this model's max_noise
                    # with the shared noise (cold generator :118-120).
                    x_t = schedule.q_sample(
                        x0, jnp.array([entry["max_noise"]]), noise)
                x0 = entry["run"](entry["params"], x_t, sk, noise, None,
                                  labels, gs_arr)
            else:  # sr
                if x0 is not None:
                    x_t = schedule.q_sample(
                        x0, jnp.array([entry["max_noise"]]), noise)
                x0 = entry["run"](entry["params"], x_t, sk, noise, cond,
                                  labels, gs_arr)
        if self.kind == "eps":
            out_dev = x_t
        elif self.kind == "cold":
            out_dev = x0
        else:
            out_dev = upsampled + x0  # delta model (SR gen :166)
        return self._make_handle(out_dev, requests, total, t0)

    def _make_handle(self, out_dev, requests, total, t0):
        if self._out_u8:
            out_dev = self._quantize(out_dev)
        try:
            out_dev.copy_to_host_async()
        except Exception:
            pass  # finalize's np.asarray fetches synchronously instead
        return dict(out=out_dev, requests=requests, total=total, t0=t0)

    def _quantize(self, x):
        jnp = self._jnp
        if not hasattr(self, "_quantize_jit"):
            self._quantize_jit = self._jax.jit(lambda a: jnp.clip(
                (a + 1.0) * 127.5, 0, 255).astype(jnp.uint8))
        return self._quantize_jit(x)

    def finalize(self, handle) -> List[np.ndarray]:
        """Fetch a dispatched batch's result and slice it per request.
        Under pipelining, per-batch device_seconds windows overlap (each
        spans dispatch->finalize wall time), so their sum can exceed wall
        time; throughput math should use wall clock over many batches."""
        if handle is None:
            return []
        out = np.asarray(handle["out"])
        dt = time.monotonic() - handle["t0"]
        total = handle["total"]
        with self.stats.lock:
            self.stats.batches += 1
            self.stats.images += total
            self.stats.padded_images += self.max_batch - total
            self.stats.device_seconds += dt
        results, off = [], 0
        for r in handle["requests"]:
            results.append(out[off:off + r["num_images"]])
            off += r["num_images"]
        return results

    def generate_pipelined(self, request_batches: List[List[dict]],
                           depth: int = 2) -> List[List[np.ndarray]]:
        """Run many batches with up to `depth` in flight: batch k's host
        fetch overlaps batch k+1's device compute. Results in order."""
        if depth < 1:
            raise ValueError("depth must be >= 1")
        handles, results = [], []
        for reqs in request_batches:
            handles.append(self.dispatch(reqs))
            if len(handles) >= depth:
                results.append(self.finalize(handles.pop(0)))
        while handles:
            results.append(self.finalize(handles.pop(0)))
        return results

    def _dispatch_single(self, r: dict, gs: float):
        """Dispatch-fused single-request sampling (see first_fused/next_fused
        in __init__). Bit-identical outputs to the flexible path."""
        jnp, jax = self._jnp, self._jax
        h, w, c = self.img_shape
        n = r["num_images"]

        labels = None
        if self.cond_dim is not None:
            lab = r.get("labels")
            if lab is None or len(lab) != self.cond_dim:
                raise ValueError(
                    f"bundle needs {self.cond_dim} labels per request")
            full = np.zeros((self.max_batch, self.cond_dim), np.float32)
            full[:n] = np.asarray(lab, np.float32)
            labels = full

        upsampled = None
        if self.kind == "sr":
            from sdm_tpu.ops.resize import area_resize
            lr = r.get("lr_image")
            if lr is None or np.ndim(lr) != 3 or lr.shape[-1] != c:
                raise ValueError(
                    f"SR bundle requests need lr_image (H, W, {c}) in [-1, 1]")
            if lr.shape[0] > h or lr.shape[1] > w:
                raise ValueError(
                    f"lr_image {lr.shape[:2]} exceeds the model's "
                    f"output {h}x{w}")
            ups = area_resize(
                jnp.asarray(np.repeat(np.asarray(lr, np.float32)[None], n,
                                      axis=0)), h, w)
            pad = self.max_batch - n
            if pad:
                ups = jnp.concatenate(
                    [ups, jnp.zeros((pad, h, w, c), jnp.float32)])
            if self._dp is not None:
                ups = jax.device_put(ups, self._dp)
            upsampled = ups

        gs_arr = jnp.float32(gs)
        seed = jnp.int32(int(r.get("seed", 0)))
        t0 = time.monotonic()
        e0 = self._entries[0]
        res, noise, cond, rng = e0["first_fused"](
            e0["params"], seed, labels, gs_arr, upsampled)
        for entry in self._entries[1:]:
            res, rng = entry["next_fused"](
                entry["params"], res, rng, noise, cond, labels, gs_arr)
        out_dev = (upsampled + res) if self.kind == "sr" else res
        return self._make_handle(out_dev, [r], n, t0)

    def precompile(self) -> float:
        """Run one dummy full-shape batch so the first real request pays no
        compile. Returns the wall seconds spent."""
        h, w, c = self.img_shape
        t0 = time.monotonic()
        req = dict(num_images=self.max_batch, seed=0,
                   labels=([0.0] * self.cond_dim
                           if self.cond_dim is not None else None),
                   guidance_scale=1.0,
                   lr_image=(np.zeros((h // 2, w // 2, c), np.float32)
                             if self.kind == "sr" else None))
        self.generate_batch([req])  # warms the fused single-request path
        if self.max_batch >= 2:
            # Also warm the flexible path the HTTP server's coalesced
            # multi-request batches take.
            half = dict(req, num_images=1)
            self.generate_batch([half, dict(half, seed=1)])
        dt = time.monotonic() - t0
        with self.stats.lock:
            self.stats.compile_seconds = dt
            # Warm-up traffic should not pollute serving stats.
            self.stats.batches = 0
            self.stats.images = 0
            self.stats.padded_images = 0
            self.stats.device_seconds = 0.0
        self._log(f"precompile: {dt:.1f}s "
                  f"(batch {self.max_batch}, {self.kind}/{self.diff_alg})")
        return dt
