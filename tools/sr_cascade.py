#!/usr/bin/env python3
"""SR-cascade quality evidence: base 64² samples super-resolved to 128².

The reference's headline gallery is the cascaded pipeline — a base model at
one resolution whose samples a separately-trained SR stage upsamples
(/root/reference/README.md:164, train_SR_diffusion.py:350-374,
generate_sr_images_diffusion.py). This tool scores this repo's equivalent
at converged quality: it samples the campaign's converged eps base bundle,
runs every sample through the converged SR bundle, and computes FID/KID at
128² against the held-out HR shapes set — next to the baseline the cascade
must beat (plain area upsampling of the same base samples) and the
real-vs-real FID floor at 128² that makes both numbers interpretable.

Outputs (under {workdir}/results/):
    sr_cascade.json             FID/KID of base->SR samples vs real HR
    sr_upsample_baseline.json   FID/KID of area-upsampled base samples
    sr_hr_floor.json            real-vs-real split FID at 128²
    grids/sr_cascade.jpg        25 cascade samples (128²)
    grids/sr_baseline_upsample.jpg  the same 25 base samples, area-upsampled
    grids/real_hr.jpg           25 real HR images
    grids/sr_pairs.jpg          5 samples as (upsampled | SR) column pairs

Usage: python tools/sr_cascade.py --workdir /tmp/qc -n 1024 --batch 64
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/qc")
    ap.add_argument("-n", type=int, default=1024,
                    help="cascade samples to score")
    ap.add_argument("--batch", type=int, default=64,
                    help="sampling batch (one compiled trajectory each)")
    ap.add_argument("--max-real", type=int, default=4096)
    ap.add_argument("--cold-step-size", type=int, default=50,
                    help="SR stage cold-sampling skip (50 -> 20 model "
                         "calls per image)")
    ap.add_argument("--seed", type=int, default=5)
    a = ap.parse_args()
    sys.path.insert(0, REPO)

    import numpy as np

    from sdm_tpu.cli.evaluate_samples import _load_images, _resolve_paths, \
        _save_grid
    from sdm_tpu.cli.generate_images_diffusion import (
        generate_images_diffusion)
    from sdm_tpu.cli.generate_sr_images_diffusion import (
        generate_sr_images_diffusion)
    from sdm_tpu.eval.features import make_feature_extractor
    from sdm_tpu.eval.fid import (frechet_distance, gaussian_stats,
                                  kernel_distance)

    results = os.path.join(a.workdir, "results")
    grids = os.path.join(results, "grids")
    os.makedirs(grids, exist_ok=True)
    eps_cfg = os.path.join(a.workdir, "exports", "eps", "config.json")
    sr_cfg = os.path.join(a.workdir, "exports", "sr", "config.json")
    for p in (eps_cfg, sr_cfg):
        if not os.path.exists(p):
            raise SystemExit(f"bundle {p} missing — run the campaign's "
                             "export stage first")
    hr_dim = json.load(open(sr_cfg))["models"][0]["img_H"]

    # ---- sample the cascade in chunks ----------------------------------
    base_chunks, sr_chunks = [], []
    done = chunk = 0
    while done < a.n:
        nb = min(a.batch, a.n - done)
        print(f"[cascade] chunk {chunk}: {nb} base + SR samples",
              flush=True)
        base = np.asarray(generate_images_diffusion(
            ["-c", eps_cfg, "-n", str(nb), "-s", str(a.seed + chunk),
             "--diff_alg", "ddim", "--ddim_step_size", "20",
             "--use-ema", "--dtype", "bfloat16"], save_locally=False))
        sr = np.asarray(generate_sr_images_diffusion(
            ["-c", sr_cfg, "-s", str(a.seed + chunk),
             "--cold_step_size", str(a.cold_step_size),
             "--use-ema", "--dtype", "bfloat16"],
            lr_img=base * 127.5 + 127.5, save_locally=False))
        base_chunks.append(base)
        sr_chunks.append(np.clip(sr, -1.0, 1.0))
        done += nb
        chunk += 1
    base_imgs = np.concatenate(base_chunks)
    sr_imgs = np.concatenate(sr_chunks)

    # Baseline: the exact images the SR stage started from (its internal
    # area-upsampled conditioning), with no learned detail added.
    import jax.numpy as jnp
    from sdm_tpu.ops.resize import area_resize
    up_imgs = np.asarray(area_resize(jnp.asarray(base_imgs), hr_dim, hr_dim),
                         np.float32)

    _save_grid(sr_imgs[:25], os.path.join(grids, "sr_cascade.jpg"), print)
    _save_grid(up_imgs[:25], os.path.join(grids, "sr_baseline_upsample.jpg"),
               print)
    pairs = np.stack([im for i in range(5)
                      for im in (up_imgs[i], sr_imgs[i])])
    _save_grid(pairs, os.path.join(grids, "sr_pairs.jpg"), print)

    # ---- score at 128² vs the held-out HR set --------------------------
    real_paths = _resolve_paths(
        os.path.join(a.workdir, "shapes_hr", "*.jpg"), a.max_real)
    real_imgs = _load_images(real_paths, hr_dim)
    print(f"real HR set: {real_imgs.shape[0]} images at {hr_dim}²",
          flush=True)
    _save_grid(real_imgs[:25], os.path.join(grids, "real_hr.jpg"), print)

    extract, feat_name = make_feature_extractor("randconv")
    feats = {"real": extract(real_imgs), "cascade": extract(sr_imgs),
             "upsample": extract(up_imgs)}
    half = len(feats["real"]) // 2
    jobs = {
        "sr_cascade": (feats["real"], feats["cascade"]),
        "sr_upsample_baseline": (feats["real"], feats["upsample"]),
        "sr_hr_floor": (feats["real"][:half], feats["real"][half:]),
    }
    for name, (fr, fg) in jobs.items():
        mu_r, sig_r = gaussian_stats(fr)
        mu_g, sig_g = gaussian_stats(fg)
        kid, kid_std = kernel_distance(fr, fg)
        out = {"fid": float(frechet_distance(mu_r, sig_r, mu_g, sig_g)),
               "kid": float(kid), "kid_std": float(kid_std),
               "n_real": int(len(fr)), "n_generated": int(len(fg)),
               "features": feat_name, "image_size": int(hr_dim),
               "cold_step_size": a.cold_step_size, "seed": a.seed}
        path = os.path.join(results, f"{name}.json")
        with open(path, "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)
        print(f"[cascade] {name}: FID {out['fid']:.3f}  KID {out['kid']:.5f}"
              f" -> {path}", flush=True)


if __name__ == "__main__":
    main()
