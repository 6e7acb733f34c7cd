#!/usr/bin/env python3
"""Cold-reconstruction and doodle-steering demo grids (QUALITY.md evidence).

The reference demonstrates every trainer family with galleries
(/root/reference/README.md:87-152); the campaign's FID rows cover the eps
and cold families numerically, and this companion renders the two demos
numbers can't show:

  cold_recon.jpg       Per row, one real image: [original | q_sampled to
                       t=500 | cold reconstruction from 500 | q_sampled to
                       t=1000 (pure degradation) | reconstruction from
                       1000]. An x0-objective model run through cold
                       sampling's improved update (samplers.py cold_sample)
                       should recover the original from mid-range t and a
                       plausible scene from full degradation.
  doodle_steering.jpg  Per row, one HELD-OUT doodle (fresh generator seed,
                       never trained on): [ground-truth render | outline
                       doodle | 3 conditioned samples]. Steering is shown
                       by the samples following their row's layout and not
                       the other row's.

Usage: python tools/family_demos.py --workdir /tmp/qc
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def cold_recon_grid(workdir: str, grids: str, n_rows: int, seed: int):
    import cv2
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sdm_tpu.cli.evaluate_samples import _save_grid
    from sdm_tpu.diffusion.samplers import cold_sample
    from sdm_tpu.io.bundles import build_model_from_bundle, \
        load_bundle_config

    out = os.path.join(grids, "cold_recon.jpg")
    if os.path.exists(out):
        print("[family_demos] cold_recon exists")
        return
    cfg = os.path.join(workdir, "exports", "cold", "config.json")
    if not os.path.exists(cfg):
        raise SystemExit(f"bundle {cfg} missing — run the campaign's "
                         "export stage first")
    shapes = sorted(glob.glob(os.path.join(workdir, "shapes", "*.jpg")))
    if not shapes:
        raise SystemExit("shapes dataset missing — run the campaign's "
                         "dataset stage first")

    models_details, folder = load_bundle_config(cfg)
    md = models_details["models"][0]
    T = int(md["max_noise"])
    model_fn_factory, schedule, _, params = build_model_from_bundle(
        md, folder, max_T=T, dtype=jnp.bfloat16, cast_params=True,
        param_key="ema")

    imgs = np.stack([
        (cv2.imread(p).astype(np.float32) - 127.5) / 127.5
        for p in shapes[:n_rows]])
    x0 = jnp.asarray(imgs)
    noise = jax.random.normal(jax.random.PRNGKey(seed), x0.shape,
                              jnp.float32)

    cells = []
    recon = {}
    ts = (T // 2, T)
    for t in ts:
        x_t = schedule.q_sample(x0, jnp.array([t]), noise)
        # params as a jit ARGUMENT — closing over them would embed the
        # checkpoint as HLO constants (io/bundles.py factory contract).
        rec = jax.jit(lambda p, xt, t=t: cold_sample(
            model_fn_factory(p), schedule, xt, noise,
            min_noise=md["min_noise"], max_noise=t,
            skip_step_size=20))(params, x_t)
        recon[t] = (np.asarray(x_t), np.asarray(rec))
    for i in range(len(imgs)):
        cells += [imgs[i], recon[ts[0]][0][i], recon[ts[0]][1][i],
                  recon[ts[1]][0][i], recon[ts[1]][1][i]]
    _save_grid(np.clip(np.stack(cells), -1, 1), out, print)


def doodle_steering_grid(workdir: str, grids: str, n_rows: int, seed: int):
    import numpy as np

    from sdm_tpu.cli.evaluate_samples import _save_grid
    from sdm_tpu.cli.generate_images_diffusion import (
        generate_images_diffusion)
    from tools.make_shapes_dataset import (make_scene, render_doodle,
                                           render_image)

    out = os.path.join(grids, "doodle_steering.jpg")
    if os.path.exists(out):
        print("[family_demos] doodle_steering exists")
        return
    cfg = os.path.join(workdir, "exports", "doodle", "config.json")
    if not os.path.exists(cfg):
        raise SystemExit(f"bundle {cfg} missing — run the campaign's "
                         "export stage first")
    import json
    size = json.load(open(cfg))["models"][0]["img_H"]

    # Held-out scenes: generator seed 999 — the campaign datasets use
    # seeds 0/1/2, so these doodles were never trained on.
    rng = np.random.default_rng(999)
    cells = []
    for row in range(n_rows):
        scene = make_scene(rng)
        gt = render_image(scene, size)
        doodle = render_doodle(scene, size)
        samples = np.asarray(generate_images_diffusion(
            ["-c", cfg, "-n", "3", "-s", str(seed + row),
             "--diff_alg", "ddim", "--ddim_step_size", "20",
             "--use-ema", "--dtype", "bfloat16"],
            cond_img=doodle, save_locally=False))
        norm = lambda im: (im.astype(np.float32) - 127.5) / 127.5
        cells += [norm(gt), norm(doodle)] + list(samples[:3])
    _save_grid(np.clip(np.stack(cells), -1, 1), out, print)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/qc")
    ap.add_argument("--rows", type=int, default=5)
    ap.add_argument("--seed", type=int, default=7)
    a = ap.parse_args()
    sys.path.insert(0, REPO)

    grids = os.path.join(a.workdir, "results", "grids")
    os.makedirs(grids, exist_ok=True)
    cold_recon_grid(a.workdir, grids, a.rows, a.seed)
    doodle_steering_grid(a.workdir, grids, a.rows, a.seed)


if __name__ == "__main__":
    main()
