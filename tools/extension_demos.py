#!/usr/bin/env python3
"""Extension demo grids from a converged bundle (QUALITY.md visual evidence).

The quality campaign (tools/quality_campaign.py) scores samplers/objectives
with FID/KID; this companion renders the *extension* features the numbers
can't show — img2img (SDEdit-style --init_img_path) and inpainting
(RePaint-style --inpaint_img_path) — against the campaign's converged eps
bundle, so QUALITY.md can demonstrate them on a real trained model the way
the reference demonstrates its features with sample galleries
(/root/reference/README.md:166-184).

Grids written to {workdir}/results/grids/:
    demo_source.jpg          the real image driving both demos
    img2img_t300.jpg         25 variations, init noised to t=300 (faithful)
    img2img_t600.jpg         25 variations, t=600 (free reinterpretation)
    inpaint_left_kept.jpg    left half kept (mask >= 128), right half
                             synthesized per-step on the kept context

Usage:
    python tools/extension_demos.py --workdir /tmp/qc
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/qc")
    ap.add_argument("--bundle", default="eps")
    ap.add_argument("--n", type=int, default=25)
    a = ap.parse_args()
    sys.path.insert(0, REPO)

    import cv2
    import numpy as np

    from sdm_tpu.cli.evaluate_samples import _save_grid
    from sdm_tpu.cli.generate_images_diffusion import (
        generate_images_diffusion)

    grids = os.path.join(a.workdir, "results", "grids")
    os.makedirs(grids, exist_ok=True)
    cfg = os.path.join(a.workdir, "exports", a.bundle, "config.json")
    if not os.path.exists(cfg):
        raise SystemExit(f"bundle {cfg} missing — run the campaign's "
                         "export stage first")
    shapes = sorted(glob.glob(os.path.join(a.workdir, "shapes", "*.jpg")))
    if not shapes:
        raise SystemExit("shapes dataset missing — run the campaign's "
                         "dataset stage first")
    src = shapes[0]

    import json
    m0 = json.load(open(cfg))["models"][0]
    h, w = int(m0["img_H"]), int(m0["img_W"])
    img = cv2.imread(src)
    if img.shape[:2] != (h, w):
        # Dataset resolution can differ from the bundle's (e.g. the tiny
        # plumbing campaign trains 32x32 models on the 64x64 shapes set) —
        # the demo drives the MODEL, so resize the source to its grid.
        img = cv2.resize(img, (w, h), interpolation=cv2.INTER_AREA)
        src = os.path.join(a.workdir, "demo_source_model_res.png")
        cv2.imwrite(src, img)
    _save_grid(((img[None].astype(np.float32) - 127.5) / 127.5),
               os.path.join(grids, "demo_source.jpg"), print)
    # Mask convention (generator --inpaint_mask_path): >= 128 KEPT from the
    # image, < 128 synthesized. Keep the left half.
    mask = np.zeros(img.shape[:2], np.uint8)
    mask[:, : img.shape[1] // 2] = 255
    mask_path = os.path.join(a.workdir, "demo_mask.png")
    cv2.imwrite(mask_path, mask)

    common = ["-c", cfg, "--use-ema", "--dtype", "bfloat16",
              "-n", str(a.n), "--diff_alg", "ddim", "--ddim_step_size", "20",
              "-s", "7"]
    jobs = [
        ("img2img_t300",
         ["--init_img_path", src, "--init_noise_step", "300"]),
        ("img2img_t600",
         ["--init_img_path", src, "--init_noise_step", "600"]),
        ("inpaint_left_kept",
         ["--inpaint_img_path", src, "--inpaint_mask_path", mask_path]),
    ]
    for name, extra in jobs:
        out = os.path.join(grids, f"{name}.jpg")
        if os.path.exists(out):
            print(f"[demos] {name} exists")
            continue
        imgs = generate_images_diffusion(common + extra, save_locally=False)
        _save_grid(np.asarray(imgs)[: a.n], out, print)
        print(f"[demos] wrote {out}")


if __name__ == "__main__":
    main()
