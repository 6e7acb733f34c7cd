"""Procedural 64x64 "shapes" dataset for converged-run demonstrations.

The reference validates quality against released HuggingFace checkpoints
(README.md:154-163), which this zero-egress environment cannot fetch. This
generator builds an unlimited local stand-in: anti-aliased colored shapes
(1-3 circles / rectangles / triangles) over smooth two-color gradient
backgrounds — enough structure that a diffusion model must learn layout,
palette, and edges, and a fixed distribution FID/KID can score against.

Usage: python tools/make_shapes_dataset.py --out /tmp/shapes --n 10000
"""

import argparse
import os

import cv2
import numpy as np


def make_image(rng: np.random.Generator, size: int = 64) -> np.ndarray:
    # Smooth linear gradient background between two random BGR colors.
    c0 = rng.uniform(30, 225, 3)
    c1 = rng.uniform(30, 225, 3)
    ang = rng.uniform(0, 2 * np.pi)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / (size - 1)
    t = (np.cos(ang) * xx + np.sin(ang) * yy)
    t = (t - t.min()) / (t.max() - t.min() + 1e-8)
    img = (c0[None, None] * (1 - t[..., None])
           + c1[None, None] * t[..., None]).astype(np.float32)

    # 4x supersampled shape layer for clean anti-aliased edges.
    ss = 4
    big = cv2.resize(img, (size * ss, size * ss),
                     interpolation=cv2.INTER_LINEAR)
    for _ in range(rng.integers(1, 4)):
        color = tuple(float(c) for c in rng.uniform(0, 255, 3))
        kind = rng.integers(0, 3)
        cx, cy = rng.uniform(0.15, 0.85, 2) * size * ss
        r = rng.uniform(0.08, 0.28) * size * ss
        if kind == 0:
            cv2.circle(big, (int(cx), int(cy)), int(r), color, -1,
                       lineType=cv2.LINE_AA)
        elif kind == 1:
            w, h = rng.uniform(0.6, 1.4, 2) * r
            th = rng.uniform(0, np.pi)
            box = cv2.boxPoints(((cx, cy), (2 * w, 2 * h),
                                 np.degrees(th)))
            cv2.fillConvexPoly(big, box.astype(np.int32), color,
                               lineType=cv2.LINE_AA)
        else:
            pts = np.stack([(cx + r * np.cos(a), cy + r * np.sin(a))
                            for a in rng.uniform(0, 2 * np.pi, 3)])
            cv2.fillConvexPoly(big, pts.astype(np.int32), color,
                               lineType=cv2.LINE_AA)
    img = cv2.resize(big, (size, size), interpolation=cv2.INTER_AREA)
    return np.clip(img, 0, 255).astype(np.uint8)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--n", type=int, default=10_000)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    for i in range(args.n):
        img = make_image(rng, args.size)
        cv2.imwrite(os.path.join(args.out, f"shape_{i:06d}.jpg"), img,
                    [cv2.IMWRITE_JPEG_QUALITY, 92])
        if (i + 1) % 1000 == 0:
            print(f"{i + 1}/{args.n}")


if __name__ == "__main__":
    main()
