"""Procedural "shapes" dataset for converged-run demonstrations.

The reference validates quality against released HuggingFace checkpoints
(README.md:154-163), which this zero-egress environment cannot fetch. This
generator builds an unlimited local stand-in: anti-aliased colored shapes
(1-3 circles / rectangles / triangles) over smooth two-color gradient
backgrounds — enough structure that a diffusion model must learn layout,
palette, and edges, and a fixed distribution FID/KID can score against.

--size renders at any resolution (128 for the SR-cascade HR set); a given
(--seed, index) draws the same scene at every size, so HR/LR pairs line up.
--doodle-out additionally writes black-on-white outline sketches of each
scene's shapes plus a TinyDB-format json pairing them with the images — the
doodle-conditioned trainer's dataset (reference custom_dataset/
doodle_dataset.py semantics; see sdm_tpu/data/datasets.py DoodleImgDataset).

Usage:
    python tools/make_shapes_dataset.py --out /tmp/shapes --n 10000
    python tools/make_shapes_dataset.py --out /tmp/hr --n 8000 --size 128
    python tools/make_shapes_dataset.py --out /tmp/sh --n 8000 \
        --doodle-out /tmp/sh_doodles --db /tmp/doodle_db.json
"""

import argparse
import json
import os

import cv2
import numpy as np


def make_scene(rng: np.random.Generator) -> dict:
    """Draw all random choices for one scene in UNIT coordinates — rendering
    at any size then yields the same layout (HR/LR alignment for SR)."""
    shapes = []
    for _ in range(rng.integers(1, 4)):
        color = tuple(float(c) for c in rng.uniform(0, 255, 3))
        kind = int(rng.integers(0, 3))
        cx, cy = rng.uniform(0.15, 0.85, 2)
        r = rng.uniform(0.08, 0.28)
        extra = {}
        if kind == 1:
            extra["wh"] = rng.uniform(0.6, 1.4, 2) * r
            extra["theta"] = rng.uniform(0, np.pi)
        elif kind == 2:
            extra["angles"] = rng.uniform(0, 2 * np.pi, 3)
        shapes.append(dict(kind=kind, color=color, cx=cx, cy=cy, r=r,
                           **extra))
    return dict(c0=rng.uniform(30, 225, 3), c1=rng.uniform(30, 225, 3),
                ang=rng.uniform(0, 2 * np.pi), shapes=shapes)


def _draw_shapes(big: np.ndarray, scene: dict, scale: float,
                 outline: bool = False) -> None:
    """Render the scene's shapes onto `big` (filled, or outline sketch)."""
    thickness = max(int(scale * 0.02), 1) if outline else -1
    for s in scene["shapes"]:
        color = (0.0, 0.0, 0.0) if outline else s["color"]
        cx, cy, r = s["cx"] * scale, s["cy"] * scale, s["r"] * scale
        if s["kind"] == 0:
            cv2.circle(big, (int(cx), int(cy)), int(r), color, thickness,
                       lineType=cv2.LINE_AA)
        elif s["kind"] == 1:
            w, h = s["wh"] * scale
            box = cv2.boxPoints(((cx, cy), (2 * w, 2 * h),
                                 np.degrees(s["theta"])))
            if outline:
                cv2.polylines(big, [box.astype(np.int32)], True, color,
                              thickness, lineType=cv2.LINE_AA)
            else:
                cv2.fillConvexPoly(big, box.astype(np.int32), color,
                                   lineType=cv2.LINE_AA)
        else:
            pts = np.stack([(cx + r * np.cos(a), cy + r * np.sin(a))
                            for a in s["angles"]])
            if outline:
                cv2.polylines(big, [pts.astype(np.int32)], True, color,
                              thickness, lineType=cv2.LINE_AA)
            else:
                cv2.fillConvexPoly(big, pts.astype(np.int32), color,
                                   lineType=cv2.LINE_AA)


def render_image(scene: dict, size: int = 64) -> np.ndarray:
    # Smooth linear gradient background between the scene's two BGR colors.
    c0, c1, ang = scene["c0"], scene["c1"], scene["ang"]
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / (size - 1)
    t = (np.cos(ang) * xx + np.sin(ang) * yy)
    t = (t - t.min()) / (t.max() - t.min() + 1e-8)
    img = (c0[None, None] * (1 - t[..., None])
           + c1[None, None] * t[..., None]).astype(np.float32)

    # 4x supersampled shape layer for clean anti-aliased edges.
    ss = 4
    big = cv2.resize(img, (size * ss, size * ss),
                     interpolation=cv2.INTER_LINEAR)
    _draw_shapes(big, scene, scale=size * ss)
    img = cv2.resize(big, (size, size), interpolation=cv2.INTER_AREA)
    return np.clip(img, 0, 255).astype(np.uint8)


def render_doodle(scene: dict, size: int = 64) -> np.ndarray:
    """Black outline sketch of the scene's shapes on white — the doodle
    conditioning image (no background gradient: the model must invent it)."""
    ss = 4
    big = np.full((size * ss, size * ss, 3), 255.0, np.float32)
    _draw_shapes(big, scene, scale=size * ss, outline=True)
    img = cv2.resize(big, (size, size), interpolation=cv2.INTER_AREA)
    return np.clip(img, 0, 255).astype(np.uint8)


def make_image(rng: np.random.Generator, size: int = 64) -> np.ndarray:
    """Back-compat single-image API (round-4 callers/tests)."""
    return render_image(make_scene(rng), size)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--n", type=int, default=10_000)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--doodle-out", default=None,
                    help="also write outline-sketch conditioning images here")
    ap.add_argument("--db", default=None,
                    help="TinyDB-format json pairing images with doodles "
                         "(required with --doodle-out)")
    args = ap.parse_args()
    if (args.doodle_out is None) != (args.db is None):
        ap.error("--doodle-out and --db go together")

    os.makedirs(args.out, exist_ok=True)
    if args.doodle_out:
        os.makedirs(args.doodle_out, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    rows = []
    for i in range(args.n):
        scene = make_scene(rng)
        img_path = os.path.join(args.out, f"shape_{i:06d}.jpg")
        cv2.imwrite(img_path, render_image(scene, args.size),
                    [cv2.IMWRITE_JPEG_QUALITY, 92])
        if args.doodle_out:
            dpath = os.path.join(args.doodle_out, f"doodle_{i:06d}.jpg")
            cv2.imwrite(dpath, render_doodle(scene, args.size),
                        [cv2.IMWRITE_JPEG_QUALITY, 92])
            rows.append({"filename": img_path, "doodle": dpath})
        if (i + 1) % 1000 == 0:
            print(f"{i + 1}/{args.n}")
    if args.db:
        # TinyDB file format (sdm_tpu/data/tinydb_compat.py write_tables).
        import sys
        sys.path.insert(0, os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        from sdm_tpu.data.tinydb_compat import write_tables
        write_tables(args.db, {
            "Data": rows,
            "Labels": [{"labels": ["doodle"]}],
        })
        print(f"doodle db -> {args.db}")


if __name__ == "__main__":
    main()
