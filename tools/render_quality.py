#!/usr/bin/env python3
"""Render the quality-campaign summary into QUALITY.md's results table.

Reads the `summary.json` written by tools/quality_campaign.py stage
`aggregate` and emits a markdown table (one row per eval variant, FID/KID
vs the shared real set, ordered worst-case-cost last). With --write, the
table replaces the block between the `<!-- RESULTS_TABLE` marker and the
next `## ` heading in QUALITY.md, so the doc regenerates from the raw
numbers with one command:

    python tools/render_quality.py --summary /tmp/qc/results/summary.json --write
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# variant -> (objective/run, sampler description, model calls per image)
ROWS = [
    ("real_vs_real", "—", "real half A vs half B (metric floor)", "—"),
    ("eps_ddpm1000", "eps+EMA", "DDPM, 1000 steps", 1000),
    ("eps_ddim50", "eps+EMA", "DDIM, 50 steps", 50),
    ("eps_ddim50_noema", "eps (raw weights)", "DDIM, 50 steps", 50),
    ("minsnr_ddim50", "eps+min-SNR-5+EMA", "DDIM, 50 steps", 50),
    ("v_ddim50", "V+EMA", "DDIM, 50 steps", 50),
    ("eps_ddim10", "eps+EMA", "DDIM, 10 steps", 10),
    ("eps_dpmpp10", "eps+EMA", "DPM-Solver++(2M), 10 steps", 10),
    ("eps_dpmpp10_karras", "eps+EMA", "DPM-Solver++(2M), 10 Karras steps", 10),
    ("v_dpmpp10", "V+EMA", "DPM-Solver++(2M), 10 steps", 10),
    ("eps_heun10", "eps+EMA", "Heun, 10 steps", 19),
    ("eps_heun10_karras", "eps+EMA", "Heun, 10 Karras steps", 19),
    ("distill4_5calls", "eps distilled (ss250)", "DDIM, 5 steps", 5),
    ("eps_ddim3calls", "eps+EMA (teacher)", "DDIM, 3 steps", 3),
    ("distill2_3calls", "eps distilled (ss500)", "DDIM, 3 steps", 3),
    ("eps_ddim2calls", "eps+EMA (teacher)", "DDIM, 2 steps", 2),
    ("distill1_2calls", "eps distilled (ss1000)", "DDIM, 2 steps", 2),
    ("cold_cold50", "cold (x0)+EMA", "cold sampling, 50 steps", 50),
    ("cold_cold10", "cold (x0)+EMA", "cold sampling, 10 steps", 10),
]

# 128² cascade rows score against the held-out HR set (not the 64² real
# set the main table shares), so they render as their own table.
SR_ROWS = [
    ("sr_hr_floor", "—", "real HR half A vs half B (metric floor)", "—"),
    ("sr_upsample_baseline", "—",
     "base DDIM-50 samples, plain area upsample to 128²", 50),
    ("sr_cascade", "eps+EMA → SR(residual-x0)+EMA",
     "base DDIM-50 → SR cold sampling, 20 steps", 70),
]

MARKER = "<!-- RESULTS_TABLE"


def fmt(v, digits=2):
    return f"{v:.{digits}f}" if isinstance(v, (int, float)) else "—"


HEADER = [
    "| variant | weights | sampler | model calls | FID ↓ | KID ×10³ ↓ |",
    "|---|---|---|---|---|---|",
]


def _row(name: str, run: str, sampler: str, calls, r: dict) -> str:
    kid = (f"{r['kid'] * 1e3:.2f} ± {r['kid_std'] * 1e3:.2f}"
           if "kid" in r else "—")
    return (f"| {name} | {run} | {sampler} | {calls} | "
            f"{fmt(r.get('fid'))} | {kid} |")


def render(summary: dict) -> str:
    variants = summary.get("variants", {})
    lines = list(HEADER)
    seen = set()
    for name, run, sampler, calls in ROWS:
        r = variants.get(name)
        if r is None:
            continue
        seen.add(name)
        lines.append(_row(name, run, sampler, calls, r))
    sr_lines = []
    for name, run, sampler, calls in SR_ROWS:
        r = variants.get(name)
        if r is None:
            continue
        seen.add(name)
        sr_lines.append(_row(name, run, sampler, calls, r))
    for name in sorted(set(variants) - seen):  # anything ROWS doesn't know
        lines.append(_row(name, "", "", "", variants[name]))
    meta = [
        "",
        f"{summary.get('steps', '?')} training steps per run; "
        f"{variants.get('eps_ddim50', {}).get('n_generated', '?')} generated "
        f"vs {variants.get('eps_ddim50', {}).get('n_real', '?')} real images "
        "per row; fixed-seed randconv features (relative ordering is the "
        "claim — see Setup). Raw JSONs + grids: `docs/quality/`.",
    ]
    if sr_lines:
        sr_r = variants.get("sr_cascade", {})
        meta += [
            "",
            "**SR cascade at 128²** (scored against the held-out HR "
            "shapes set):",
            "",
        ] + HEADER + sr_lines + [
            "",
            f"{sr_r.get('n_generated', '?')} cascade samples vs "
            f"{sr_r.get('n_real', '?')} real HR images.",
        ]
    return "\n".join(lines + meta) + "\n"


def publish(results_dir: str) -> None:
    """Copy the campaign's durable artifacts (result JSONs, sample grids,
    stage wall-clock record) from the workdir into docs/quality/ so they
    are committed next to QUALITY.md; heavy artifacts (checkpoints,
    datasets, generated-image dirs) stay in the workdir."""
    dst = os.path.join(REPO, "docs", "quality")
    os.makedirs(os.path.join(dst, "grids"), exist_ok=True)
    n = 0
    for p in sorted(glob.glob(os.path.join(results_dir, "*.json"))):
        shutil.copy2(p, os.path.join(dst, os.path.basename(p)))
        n += 1
    for p in sorted(glob.glob(os.path.join(results_dir, "grids", "*.jpg"))):
        shutil.copy2(p, os.path.join(dst, "grids", os.path.basename(p)))
        n += 1
    curves = sorted(glob.glob(os.path.join(results_dir, "curves", "*")))
    if curves:
        os.makedirs(os.path.join(dst, "curves"), exist_ok=True)
        for p in curves:
            shutil.copy2(p, os.path.join(dst, "curves", os.path.basename(p)))
            n += 1
    times = os.path.join(os.path.dirname(results_dir), "stage_times.json")
    if os.path.exists(times):
        shutil.copy2(times, os.path.join(dst, "stage_times.json"))
        n += 1
    print(f"published {n} artifacts to {dst}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--summary", default="/tmp/qc/results/summary.json")
    ap.add_argument("--write", action="store_true",
                    help="patch QUALITY.md in place (default: print)")
    ap.add_argument("--publish", action="store_true",
                    help="also copy result JSONs/grids/stage_times into "
                         "docs/quality/")
    a = ap.parse_args()
    summary = json.load(open(a.summary))
    if a.publish:
        publish(os.path.dirname(os.path.abspath(a.summary)))
    table = render(summary)
    if not a.write:
        print(table)
        return
    qpath = os.path.join(REPO, "QUALITY.md")
    text = open(qpath).read()
    try:
        start = text.index(MARKER)
    except ValueError:
        raise SystemExit(
            f"QUALITY.md is missing the results-table marker {MARKER!r} — "
            "restore it (comment line above the results section) so --write "
            "knows where to patch")
    start = text.index("\n", start) + 1  # keep the marker line
    # Patch up to the next section heading, or to end-of-file when the
    # marker sits in the last section.
    end = text.find("\n## ", start)
    if end == -1:
        end = len(text)
    open(qpath, "w").write(text[:start] + "\n" + table + text[end:])
    print(f"QUALITY.md results table updated from {a.summary}")


if __name__ == "__main__":
    main()
