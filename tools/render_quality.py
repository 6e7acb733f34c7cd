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
CLAIMS_MARKER = "<!-- CLAIMS_TABLE"


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


def _claims(summary: dict) -> str:
    """Compute the QUALITY.md "Claims tested" verdicts from the measured
    rows. Comparisons use excess FID over the real_vs_real floor (FID is not
    absolute under the randconv features; the floor is the scale), except
    where the claim itself is a plain ordering. A claim whose rows are
    missing renders as pending — verdicts never guess."""
    variants = summary.get("variants", {})

    def fid(name):
        r = variants.get(name)
        return r.get("fid") if r else None

    floor = fid("real_vs_real")

    def excess(name):
        f = fid(name)
        return None if (f is None or floor is None) else f - floor

    def show(name):
        f = fid(name)
        return "?" if f is None else f"{f:.2f}"

    rows = []

    def add(claim, verdict):
        rows.append(f"| {claim} | {verdict} |")

    def pending(*names):
        missing = [n for n in names if fid(n) is None]
        if missing or floor is None:
            return ("pending (missing rows: "
                    + ", ".join(missing + ([] if floor is not None
                                           else ["real_vs_real"])) + ")")
        return None

    # ~10 dpmpp steps reach ddim-50 quality: excess FID within 25%.
    p = pending("eps_dpmpp10", "eps_ddim50")
    if p is None:
        ok = excess("eps_dpmpp10") <= 1.25 * excess("eps_ddim50")
        p = (f"{'**backed**' if ok else '**not backed** at 64²'}: "
             f"dpmpp-10 FID {show('eps_dpmpp10')} vs ddim-50 "
             f"{show('eps_ddim50')} (floor {floor:.2f}; backed = excess "
             "over floor within 25%)")
    add("~10 dpmpp steps reach ddim-50 quality", p)

    # Karras spacing at low step counts, 2nd-order solvers.
    p = pending("eps_dpmpp10", "eps_dpmpp10_karras",
                "eps_heun10", "eps_heun10_karras")
    if p is None:
        wins = [fid("eps_dpmpp10_karras") < fid("eps_dpmpp10"),
                fid("eps_heun10_karras") < fid("eps_heun10")]
        word = ("**backed**" if all(wins) else
                "**mixed**" if any(wins) else "**not backed** at 64²")
        p = (f"{word}: dpmpp-10 {show('eps_dpmpp10')} → Karras "
             f"{show('eps_dpmpp10_karras')}; heun-10 {show('eps_heun10')} "
             f"→ Karras {show('eps_heun10_karras')}")
    add("Karras spacing improves few-step 2nd-order sampling", p)

    # EMA at convergence.
    p = pending("eps_ddim50", "eps_ddim50_noema")
    if p is None:
        ok = fid("eps_ddim50") < fid("eps_ddim50_noema")
        p = (f"{'**backed**' if ok else '**not backed** at 64²'}: ddim-50 "
             f"EMA {show('eps_ddim50')} vs raw {show('eps_ddim50_noema')}")
    add("EMA improves sample quality at convergence", p)

    # min-SNR-γ weighting.
    p = pending("minsnr_ddim50", "eps_ddim50")
    if p is None:
        ok = fid("minsnr_ddim50") < fid("eps_ddim50")
        p = (f"{'**backed**' if ok else '**not backed** at 64²'}: "
             f"min-SNR-5 {show('minsnr_ddim50')} vs uniform "
             f"{show('eps_ddim50')} (both ddim-50+EMA)")
    add("min-SNR-γ improves over uniform MSE weighting", p)

    # v-parameterization comparable quality: excess within 50%.
    p = pending("v_ddim50", "eps_ddim50")
    if p is None:
        ok = excess("v_ddim50") <= 1.5 * excess("eps_ddim50")
        p = (f"{'**backed**' if ok else '**not backed** at 64²'}: "
             f"v {show('v_ddim50')} vs eps {show('eps_ddim50')} (floor "
             f"{floor:.2f}; comparable = excess within 50%)")
    add("v-parameterization trains to comparable quality", p)

    # Distilled students approach teacher quality: beat the undistilled
    # teacher at the same call count AND keep excess within 2x of the
    # teacher's ddim-50 headline.
    p = pending("distill1_2calls", "distill2_3calls",
                "eps_ddim2calls", "eps_ddim3calls", "eps_ddim50")
    if p is None:
        beat = [fid("distill1_2calls") < fid("eps_ddim2calls"),
                fid("distill2_3calls") < fid("eps_ddim3calls")]
        near = excess("distill2_3calls") <= 2.0 * excess("eps_ddim50")
        word = ("**backed**" if all(beat) and near else
                "**mixed**" if any(beat) else "**not backed** at 64²")
        p = (f"{word}: 2-call student {show('distill1_2calls')} vs teacher "
             f"{show('eps_ddim2calls')}; 3-call {show('distill2_3calls')} "
             f"vs {show('eps_ddim3calls')}; teacher ddim-50 "
             f"{show('eps_ddim50')}")
    add("distilled 2-3-call students approach teacher quality", p)

    # SR cascade vs plain upsampling (scored against the held-out HR set).
    sr_floor = fid("sr_hr_floor")
    missing = [n for n in ("sr_cascade", "sr_upsample_baseline")
               if fid(n) is None]
    if missing or sr_floor is None:
        p = ("pending (missing rows: " + ", ".join(
            missing + ([] if sr_floor is not None else ["sr_hr_floor"]))
            + ")")
    else:
        ok = fid("sr_cascade") < fid("sr_upsample_baseline")
        p = (f"{'**backed**' if ok else '**not backed**'}: cascade "
             f"{show('sr_cascade')} vs plain upsample "
             f"{show('sr_upsample_baseline')} at 128² (HR floor "
             f"{sr_floor:.2f})")
    add("SR cascade beats plain upsampling at 128²", p)

    return "\n".join(["| claim (from README/TODO) | verdict |", "|---|---|"]
                     + rows) + "\n"


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
    claims = _claims(summary)
    if not a.write:
        print(table)
        print(claims)
        return
    qpath = os.path.join(REPO, "QUALITY.md")
    text = open(qpath).read()
    for marker, block in ((MARKER, table), (CLAIMS_MARKER, claims)):
        try:
            start = text.index(marker)
        except ValueError:
            raise SystemExit(
                f"QUALITY.md is missing the marker {marker!r} — restore it "
                "(comment line above the section) so --write knows where "
                "to patch")
        start = text.index("\n", start) + 1  # keep the marker line
        # Patch up to the next section heading, or to end-of-file when the
        # marker sits in the last section.
        end = text.find("\n## ", start)
        if end == -1:
            end = len(text)
        text = text[:start] + "\n" + block + text[end:]
    open(qpath, "w").write(text)
    print(f"QUALITY.md results + claims tables updated from {a.summary}")


if __name__ == "__main__":
    main()
