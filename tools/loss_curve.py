#!/usr/bin/env python3
"""Loss-vs-steps curves from campaign training logs (plateau evidence).

The round-4 verdict's top weakness was adjudicating quality on models whose
loss was still falling at the step cutoff. This tool turns each campaign
training log (`{workdir}/logs/train_*.log`) into a downsampled curve JSON
plus one shared PNG, so "trained to a plateau" is a recorded measurement:

  {workdir}/results/curves/loss_<run>.json
      {"steps": [...], "loss": [...],            # per-bucket mean loss
       "plateau": {"last_decile_mean": ..., "prev_decile_mean": ...,
                   "drop_pct": ...}}             # how flat the tail is
  {workdir}/results/curves/loss_curves.png       # all runs, log-y

Parses the trainer's per-step lines ("Cum. Steps: N | ... | Diffusion: L |
..."), keeping the LAST occurrence of each step so resumed runs (which
replay a few log lines around the resume point) don't double-count.

Usage: python tools/loss_curve.py --workdir /tmp/qc
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re

LINE = re.compile(r"Cum\. Steps: ([\d,]+) \|.*\| Diffusion: ([0-9.eE+-]+)")


def parse_log(path: str) -> dict:
    """step -> loss, last occurrence wins (resume replays)."""
    out = {}
    with open(path, errors="replace") as f:
        for line in f:
            m = LINE.search(line)
            if m:
                out[int(m.group(1).replace(",", ""))] = float(m.group(2))
    return out


def bucketize(curve: dict, bucket: int) -> tuple:
    """Mean loss per `bucket`-step window -> (steps, losses)."""
    sums, counts = {}, {}
    for s, l in curve.items():
        b = ((s - 1) // bucket + 1) * bucket  # bucket labeled by its end
        sums[b] = sums.get(b, 0.0) + l
        counts[b] = counts.get(b, 0) + 1
    steps = sorted(sums)
    return steps, [sums[s] / counts[s] for s in steps]


def plateau_stats(losses: list) -> dict:
    """Mean of the last decile of buckets vs the decile before it — a
    near-zero drop is the plateau evidence."""
    n = len(losses)
    k = max(n // 10, 1)
    last = losses[-k:]
    prev = losses[-2 * k:-k] or last
    lm = sum(last) / len(last)
    pm = sum(prev) / len(prev)
    return {"last_decile_mean": lm, "prev_decile_mean": pm,
            "drop_pct": 100.0 * (pm - lm) / pm if pm else 0.0}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/qc")
    ap.add_argument("--bucket", type=int, default=250,
                    help="steps per averaging bucket")
    a = ap.parse_args()

    out_dir = os.path.join(a.workdir, "results", "curves")
    os.makedirs(out_dir, exist_ok=True)
    logs = sorted(glob.glob(os.path.join(a.workdir, "logs", "train_*.log")))
    if not logs:
        raise SystemExit(f"no train_*.log under {a.workdir}/logs — run the "
                         "campaign's training stages first")

    curves = {}
    for path in logs:
        run = os.path.basename(path)[len("train_"):-len(".log")]
        raw = parse_log(path)
        if not raw:
            print(f"[loss_curve] {run}: no parsable loss lines, skipped")
            continue
        steps, losses = bucketize(raw, a.bucket)
        stats = plateau_stats(losses)
        curves[run] = (steps, losses)
        with open(os.path.join(out_dir, f"loss_{run}.json"), "w") as f:
            json.dump({"steps": steps, "loss": losses,
                       "bucket_steps": a.bucket, "plateau": stats},
                      f, indent=1)
        print(f"[loss_curve] {run}: {len(raw):,} steps parsed; last-decile "
              f"mean {stats['last_decile_mean']:.5f} "
              f"({stats['drop_pct']:+.1f}% vs previous decile)")

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, ax = plt.subplots(figsize=(7, 4))
    for run, (steps, losses) in sorted(curves.items()):
        ax.plot(steps, losses, label=run, linewidth=1.2)
    ax.set_yscale("log")
    ax.set_xlabel("training step")
    ax.set_ylabel("loss (bucket mean, log scale)")
    ax.set_title("Campaign training curves")
    ax.legend(fontsize=8)
    ax.grid(True, which="both", alpha=0.25)
    fig.tight_layout()
    png = os.path.join(out_dir, "loss_curves.png")
    fig.savefig(png, dpi=120)
    print(f"[loss_curve] plot -> {png}")


if __name__ == "__main__":
    main()
