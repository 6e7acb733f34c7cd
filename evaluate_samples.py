#!/usr/bin/env python3
"""Entry-point shim: sample-quality evaluation (FID/KID) CLI.

No reference counterpart — the reference ships no quality-metric tooling
(SURVEY.md §6). See sdm_tpu/cli/evaluate_samples.py."""

from sdm_tpu.cli.evaluate_samples import run

if __name__ == "__main__":
    run()
