#!/usr/bin/env python
"""Progressive distillation entry point (TPU-build extension; no reference
counterpart — see sdm_tpu/train/distill.py)."""
from sdm_tpu.cli.distill_diffusion import run

if __name__ == "__main__":
    run()
