#!/usr/bin/env python
"""Entry point parity with the reference's train_SR_diffusion.py."""
from sdm_tpu.cli.train_SR_diffusion import run

if __name__ == "__main__":
    run()
