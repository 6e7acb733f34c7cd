#!/usr/bin/env python
"""Entry point parity with the reference's train_diffusion.py."""
from sdm_tpu.cli.train_diffusion import run

if __name__ == "__main__":
    run()
