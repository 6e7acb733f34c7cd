#!/usr/bin/env python
"""Entry point parity with the reference's train_doodle_diffusion.py."""
from sdm_tpu.cli.train_doodle_diffusion import run

if __name__ == "__main__":
    run()
