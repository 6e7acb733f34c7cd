#!/usr/bin/env python
"""Entry point parity with the reference's create_diffusion_config.py."""
from sdm_tpu.cli.create_diffusion_config import run

if __name__ == "__main__":
    run()
