#!/usr/bin/env python
"""Entry point parity with the reference's generate_images_cold_diffusion.py."""
from sdm_tpu.cli.generate_images_cold_diffusion import run

if __name__ == "__main__":
    run()
