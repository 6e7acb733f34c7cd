#!/usr/bin/env python
"""Entry point parity with the reference's generate_sr_images_diffusion.py."""
from sdm_tpu.cli.generate_sr_images_diffusion import run

if __name__ == "__main__":
    run()
