#!/usr/bin/env python3
"""Entry-point shim: HTTP serving of exported diffusion bundles.

No reference counterpart (its generators are one-shot batch CLIs,
generate_images_diffusion.py). See sdm_tpu/cli/serve_diffusion.py."""

from sdm_tpu.cli.serve_diffusion import run

if __name__ == "__main__":
    run()
