#!/usr/bin/env python
"""Entry point parity with the reference's export_models.py."""
from sdm_tpu.cli.export_models import run

if __name__ == "__main__":
    run()
