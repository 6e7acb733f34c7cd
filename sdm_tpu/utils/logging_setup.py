"""Logging setup matching the reference's format (train_diffusion.py:118-127):
DEBUG level, '%(asctime)s %(message)s', simultaneously to {out_dir}/{project}.log
and stdout."""

from __future__ import annotations

import logging
import os


def setup_logging(out_dir: str, project_name: str) -> None:
    log_path = os.path.join(out_dir, f"{project_name}.log")
    # Reset handlers so repeated CLI invocations in one process don't stack.
    root = logging.getLogger()
    for h in list(root.handlers):
        root.removeHandler(h)
    logging.basicConfig(
        format="%(asctime)s %(message)s",
        encoding="utf-8",
        handlers=[logging.FileHandler(log_path), logging.StreamHandler()],
        level=logging.DEBUG)
    # Root-DEBUG would also surface JAX-internal debug chatter (the reference
    # had no such dependency); keep library loggers quiet.
    for noisy in ("jax", "jax._src", "absl", "orbax"):
        logging.getLogger(noisy).setLevel(logging.WARNING)
