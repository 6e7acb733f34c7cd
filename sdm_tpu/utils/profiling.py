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
    """Running steps/sec / images/sec over a sliding window.

    Also retains the last `max_intervals` per-step wall-time intervals so the
    bench harness can report distribution diagnostics (median/p90/max step
    time, recompile spikes) alongside the rate — a bare steps/sec hides
    whether a slow number means uniformly slow steps or a few outliers."""

    def __init__(self, window: int = 50, max_intervals: int = 10_000):
        self.window = window
        self.max_intervals = max_intervals
        self._times = []
        self._intervals = []

    def tick(self) -> None:
        now = time.perf_counter()
        if self._times:
            self._intervals.append(now - self._times[-1])
            if len(self._intervals) > self.max_intervals:
                self._intervals.pop(0)
        self._times.append(now)
        if len(self._times) > self.window + 1:
            self._times.pop(0)

    def steps_per_sec(self) -> float:
        if len(self._times) < 2:
            return float("nan")
        span = self._times[-1] - self._times[0]
        return (len(self._times) - 1) / span if span > 0 else float("nan")

    def intervals(self) -> list:
        """Per-step wall-time intervals (seconds), oldest first, capped at
        `max_intervals`. The first entry spans from the first host-synced
        loss (i.e. it excludes compile) to the second."""
        return list(self._intervals)
