"""Profiling & step-timing utilities (the reference has none; SURVEY
section 5 flags this as a required addition for the mols/sec north star)."""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax

__all__ = ["StepTimer", "trace"]


class StepTimer:
    """Rolling-window steps/sec with warmup exclusion."""

    def __init__(self, window: int = 100):
        self.window = window
        self._times = []

    def tick(self):
        self._times.append(time.perf_counter())
        if len(self._times) > self.window + 1:
            self._times.pop(0)

    @property
    def steps_per_sec(self) -> Optional[float]:
        if len(self._times) < 2:
            return None
        dt = self._times[-1] - self._times[0]
        return (len(self._times) - 1) / dt if dt > 0 else None


@contextlib.contextmanager
def trace(logdir: Optional[str]):
    """jax.profiler trace context (no-op when logdir is falsy)."""
    if not logdir:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
