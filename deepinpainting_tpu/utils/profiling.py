"""Tracing/profiling hooks (SURVEY.md §5 tracing row).

The reference captures time.time() stamps and never uses them (train.ipynb
cell 2); here profiling is a first-class switch: `trace()` wraps a region
in a jax.profiler trace (Perfetto/TensorBoard-readable), and StepTimer
gives steady-state per-step wall times with device sync.
"""

from __future__ import annotations

import contextlib
import time
from typing import List, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """jax.profiler trace context; no-op when log_dir is falsy."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock per-step timer; `block` syncs on a device array so the
    measured interval covers real device work, not dispatch."""

    def __init__(self):
        self.times: List[float] = []
        self._t0: Optional[float] = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, block_on=None) -> float:
        if block_on is not None:
            jax.block_until_ready(block_on)
        dt = time.perf_counter() - self._t0
        self.times.append(dt)
        return dt

    def summary(self, skip_first: int = 1) -> dict:
        xs = self.times[skip_first:] or self.times
        return {"mean_s": sum(xs) / len(xs), "min_s": min(xs),
                "max_s": max(xs), "steps": len(xs)}
