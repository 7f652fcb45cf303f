"""Profiling hooks (SURVEY.md §5: the reference had none).

- ``trace(log_dir)``: jax.profiler trace capture around a code region,
  viewable in TensorBoard / Perfetto.
- ``StepTimer``: wall-clock step timing with device synchronization
  (``jax.block_until_ready``) so times measure real device work.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Measure per-step wall time, synchronizing on a result tree."""

    def __init__(self):
        self._start: Optional[float] = None
        self.history: list = []

    def start(self) -> None:
        self._start = time.perf_counter()

    def stop(self, result=None) -> float:
        if result is not None:
            jax.block_until_ready(result)
        dt = time.perf_counter() - self._start
        self.history.append(dt)
        return dt

    @property
    def mean(self) -> float:
        return sum(self.history) / max(1, len(self.history))


def device_memory_stats() -> dict:
    """Per-device memory usage when the backend exposes it."""
    stats = {}
    for d in jax.devices():
        try:
            stats[str(d)] = d.memory_stats()
        except Exception:
            stats[str(d)] = None
    return stats
