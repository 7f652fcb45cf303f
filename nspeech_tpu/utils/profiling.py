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


def summarize_trace(trace_dir: str, top: int = 25):
    """Aggregate a captured ``trace(log_dir)`` profile into per-op totals.

    Reads the Chrome-trace json the jax profiler writes under
    ``<trace_dir>/plugins/profile/<ts>/*.trace.json.gz`` and returns a list
    of (total_ms, count, op_name) sorted by total device time — the same
    view that located the decoder-scan backward as the Tacotron-2 training
    bottleneck. Python-level rows ($file:line) and dispatch wrappers are
    dropped; ``while``/fusion rows carry their HLO names.
    """
    import collections
    import glob
    import gzip
    import json
    import os

    pats = sorted(glob.glob(os.path.join(
        trace_dir, "plugins", "profile", "*", "*.trace.json.gz")))
    if not pats:
        raise FileNotFoundError(f"no trace json under {trace_dir}")
    totals: collections.Counter = collections.Counter()
    counts: collections.Counter = collections.Counter()
    with gzip.open(pats[-1]) as f:
        data = json.load(f)
    for e in data.get("traceEvents", []):
        name = e.get("name", "")
        if (e.get("ph") != "X" or "dur" not in e or name.startswith("$")
                or "(" in name):
            continue
        totals[name] += e["dur"]
        counts[name] += 1
    return [(us / 1000.0, counts[name], name)
            for name, us in totals.most_common(top)]


def print_trace_summary(trace_dir: str, top: int = 25) -> None:
    for ms, n, name in summarize_trace(trace_dir, top):
        print(f"{ms:9.2f} ms  x{n:6d}  {name}")


if __name__ == "__main__":  # python -m nspeech_tpu.utils.profiling <dir>
    import sys

    print_trace_summary(sys.argv[1],
                        int(sys.argv[2]) if len(sys.argv) > 2 else 25)
