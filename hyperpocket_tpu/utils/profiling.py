"""Profiling/tracing hooks (SURVEY.md §5 — the reference has none beyond
epoch wall-clock; here we add first-class jax.profiler integration).

* ``trace(dir)``: context manager around ``jax.profiler`` for a TensorBoard-
  loadable device trace of whatever runs inside.
* ``StepTimer``: cheap rolling step-time/throughput stats for training logs.
"""

from __future__ import annotations

import contextlib
import time
from collections import deque


@contextlib.contextmanager
def trace(log_dir: str):
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling mean step time + items/sec over the last ``window`` steps."""

    def __init__(self, window: int = 50):
        self._durations: deque[float] = deque(maxlen=window)
        self._items: deque[int] = deque(maxlen=window)
        self._start: float | None = None

    def start(self) -> None:
        self._start = time.perf_counter()

    def stop(self, items: int = 1) -> float:
        if self._start is None:
            raise RuntimeError("StepTimer.stop() without start()")
        dt = time.perf_counter() - self._start
        self._start = None
        self._durations.append(dt)
        self._items.append(items)
        return dt

    @property
    def mean_step_seconds(self) -> float:
        return sum(self._durations) / len(self._durations) if self._durations else 0.0

    @property
    def items_per_second(self) -> float:
        total = sum(self._durations)
        return sum(self._items) / total if total else 0.0
