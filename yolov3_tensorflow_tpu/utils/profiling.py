"""Profiling + step timing utilities.

The reference's only instrumentation is wall-clock around sess.run in the
video demo (video_test.py:76-93; SURVEY.md §5 "tracing: none"). This module
provides the TPU-native equivalents:

- `StepTimer`: p50/p95/mean wall-time meter with correct async-dispatch
  handling (block on the step output, not per-op)
- `trace` / `annotate`: jax.profiler wrappers writing TensorBoard-readable
  traces of device execution
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, List

import numpy as np


class StepTimer:
    """Wall-clock timer for jitted steps.

    Usage:
        timer = StepTimer()
        with timer.step():
            out = train_step(...)
            jax.block_until_ready(out)   # or pass out to .step(result=...)
    """

    def __init__(self, window: int = 500):
        self.window = window
        self._times: List[float] = []

    @contextlib.contextmanager
    def step(self, result=None) -> Iterator[None]:
        t0 = time.perf_counter()
        yield
        if result is not None:
            import jax
            jax.block_until_ready(result)
        self._times.append(time.perf_counter() - t0)
        if len(self._times) > self.window:
            self._times = self._times[-self.window:]

    def record(self, seconds: float) -> None:
        self._times.append(seconds)
        if len(self._times) > self.window:
            self._times = self._times[-self.window:]

    def summary(self) -> Dict[str, float]:
        if not self._times:
            return {"count": 0}
        arr = np.asarray(self._times)
        return {
            "count": int(arr.size),
            "mean_ms": float(arr.mean() * 1e3),
            "p50_ms": float(np.percentile(arr, 50) * 1e3),
            "p95_ms": float(np.percentile(arr, 95) * 1e3),
            "last_ms": float(arr[-1] * 1e3),
        }


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a device trace viewable in TensorBoard's profile plugin.

    with profiling.trace("./data/logs/profile"):
        run_some_steps()
    """
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region in the profiler timeline (jax.profiler.TraceAnnotation)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield
