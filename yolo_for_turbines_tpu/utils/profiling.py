"""Profiling hooks: jax.profiler traces + per-step wall timing.

The reference has no profiling beyond tqdm + a wall-clock W&B metric
(SURVEY.md section 5). TPU-native: `trace_scope` captures a TensorBoard-
loadable device trace; `StepTimer` tracks host-side step latency percentiles
cheaply enough to stay on in production.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional


@contextlib.contextmanager
def trace_scope(log_dir: str = "/tmp/jax-trace"):
    """Capture a jax.profiler trace (view with TensorBoard's profile tab)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Host wall-clock step timer with percentile summaries."""

    def __init__(self, capacity: int = 10_000):
        self.samples: List[float] = []
        self.capacity = capacity
        self._t0: Optional[float] = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self) -> float:
        dt = time.perf_counter() - self._t0
        if len(self.samples) < self.capacity:
            self.samples.append(dt)
        return dt

    @contextlib.contextmanager
    def measure(self):
        self.start()
        yield
        self.stop()

    def summary(self) -> Dict[str, float]:
        import numpy as np

        if not self.samples:
            return {}
        arr = np.asarray(self.samples)
        return {
            "steps": len(arr),
            "mean_s": float(arr.mean()),
            "p50_s": float(np.percentile(arr, 50)),
            "p90_s": float(np.percentile(arr, 90)),
            "p99_s": float(np.percentile(arr, 99)),
        }
