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


def enable_compilation_cache(path: str = "/tmp/yolo_for_turbines_tpu_jit_cache"):
    """Enable JAX's persistent compilation cache (opt-in for CLIs).

    Full-model TPU compiles take ~90-100 s on this class of host; with the
    cache, every invocation after the first loads the executable from disk
    instead. OPT-IN, not wired into the CLIs: on remote-compile tunnel
    setups (the axon dev tunnel) the cache lookup was measured to hang the
    second invocation; enable only on hosts with local libtpu compilation.
    """
    import jax

    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
