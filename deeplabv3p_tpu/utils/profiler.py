"""Profiling & timing utilities.

The reference has no tracer — only wall-clock prints (SURVEY.md §5:
deeplab.py:86-89, eval.py:626-629, C++ per-stage timers). TPU-native
equivalents:

* `trace(log_dir)` — context manager around `jax.profiler` producing
  TensorBoard-loadable XPlane traces of device execution;
* `StepTimer` — per-step wall-clock aggregation with percentile summary
  (the train-loop analogue of the C++ apps' warmup+timed invoke loops);
* `annotate(name)` — TraceAnnotation wrapper so custom phases (augment,
  train_step, eval) show up on the trace timeline.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import numpy as np


@contextlib.contextmanager
def trace(log_dir: str, enabled: bool = True):
    """Capture a jax.profiler trace into `log_dir` (TensorBoard format)."""
    import jax

    if not enabled:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region on the profiler timeline."""
    import jax

    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Wall-clock step timing with warmup skip and percentile summary."""

    def __init__(self, warmup: int = 1):
        self.warmup = warmup
        self._times: list[float] = []
        self._t0: Optional[float] = None
        self._count = 0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self._count += 1
        if self._count > self.warmup:
            self._times.append(dt)

    def summary(self) -> dict:
        if not self._times:
            return {"steps": 0}
        arr = np.asarray(self._times)
        return {
            "steps": len(arr),
            "mean_ms": float(arr.mean() * 1e3),
            "p50_ms": float(np.percentile(arr, 50) * 1e3),
            "p90_ms": float(np.percentile(arr, 90) * 1e3),
            "max_ms": float(arr.max() * 1e3),
        }
