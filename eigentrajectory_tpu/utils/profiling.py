"""Profiling / tracing utilities — new capability, absent in the reference
(SURVEY §5: its only visibility is tqdm bars).

* trace_annotation: jax.profiler.TraceAnnotation context (phases show up in
  TensorBoard / xprof captures).
* StepTimer: lightweight wall-clock meter for steps/epochs with percentile
  summaries.
* start_trace / stop_trace: thin wrappers around jax.profiler for on-demand
  device traces (works on TPU; writes a TensorBoard trace directory).
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional


def trace_annotation(name: str):
    """Context manager annotating a region in device traces."""
    try:
        import jax.profiler

        return jax.profiler.TraceAnnotation(name)
    except Exception:  # pragma: no cover - profiler unavailable
        return contextlib.nullcontext()


def start_trace(log_dir: str):
    import jax.profiler

    jax.profiler.start_trace(log_dir)


def stop_trace():
    import jax.profiler

    jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock step timer with summary statistics."""

    def __init__(self):
        self.durations: List[float] = []
        self._t0: Optional[float] = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self):
        if self._t0 is not None:
            self.durations.append(time.perf_counter() - self._t0)
            self._t0 = None

    @contextlib.contextmanager
    def measure(self):
        self.start()
        try:
            yield
        finally:
            self.stop()

    def summary(self) -> Dict[str, float]:
        if not self.durations:
            return {}
        ds = sorted(self.durations)
        n = len(ds)
        return {
            "count": n,
            "mean_s": sum(ds) / n,
            "p50_s": ds[n // 2],
            "p90_s": ds[min(n - 1, int(n * 0.9))],
            "max_s": ds[-1],
        }
