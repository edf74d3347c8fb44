"""Tracing / profiling hooks.

The reference has no tracer — only the ETA progress bar and manual
benchmark CLIs (SURVEY.md §5 "Tracing / profiling"). The TPU-native
equivalents here:

- ``trace(dir)``: context manager around ``jax.profiler`` producing a
  TensorBoard-viewable device trace of whatever runs inside (e.g. a
  training call);
- ``annotate(name)``: ``TraceAnnotation`` wrapper so epoch/superbatch
  boundaries show up as named spans in the trace;
- ``EpochTimer``: lightweight host-side per-epoch wall-clock collector
  (mean/std/last), usable as the ``progress`` callback of the streaming
  pipeline.
"""

from __future__ import annotations

import contextlib
import time

import jax

__all__ = ["trace", "annotate", "EpochTimer"]


@contextlib.contextmanager
def trace(log_dir):
    """Capture a device profile into ``log_dir`` (TensorBoard format)."""
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span visible in profiler traces."""
    return jax.profiler.TraceAnnotation(name)


class EpochTimer:
    """Host-side per-epoch timing; call ``tick()`` (or use as the pipeline
    ``progress`` callback) once per epoch."""

    def __init__(self):
        self._last = time.perf_counter()
        self.durations = []

    def tick(self, _epoch=None):
        now = time.perf_counter()
        self.durations.append(now - self._last)
        self._last = now

    __call__ = tick

    @property
    def mean(self):
        return sum(self.durations) / len(self.durations) if self.durations else 0.0

    def summary(self) -> str:
        if not self.durations:
            return "no epochs recorded"
        import statistics

        std = statistics.pstdev(self.durations) if len(self.durations) > 1 else 0.0
        return (
            f"{len(self.durations)} epochs: mean={self.mean*1e3:.1f}ms "
            f"std={std*1e3:.1f}ms last={self.durations[-1]*1e3:.1f}ms"
        )
