"""Tracing / profiling / progress utilities (SURVEY.md §5).

The reference reports index-build progress to Postgres's progress view
(pgstat_progress_update_param) and relies on external profilers; here:

- `trace(logdir)` wraps a block in a JAX profiler trace (XPlane/TensorBoard);
- `annotate(name)` adds a named TraceAnnotation around host code;
- `ConsoleProgress` is a build-progress callback for the builder's
  `progress=` hooks (phases: records / sort / write / ingest).
"""

from __future__ import annotations

import contextlib
import sys
import time

__all__ = ["trace", "annotate", "ConsoleProgress"]


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a JAX profiler trace for the enclosed block."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named annotation visible in profiler timelines."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield


class ConsoleProgress:
    """Progress callback printing phase transitions and throughput.

    Use as `build_sealed_segment(..., progress=ConsoleProgress())`.
    """

    def __init__(self, stream=None, min_interval: float = 0.5):
        self.stream = stream or sys.stderr
        self.min_interval = min_interval
        self._last = 0.0
        self._phase = None
        self._t0 = time.perf_counter()

    def __call__(self, phase: str, done: int, total: int) -> None:
        now = time.perf_counter()
        if phase != self._phase:
            self._phase = phase
            self._last = 0.0
        if now - self._last < self.min_interval and done < total:
            return
        self._last = now
        pct = 100.0 * done / max(total, 1)
        print(
            f"[{now - self._t0:7.1f}s] {phase}: {done}/{total} ({pct:.0f}%)",
            file=self.stream,
        )
