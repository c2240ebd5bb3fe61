"""Tracing / profiling utilities.

The reference's only instrumentation is a wall-clock per image written into
the result CSV (``5_evaluation_bop_basic.py:272,329``; SURVEY.md §5.1).
Here: the same per-stage wall timers plus real device tracing via
``jax.profiler`` (TensorBoard-viewable), opt-in and zero-cost when off.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict


class StageTimer:
    """Accumulating per-stage wall timers.

    >>> t = StageTimer()
    >>> with t.stage("detect"): ...
    >>> t.summary() -> {"detect": {"total_s": ..., "count": ..., "mean_ms"}}
    """

    def __init__(self):
        self._acc = defaultdict(float)
        self._count = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._acc[name] += time.perf_counter() - t0
            self._count[name] += 1

    def summary(self) -> dict:
        return {
            name: {"total_s": self._acc[name], "count": self._count[name],
                   "mean_ms": 1000.0 * self._acc[name]
                   / max(self._count[name], 1)}
            for name in self._acc}

    def report(self) -> str:
        rows = sorted(self.summary().items(),
                      key=lambda kv: -kv[1]["total_s"])
        return "\n".join(
            f"{k:24s} {v['count']:6d}x  {v['mean_ms']:8.2f} ms  "
            f"{v['total_s']:8.2f} s" for k, v in rows)


@contextlib.contextmanager
def device_trace(log_dir: str | None):
    """jax.profiler trace scope; no-op when log_dir is None."""
    if log_dir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named region visible in profiler traces (TraceAnnotation)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield
