"""Profiling/tracing utilities (SURVEY.md §5: the reference has none — it
globally DISABLES async execution for debuggability; here tracing is a
first-class tool).

``trace(logdir)`` wraps a region in a jax.profiler trace producing XPlane
dumps viewable in TensorBoard/xprof; ``annotate`` names regions inside the
trace; ``step_timer`` is a lightweight wall-clock accumulator for host-side
stages (decode, collate, device wait).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict


@contextlib.contextmanager
def trace(logdir: str):
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    import jax

    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Accumulates wall-clock per named stage; report() returns ms averages."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> dict[str, float]:
        return {
            k: round(1000.0 * self.totals[k] / max(self.counts[k], 1), 2) for k in self.totals
        }

    def reset(self):
        self.totals.clear()
        self.counts.clear()
