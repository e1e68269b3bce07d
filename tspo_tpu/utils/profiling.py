"""Profiling helpers — the cheap upgrade the reference lacks (SURVEY.md §5
"Tracing / profiling: none in TSPO core").

``trace`` wraps a block in a jax.profiler trace (view in TensorBoard/XProf or
Perfetto); ``StageTimer`` accumulates wall-clock per pipeline stage (decode /
preprocess / encode / select) so host-device overlap is visible.
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
    """Named region inside a trace (shows up on the host timeline)."""
    import jax
    return jax.profiler.TraceAnnotation(name)


class StageTimer:
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

    def summary(self) -> dict:
        return {name: {"total_s": round(total, 4),
                       "count": self.counts[name],
                       "mean_ms": round(1e3 * total / max(self.counts[name], 1), 3)}
                for name, total in sorted(self.totals.items())}
