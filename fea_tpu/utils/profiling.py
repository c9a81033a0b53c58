"""Tracing / profiling utilities.

The reference's only observability is wall-clock prints around each solve
(datagen/generate.py:109-127). Here: a per-stage timing registry usable as
a context manager, plus a jax.profiler trace wrapper for device-level
inspection (TensorBoard-compatible)."""

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional


class StageTimer:
    """Accumulates wall-clock per named stage.

    with timer.stage("solve"): ...
    print(timer.summary())
    """

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str):
        start = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - start
            self.counts[name] += 1

    def summary(self) -> str:
        lines = []
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            t = self.totals[name]
            n = self.counts[name]
            lines.append(f"{name:24s} {t:9.3f}s  x{n:<5d} ({t / n * 1e3:8.2f} ms avg)")
        return "\n".join(lines)

    def as_dict(self) -> Dict[str, float]:
        return dict(self.totals)


@contextlib.contextmanager
def device_trace(log_dir: Optional[str] = None):
    """jax.profiler trace (TensorBoard format). No-op when log_dir is None."""
    if log_dir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
