"""Structured per-stage timing + JAX profiler traces.

The reference's only observability is ad-hoc Instant prints inside
tests (SURVEY.md section 5); here timing is a first-class subsystem: a
``StageTimer`` accumulates wall-time and throughput per pipeline stage,
and ``trace()`` wraps ``jax.profiler`` for TensorBoard-compatible
device traces.
"""
from __future__ import annotations

import contextlib
import dataclasses
import time
from collections import defaultdict
from typing import Iterator


@dataclasses.dataclass
class StageStats:
    calls: int = 0
    total_s: float = 0.0
    items: float = 0.0      # user-defined unit (samples, epochs, ...)

    @property
    def mean_s(self) -> float:
        return self.total_s / max(self.calls, 1)

    @property
    def items_per_s(self) -> float:
        return self.items / self.total_s if self.total_s > 0 else 0.0


class StageTimer:
    """Accumulating wall-clock timer keyed by stage name."""

    def __init__(self):
        self.stats: dict[str, StageStats] = defaultdict(StageStats)

    @contextlib.contextmanager
    def stage(self, name: str, items: float = 0.0) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            s = self.stats[name]
            s.calls += 1
            s.total_s += time.perf_counter() - t0
            s.items += items

    def report(self) -> dict[str, dict]:
        return {
            name: {
                "calls": s.calls,
                "total_s": round(s.total_s, 6),
                "mean_ms": round(s.mean_s * 1e3, 4),
                "items_per_s": round(s.items_per_s, 1),
            }
            for name, s in sorted(self.stats.items())
        }

    def realtime_factor(self, stage: str, fs_hz: float) -> float:
        """Signal-seconds per wall-second for a stage whose items are
        IQ samples."""
        s = self.stats[stage]
        return s.items_per_s / fs_hz if fs_hz else 0.0


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler device trace viewable in TensorBoard /
    Perfetto."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
