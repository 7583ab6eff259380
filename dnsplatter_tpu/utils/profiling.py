"""Profiling helpers.

The reference exposes nerfstudio's `@profiler.time_function` plus
rays/s + fps timers (dn_pipeline.py:44,132,198-214; SURVEY.md section 5).
Here: a JAX profiler trace context (XLA/TPU kernel timelines viewable in
TensorBoard/Perfetto) plus lightweight wall-clock section timers.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from pathlib import Path
from typing import Dict, Iterator


@contextlib.contextmanager
def trace(log_dir: Path) -> Iterator[None]:
    """Capture a JAX profiler trace (kernel-level) into `log_dir`."""
    import jax

    Path(log_dir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class SectionTimers:
    """Accumulating wall-clock timers (the time_function equivalent)."""

    def __init__(self) -> None:
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def section(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            k: {
                "total_s": round(self.totals[k], 4),
                "count": self.counts[k],
                "mean_ms": round(1e3 * self.totals[k] / max(self.counts[k], 1), 3),
            }
            for k in sorted(self.totals)
        }


def rays_per_sec(width: int, height: int, seconds: float) -> float:
    """The reference's eval throughput metric (dn_pipeline.py:199-214)."""
    return width * height / max(seconds, 1e-9)
