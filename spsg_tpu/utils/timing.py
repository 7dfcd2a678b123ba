"""Phase timers (reference hand-rolled wall-clock timers, train.py:850-863)
plus jax.profiler hooks."""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, List


class PhaseTimer:
    """Accumulates per-phase wall-clock durations and prints averages every
    ``report_every`` steps (matching the reference's every-100-iters report)."""

    def __init__(self, report_every: int = 100):
        self.report_every = report_every
        self._acc: Dict[str, List[float]] = defaultdict(list)
        self._count = 0

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        yield
        self._acc[name].append(time.perf_counter() - t0)

    def step(self, log_fn=print) -> None:
        self._count += 1
        if self._count % self.report_every == 0:
            parts = [f"{k}: {sum(v) / max(len(v), 1):.4f}s" for k, v in self._acc.items()]
            log_fn("Average timings: " + " | ".join(parts))
            self._acc.clear()


@contextlib.contextmanager
def jax_trace(log_dir: str | None):
    """Optional jax.profiler trace around a region (replaces the reference's
    absent profiler integration, SURVEY.md §5)."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
