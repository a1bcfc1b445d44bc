"""Profiling & tracing.

The reference has none (SURVEY.md §5: coarse it/s prints only). Here:
- `trace(dir)` — context manager around jax.profiler for device traces
  viewable in TensorBoard/Perfetto,
- `StepTimer` — rolling per-step wall-clock stats with percentile reporting,
- `annotate` — TraceAnnotation wrapper so named regions show up in traces.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace: `with trace('/tmp/trace'): run_steps()`."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region for profiler traces: `with annotate('train_step'): ...`."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Rolling wall-clock stats: `timer.tick()` per step, `timer.report()`."""

    def __init__(self, window: int = 200):
        self.window = window
        self._times: List[float] = []
        self._last: Optional[float] = None

    def tick(self) -> None:
        now = time.perf_counter()
        if self._last is not None:
            self._times.append(now - self._last)
            if len(self._times) > self.window:
                self._times.pop(0)
        self._last = now

    def report(self) -> Dict[str, float]:
        if not self._times:
            return {}
        times = sorted(self._times)
        n = len(times)
        return {
            "step_ms.mean": 1000.0 * sum(times) / n,
            "step_ms.p50": 1000.0 * times[n // 2],
            "step_ms.p95": 1000.0 * times[min(n - 1, int(n * 0.95))],
            "step_ms.max": 1000.0 * times[-1],
        }
