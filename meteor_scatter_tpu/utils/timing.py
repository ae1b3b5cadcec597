"""Phase timing + throughput counters.

Extends the reference's wall-clock instrumentation
(`prime_detection.py:35-45`: start_time_meas/end_time_meas prints) with
accumulating per-phase stats and samples/s counters — the primary metric of
BASELINE.md — and optional `jax.profiler` trace capture.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional


class PhaseTimer:
    def __init__(self, log: bool = False):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)
        self._open: Dict[str, float] = {}
        self.log = log

    def start(self, phase: str) -> None:
        self._open[phase] = time.perf_counter()

    def end(self, phase: str) -> float:
        dt = time.perf_counter() - self._open.pop(phase)
        self.totals[phase] += dt
        self.counts[phase] += 1
        if self.log:
            print(f"Time for {phase}: {dt:.6f} seconds")
        return dt

    @contextlib.contextmanager
    def phase(self, name: str):
        self.start(name)
        try:
            yield
        finally:
            self.end(name)

    def summary(self) -> str:
        lines = []
        for k in self.totals:
            n = self.counts[k]
            lines.append(
                f"{k}: total {self.totals[k]:.3f}s over {n} calls "
                f"(avg {self.totals[k] / max(n, 1):.4f}s)"
            )
        return "\n".join(lines)


class Throughput:
    """samples/s accounting for the benchmark harness."""

    def __init__(self):
        self.samples = 0
        self.seconds = 0.0

    def add(self, n_samples: int, seconds: float) -> None:
        self.samples += n_samples
        self.seconds += seconds

    @property
    def samples_per_sec(self) -> float:
        return self.samples / self.seconds if self.seconds > 0 else 0.0


@contextlib.contextmanager
def maybe_profile(trace_dir: Optional[str] = None):
    """jax.profiler trace when a directory is given, no-op otherwise."""
    if trace_dir:
        import jax

        with jax.profiler.trace(trace_dir):
            yield
    else:
        yield
