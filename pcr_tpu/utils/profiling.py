"""
Phase timing + observability helpers.

The reference has no tracer; its benchmarks wrap phases with wall-clock
timers (io_read_s / ingest_s / finalize_s columns,
scripts/data/test_dc_lidar.py, benchmark_results/mode_comparison.csv).
This module provides the same phase accounting as a reusable utility, plus
an optional jax.profiler trace context for device timelines.
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from dataclasses import dataclass, field

__all__ = ["PhaseTimer", "trace"]


@dataclass
class PhaseTimer:
    """Accumulates wall-clock per named phase.

    >>> t = PhaseTimer()
    >>> with t.phase("ingest"):
    ...     do_work()
    >>> t.seconds("ingest")
    """

    totals: dict = field(default_factory=lambda: defaultdict(float))
    counts: dict = field(default_factory=lambda: defaultdict(int))

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def seconds(self, name: str) -> float:
        return self.totals.get(name, 0.0)

    def summary(self) -> dict:
        return {k: {"seconds": round(v, 6), "calls": self.counts[k]}
                for k, v in sorted(self.totals.items())}

    def report(self) -> str:
        total = sum(self.totals.values()) or 1.0
        lines = []
        for name, secs in sorted(self.totals.items(),
                                 key=lambda kv: -kv[1]):
            lines.append(f"{name:20s} {secs:9.3f}s  "
                         f"{100 * secs / total:5.1f}%  "
                         f"({self.counts[name]} calls)")
        return "\n".join(lines)

    def to_json(self) -> str:
        return json.dumps(self.summary())


@contextlib.contextmanager
def trace(log_dir: str | None = None):
    """Optional device trace via jax.profiler (view with TensorBoard or
    Perfetto). No-op when log_dir is None."""
    if not log_dir:
        yield
        return
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
