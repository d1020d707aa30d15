"""Tracing/profiling hooks around the SLAM hot paths.

The reference has no instrumentation beyond a loss print (SURVEY.md §5
"Tracing / profiling"). Here: jax.profiler integration — a trace-server
starter, a step-scoped trace context, and named annotations usable around
track/map/render calls; per-kernel cost comes from the captured XLA traces
(tensorboard or xprof).
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


def start_server(port: int = 9999):
    """Expose the live profiler (connect with tensorboard/xprof)."""
    return jax.profiler.start_server(port)


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a trace of everything inside the block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named scope visible in profiler timelines."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Cheap wall-clock section timer (blocks on device results)."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def section(self, name: str, block_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                jax.block_until_ready(block_on)
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            k: {
                "total_s": round(v, 4),
                "count": self.counts[k],
                "mean_ms": round(1e3 * v / max(self.counts[k], 1), 3),
            }
            for k, v in sorted(self.totals.items())
        }
