"""Profiling / tracing utilities.

The reference has no tracer — wall-clock printouts only (SURVEY §5).  Here:
a context manager around the JAX profiler (XLA device traces viewable in
TensorBoard/Perfetto), plus a throughput meter for the steps/s-per-chip
north-star metric.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture an XLA device trace: `with device_trace('/tmp/trace'): ...`"""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class ThroughputMeter:
    """Measures env-steps/s across timed blocks (blocks until data ready)."""

    def __init__(self):
        self.steps = 0
        self.elapsed = 0.0

    @contextlib.contextmanager
    def measure(self, num_steps: int, sync_on):
        t0 = time.perf_counter()
        yield
        jax.block_until_ready(sync_on)
        self.elapsed += time.perf_counter() - t0
        self.steps += num_steps

    @property
    def steps_per_sec(self) -> float:
        return self.steps / max(self.elapsed, 1e-12)


def annotate(name: str):
    """Named region in device traces (jax.profiler.TraceAnnotation)."""
    return jax.profiler.TraceAnnotation(name)
