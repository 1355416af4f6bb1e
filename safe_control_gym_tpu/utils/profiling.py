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


def summarize_kernels(trace_dir: str, top: int = 20):
    """Aggregate per-kernel device time from a ``device_trace`` capture.

    Parses the Perfetto JSON the JAX profiler writes and returns
    ``[{"name", "total_us", "count"}, ...]`` sorted by total device time —
    the on-device flame summary used to find the hot kernels (this is how
    the (1,B)->(8,B/8) Pallas relayout and the goal-gather hotspot were
    found; see ops/pallas_quad.py).
    """
    import collections
    import glob
    import gzip
    import json

    files = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz"))
    if not files:
        raise FileNotFoundError(f"no trace under {trace_dir}")
    with gzip.open(files[-1]) as f:
        events = json.load(f).get("traceEvents", [])
    pids = {
        e["pid"]: e["args"].get("name", "")
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    dev = {p for p, n in pids.items() if "TPU" in n or "Device" in n or "GPU" in n}
    dur, cnt = collections.Counter(), collections.Counter()
    for e in events:
        if e.get("ph") == "X" and (not dev or e.get("pid") in dev):
            dur[e["name"]] += e.get("dur", 0)
            cnt[e["name"]] += 1
    return [
        {"name": n, "total_us": d, "count": cnt[n]}
        for n, d in dur.most_common(top)
    ]
