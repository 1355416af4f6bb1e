"""Plotting utilities for experiment logs.

TPU-native counterpart of safe_control_gym/utils/plotting.py:66-398:
crawl per-metric text logs across seed runs, align/interpolate/smooth, and
plot mean +/- std learning curves.  Matplotlib is imported lazily so the
headless engine never pays for it.
"""

from __future__ import annotations

import os

import numpy as np


def load_from_log_file(path: str):
    """Read a '<step> <value>' metric log (reference plotting.py:66-90)."""
    steps, values = [], []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) >= 2:
                steps.append(float(parts[0]))
                values.append(float(parts[1]))
    return np.asarray(steps), np.asarray(values)


def load_from_logs(log_dir: str) -> dict:
    """Crawl a run's logs/ dir into {metric: (steps, values)}."""
    out = {}
    logs = os.path.join(log_dir, "logs")
    if not os.path.isdir(logs):
        return out
    for fname in os.listdir(logs):
        if fname.endswith(".log"):
            out[fname[:-4]] = load_from_log_file(os.path.join(logs, fname))
    return out


def window_func(xs, ys, window: int = 10, fn=np.mean):
    """Sliding-window smoothing (reference plotting.py:96-120)."""
    if len(ys) < window:
        return xs, ys
    smoothed = np.array([fn(ys[max(0, i - window + 1) : i + 1]) for i in range(len(ys))])
    return xs, smoothed


def interpolate_runs(runs, num_points: int = 200):
    """Align runs with different step grids onto a common grid
    (reference plotting.py:130-170)."""
    lo = max(r[0][0] for r in runs)
    hi = min(r[0][-1] for r in runs)
    grid = np.linspace(lo, hi, num_points)
    ys = np.stack([np.interp(grid, s, v) for s, v in runs])
    return grid, ys


def plot_from_logs(log_dirs, metric: str, out_path: str | None = None, window: int = 10):
    """Mean +/- std learning curve across seeds (reference plotting.py:198+)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    # FileLogger flattens '/' in metric names to '_' on disk; accept either.
    key = metric.replace("/", "_")
    runs = []
    for d in log_dirs:
        data = load_from_logs(d)
        if key in data:
            runs.append(window_func(*data[key], window=window))
    if not runs:
        raise ValueError(f"metric {metric!r} not found in any of {log_dirs}")
    grid, ys = interpolate_runs(runs)
    mean, std = ys.mean(0), ys.std(0)
    fig, ax = plt.subplots()
    ax.plot(grid, mean)
    ax.fill_between(grid, mean - std, mean + std, alpha=0.3)
    ax.set_xlabel("step")
    ax.set_ylabel(metric)
    if out_path:
        fig.savefig(out_path, bbox_inches="tight", dpi=120)
        plt.close(fig)
    return grid, mean, std
