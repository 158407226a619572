"""Tracing / profiling / metrics hooks.

The reference's observability is FleX GPU timers + ad-hoc time.time prints
(SURVEY.md §5: pyflex.cpp:1989,2009-2016,3644-3656; data_gen.py:14,107).
TPU-native equivalents:

  * `trace(dir)` — context manager around jax.profiler for XLA-level traces
    (view in TensorBoard / xprof);
  * `Timer` — named wall-clock accumulators with EMA smoothing (the FleX
    frame-timer pattern) and a one-line report;
  * `annotate` — TraceAnnotation wrapper so host phases show up inside the
    device trace;
  * `MetricsLogger` — append-only jsonl metrics (loss curves, step rates),
    the lightweight stand-in for tensorboard.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from collections import defaultdict

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace: with trace('dump/trace'): run_workload()."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Host-side annotation that appears in device traces."""
    return jax.profiler.TraceAnnotation(name)


class Timer:
    """Named accumulating timers with exponential smoothing
    (the g_smoothing frame-timer pattern, pyflex.cpp:3644-3656)."""

    def __init__(self, alpha: float = 0.1):
        self.alpha = alpha
        self.ema = {}
        self.total = defaultdict(float)
        self.count = defaultdict(int)

    @contextlib.contextmanager
    def __call__(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.total[name] += dt
            self.count[name] += 1
            self.ema[name] = (dt if name not in self.ema
                              else self.alpha * dt + (1 - self.alpha) * self.ema[name])

    def report(self) -> str:
        rows = []
        for name in sorted(self.total):
            n = self.count[name]
            rows.append(f"{name}: {self.total[name] / n * 1000:.2f} ms/call "
                        f"(ema {self.ema[name] * 1000:.2f} ms, n={n})")
        return " | ".join(rows)


class MetricsLogger:
    """Append-only jsonl metrics stream."""

    def __init__(self, path: str):
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        self.path = path

    def log(self, step: int, **metrics):
        rec = {"step": step, "time": time.time(), **metrics}
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")

    def read(self):
        if not os.path.exists(self.path):
            return []
        with open(self.path) as f:
            return [json.loads(line) for line in f if line.strip()]


def plot_loss_curves(train_losses, valid_losses, out_path: str):
    """Train/valid loss png (train.py:133-145's figure)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plt.figure(figsize=(10, 4))
    plt.plot(train_losses, label="train")
    if valid_losses:
        plt.plot(valid_losses, label="valid")
        y_min = min(valid_losses)
        y_max = max(3 * y_min, 1e-12)
        plt.ylim([0, max(y_max, y_min * 1.1)])
    plt.legend()
    plt.xlabel("epoch")
    plt.ylabel("loss")
    plt.grid(alpha=0.3)
    plt.savefig(out_path, dpi=150, bbox_inches="tight")
    plt.close()
