"""Timestamp alignment for multi-source capture streams.

Port of src/planning/real_world/common/timestamp_accumulator.py:6-222: map
asynchronous per-camera/robot samples onto a fixed-rate global clock so
downstream consumers see one aligned timeline.
"""

from __future__ import annotations

import numpy as np


class TimestampAccumulator:
    """Accumulates (timestamp, index) samples and exposes which global ticks
    each sample covers."""

    def __init__(self, start_time: float, dt: float, eps: float = 1e-5):
        self.start_time = start_time
        self.dt = dt
        self.eps = eps
        self.timestamps = []  # aligned per-tick source timestamps
        self.indices = []  # source sample index per tick

    def global_idx(self, t: float) -> int:
        return int(np.floor((t - self.start_time + self.eps) / self.dt))

    def put(self, sample_timestamps, sample_indices=None):
        """Register new source samples; each fills every not-yet-covered
        global tick up to its own tick."""
        sample_timestamps = np.atleast_1d(np.asarray(sample_timestamps, np.float64))
        if sample_indices is None:
            base = len(self.indices and [max(self.indices)] or [0])
            sample_indices = np.arange(len(sample_timestamps)) + (
                self.indices[-1] + 1 if self.indices else 0)
        sample_indices = np.atleast_1d(np.asarray(sample_indices))
        for ts, idx in zip(sample_timestamps, sample_indices):
            tick = self.global_idx(ts)
            if tick < 0:
                continue
            while len(self.timestamps) <= tick:
                self.timestamps.append(ts)
                self.indices.append(int(idx))
            self.timestamps[tick] = ts
            self.indices[tick] = int(idx)

    def __len__(self):
        return len(self.timestamps)

    def get(self):
        return np.asarray(self.timestamps), np.asarray(self.indices)


def align_obs(streams: dict, dt: float, start_time: float | None = None):
    """Align multiple {name: (timestamps, payload_indices)} streams onto a
    common clock; returns per-tick index maps for ticks covered by ALL
    streams (the RealEnv.get_obs alignment, real_env.py:152-198)."""
    if start_time is None:
        start_time = max(ts[0] for ts, _ in streams.values())
    accs = {}
    for name, (ts, idx) in streams.items():
        acc = TimestampAccumulator(start_time, dt)
        acc.put(ts, idx)
        accs[name] = acc
    n = min(len(a) for a in accs.values())
    return {name: np.asarray(a.indices[:n]) for name, a in accs.items()}
