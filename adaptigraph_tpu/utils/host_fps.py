"""Host-side (numpy) farthest point sampling, for offline episode storage.

Semantics mirror src/sim/utils.py:95-133 (start at index 0 / random for the
radius variant). The on-device scan versions live in adaptigraph_tpu.ops.fps.
"""

from __future__ import annotations

import numpy as np


def fps_with_idx(points: np.ndarray, n: int):
    """Greedy FPS starting at index 0; returns (points[idx], idx)."""
    if n >= len(points):
        return points, np.arange(len(points))
    idx = [0]
    dist = np.full(len(points), np.inf)
    for _ in range(1, n):
        d = np.linalg.norm(points - points[idx[-1]], axis=1)
        dist = np.minimum(dist, d)
        idx.append(int(np.argmax(dist)))
    return points[idx], np.array(idx)


def fps_rad_idx(points: np.ndarray, radius: float, rng=None):
    """Radius-stop FPS with a random start; returns (points[idx], idx)."""
    rng = rng or np.random
    start = rng.randint(len(points))
    idx = [start]
    dist = np.linalg.norm(points - points[start], axis=1)
    while dist.max() > radius:
        nxt = int(dist.argmax())
        idx.append(nxt)
        dist = np.minimum(dist, np.linalg.norm(points - points[nxt], axis=1))
    return points[idx], np.array(idx)
