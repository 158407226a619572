"""Host-side farthest point sampling, for offline episode storage.

Semantics mirror src/sim/utils.py:95-133 (start at index 0 / random for the
radius variant). The on-device scan versions live in adaptigraph_tpu.ops.fps.

The hot loop is native (native/fps.cpp -> adaptigraph_tpu/native/libfps.so,
loaded via ctypes) with a numpy fallback of identical semantics — the
sampled index sequences are bit-identical between the two paths (greedy
max-min, numpy-argmax first-index tie-breaking), covered by
tests/test_core_ops.py.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    path = os.path.join(os.path.dirname(__file__), "..", "native", "libfps.so")
    try:
        lib = ctypes.CDLL(os.path.abspath(path))
    except OSError:
        _lib = False
        return _lib
    lib.fps_indices.restype = ctypes.c_int64
    lib.fps_indices.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.POINTER(ctypes.c_int64)]
    lib.fps_rad_indices.restype = ctypes.c_int64
    lib.fps_rad_indices.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_float,
        ctypes.c_int64, ctypes.c_int64, ctypes.POINTER(ctypes.c_int64)]
    _lib = lib
    return _lib


def _as_f32c(points):
    return np.ascontiguousarray(points, dtype=np.float32)


def fps_with_idx(points: np.ndarray, n: int):
    """Greedy FPS starting at index 0; returns (points[idx], idx)."""
    if n >= len(points):
        return points, np.arange(len(points))
    lib = _load()
    if lib:
        p = _as_f32c(points)
        out = np.empty(n, np.int64)
        got = lib.fps_indices(
            p.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(p), n, 0,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
        idx = out[:got]
        return points[idx], idx
    return _fps_with_idx_np(points, n)


def fps_rad_idx(points: np.ndarray, radius: float, rng=None):
    """Radius-stop FPS with a random start; returns (points[idx], idx)."""
    rng = rng or np.random
    start = rng.randint(len(points))
    lib = _load()
    if lib:
        p = _as_f32c(points)
        out = np.empty(len(p), np.int64)
        got = lib.fps_rad_indices(
            p.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(p),
            float(radius), start,
            len(p), out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
        idx = out[:got]
        return points[idx], idx
    return _fps_rad_idx_np(points, radius, start=start)


def _fps_with_idx_np(points: np.ndarray, n: int):
    """numpy fallback, identical semantics to native fps_indices.

    Distances in float32 to match the native path bit-for-bit."""
    pts = _as_f32c(points)
    idx = [0]
    dist = np.full(len(pts), np.inf, np.float32)
    for _ in range(1, n):
        d = np.linalg.norm(pts - pts[idx[-1]], axis=1)
        dist = np.minimum(dist, d)
        idx.append(int(np.argmax(dist)))
    return points[idx], np.array(idx)


def _fps_rad_idx_np(points: np.ndarray, radius: float, start: int):
    """numpy fallback, identical semantics to native fps_rad_indices."""
    pts = _as_f32c(points)
    idx = [start]
    dist = np.linalg.norm(pts - pts[start], axis=1)
    while dist.max() > radius:
        nxt = int(dist.argmax())
        idx.append(nxt)
        dist = np.minimum(dist, np.linalg.norm(pts - pts[nxt], axis=1))
    return points[idx], np.array(idx)
