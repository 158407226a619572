"""Lock-free shared-memory IPC: atomic counter + SPSC ring buffer + queue.

Replaces src/planning/real_world/shared_memory/ (SharedAtomicCounter
shared_memory_util.py:14-40; single-producer ring buffer
shared_memory_ring_buffer.py:12-230; SPSC queue shared_memory_queue.py:
10-190). The hot path (atomic publish/acquire + slot memcpy) runs in the
native C++ library (native/shm_ring.cpp) via ctypes; a pure-numpy fallback
keeps the module importable without the compiled .so.

Protocol (single producer): write the slot, then increment write_count with
release ordering; consumers acquire-load write_count before reading data.
Structured slots hold a dict of fixed-shape numpy arrays packed
contiguously (the reference's per-field SharedNDArray flattened into one
slot for a single publish point).
"""

from __future__ import annotations

import ctypes
import os
from multiprocessing import shared_memory
from typing import Dict, Tuple

import numpy as np

_LIB = None
_LIB_PATH = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native", "libshm_ring.so")


def _lib():
    global _LIB
    if _LIB is None and os.path.exists(_LIB_PATH):
        lib = ctypes.CDLL(_LIB_PATH)
        lib.shm_counter_load.restype = ctypes.c_int64
        lib.shm_counter_add.restype = ctypes.c_int64
        lib.shm_ring_put.restype = ctypes.c_int64
        lib.shm_ring_get_latest.restype = ctypes.c_int64
        lib.shm_ring_get_last_k.restype = ctypes.c_int64
        lib.shm_ring_count.restype = ctypes.c_int64
        _LIB = lib
    return _LIB


_HEADER = 16  # two int64 counters


class SharedAtomicCounter:
    """Cross-process atomic int64 (shared_memory_util.py:14-40)."""

    def __init__(self, shm: shared_memory.SharedMemory, offset: int = 0):
        self.shm = shm
        self.offset = offset
        self._addr = ctypes.addressof(
            (ctypes.c_char * 8).from_buffer(shm.buf, offset))

    def load(self) -> int:
        lib = _lib()
        if lib:
            return lib.shm_counter_load(ctypes.c_void_p(self._addr))
        return int(np.frombuffer(self.shm.buf, np.int64, 1, self.offset)[0])

    def store(self, value: int):
        lib = _lib()
        if lib:
            lib.shm_counter_store(ctypes.c_void_p(self._addr), ctypes.c_int64(value))
        else:
            np.frombuffer(self.shm.buf, np.int64, 1, self.offset)[0] = value

    def add(self, inc: int = 1) -> int:
        lib = _lib()
        if lib:
            return lib.shm_counter_add(ctypes.c_void_p(self._addr), ctypes.c_int64(inc))
        arr = np.frombuffer(self.shm.buf, np.int64, 1, self.offset)
        arr[0] += inc  # fallback is NOT atomic cross-process
        return int(arr[0])


def _spec_size(field_specs: Dict[str, Tuple[tuple, np.dtype]]) -> int:
    return sum(int(np.prod(shape)) * np.dtype(dt).itemsize
               for shape, dt in field_specs.values())


class SharedMemoryRingBuffer:
    """Single-producer multi-field ring buffer.

    field_specs: {name: (shape, dtype)} — every put()/get() carries all
    fields (the reference's per-camera frame bundle: color, depth,
    timestamp, ...).
    """

    def __init__(self, name: str, field_specs, capacity: int = 32, create: bool = True):
        self.field_specs = {k: (tuple(s), np.dtype(d)) for k, (s, d) in field_specs.items()}
        self.capacity = capacity
        self.slot_size = _spec_size(self.field_specs)
        total = _HEADER + capacity * self.slot_size
        if create:
            try:
                self.shm = shared_memory.SharedMemory(name=name, create=True, size=total)
            except FileExistsError:
                old = shared_memory.SharedMemory(name=name)
                old.close()
                old.unlink()
                self.shm = shared_memory.SharedMemory(name=name, create=True, size=total)
            np.frombuffer(self.shm.buf, np.int64, 2, 0)[:] = 0
        else:
            self.shm = shared_memory.SharedMemory(name=name)
        self._base = ctypes.addressof(
            (ctypes.c_char * total).from_buffer(self.shm.buf, 0))
        self.owner = create

    # -- packing --

    def _pack(self, fields: dict) -> np.ndarray:
        out = np.empty(self.slot_size, np.uint8)
        off = 0
        for k, (shape, dt) in self.field_specs.items():
            a = np.ascontiguousarray(fields[k], dtype=dt).reshape(shape)
            nb = a.nbytes
            out[off: off + nb] = a.view(np.uint8).reshape(-1)
            off += nb
        return out

    def _unpack(self, raw: np.ndarray) -> dict:
        out, off = {}, 0
        for k, (shape, dt) in self.field_specs.items():
            nb = int(np.prod(shape)) * dt.itemsize
            out[k] = raw[off: off + nb].view(dt).reshape(shape).copy()
            off += nb
        return out

    # -- API --

    def put(self, fields: dict) -> int:
        raw = self._pack(fields)
        lib = _lib()
        if lib:
            return lib.shm_ring_put(
                ctypes.c_void_p(self._base), ctypes.c_int64(self.capacity),
                ctypes.c_int64(self.slot_size),
                raw.ctypes.data_as(ctypes.c_void_p))
        hdr = np.frombuffer(self.shm.buf, np.int64, 2, 0)
        w = int(hdr[0])
        start = _HEADER + (w % self.capacity) * self.slot_size
        self.shm.buf[start: start + self.slot_size] = raw.tobytes()
        hdr[0] = w + 1
        return w + 1

    def get_latest(self):
        raw = np.empty(self.slot_size, np.uint8)
        lib = _lib()
        if lib:
            seq = lib.shm_ring_get_latest(
                ctypes.c_void_p(self._base), ctypes.c_int64(self.capacity),
                ctypes.c_int64(self.slot_size), raw.ctypes.data_as(ctypes.c_void_p))
        else:
            hdr = np.frombuffer(self.shm.buf, np.int64, 2, 0)
            w = int(hdr[0])
            if w <= 0:
                return None, -1
            seq = w - 1
            start = _HEADER + (seq % self.capacity) * self.slot_size
            raw[:] = np.frombuffer(self.shm.buf, np.uint8, self.slot_size, start)
        if seq < 0:
            return None, -1
        return self._unpack(raw), int(seq)

    def get_last_k(self, k: int):
        k = min(k, self.capacity)
        raw = np.empty(k * self.slot_size, np.uint8)
        lib = _lib()
        if lib:
            n = lib.shm_ring_get_last_k(
                ctypes.c_void_p(self._base), ctypes.c_int64(self.capacity),
                ctypes.c_int64(self.slot_size), ctypes.c_int64(k),
                raw.ctypes.data_as(ctypes.c_void_p))
        else:
            hdr = np.frombuffer(self.shm.buf, np.int64, 2, 0)
            w = int(hdr[0])
            n = min(w, k)
            for i in range(n):
                seq = w - n + i
                start = _HEADER + (seq % self.capacity) * self.slot_size
                raw[i * self.slot_size:(i + 1) * self.slot_size] = np.frombuffer(
                    self.shm.buf, np.uint8, self.slot_size, start)
        return [self._unpack(raw[i * self.slot_size:(i + 1) * self.slot_size])
                for i in range(int(n))]

    @property
    def count(self) -> int:
        lib = _lib()
        if lib:
            return lib.shm_ring_count(ctypes.c_void_p(self._base))
        return int(np.frombuffer(self.shm.buf, np.int64, 1, 0)[0])

    def close(self, unlink: bool | None = None):
        self._base = None
        try:
            self.shm.close()
            if unlink if unlink is not None else self.owner:
                self.shm.unlink()
        except FileNotFoundError:
            pass


class SharedMemoryQueue(SharedMemoryRingBuffer):
    """SPSC FIFO on top of the ring (shared_memory_queue.py:10-190): the
    consumer advances read_count; put blocks-by-failure when full."""

    def put(self, fields: dict) -> bool:
        hdr = np.frombuffer(self.shm.buf, np.int64, 2, 0)
        if int(hdr[0]) - int(hdr[1]) >= self.capacity:
            return False  # full
        super().put(fields)
        return True

    def get(self):
        hdr = np.frombuffer(self.shm.buf, np.int64, 2, 0)
        r, w = int(hdr[1]), int(hdr[0])
        if r >= w:
            return None
        start = _HEADER + (r % self.capacity) * self.slot_size
        raw = np.frombuffer(self.shm.buf, np.uint8, self.slot_size, start).copy()
        hdr[1] = r + 1
        return self._unpack(raw)

    def qsize(self) -> int:
        hdr = np.frombuffer(self.shm.buf, np.int64, 2, 0)
        return int(hdr[0]) - int(hdr[1])
