"""Host-offloaded history caches (spill tier).

When ``2 * num_layers * N * D`` exceeds device HBM, the caches live in host
DRAM and rows stream to/from the device per batch — the direct counterpart of
the reference's pinned-CPU histories + AsyncIOPool (history.py:17-18,
pool.py:15-134), with the CUDA copy engine replaced by:

- a C++ worker thread (csrc/spill.cpp) that gathers/scatters rows between the
  big host table and per-slot staging buffers asynchronously, preserving the
  reference's slot/future FIFO discipline (thread.h:26-69);
- JAX async dispatch moving staged rows host<->HBM (``jax.device_put`` is
  asynchronous; fetches overlap with compute via donation-free pulls).

Usage mirrors the pool (pool.py:64-123): ``async_pull`` → ``synchronize_pull``
→ ``free_pull``, and ``async_push`` → ``synchronize_push``.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional

import jax
import numpy as np

_CSRC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "csrc")
_SRC = os.path.join(_CSRC, "spill.cpp")
_SO = os.path.join(_CSRC, "libincagg_spill.so")
_LOCK = threading.Lock()
_DLL: Optional[ctypes.CDLL] = None

_i64p = np.ctypeslib.ndpointer(dtype=np.int64, flags="C_CONTIGUOUS")
_f32p = np.ctypeslib.ndpointer(dtype=np.float32, flags="C_CONTIGUOUS")


def _load() -> Optional[ctypes.CDLL]:
    global _DLL
    if _DLL is not None:
        return _DLL
    with _LOCK:
        if _DLL is not None:
            return _DLL
        try:
            if not (os.path.exists(_SO)
                    and os.path.getmtime(_SO) >= os.path.getmtime(_SRC)):
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-fopenmp", "-shared",
                     "-fPIC", _SRC, "-o", _SO],
                    check=True, capture_output=True, timeout=240)
            dll = ctypes.CDLL(_SO)
            dll.spill_gather_async.argtypes = [
                _f32p, ctypes.c_int64, _i64p, ctypes.c_int64, _f32p, ctypes.c_int64]
            dll.spill_scatter_chunks_async.argtypes = [
                _f32p, ctypes.c_int64, _i64p, _i64p, ctypes.c_int64, _f32p,
                ctypes.c_int64]
            dll.spill_scatter_async.argtypes = [
                _f32p, ctypes.c_int64, _i64p, ctypes.c_int64, _f32p, ctypes.c_int64]
            dll.spill_wait.argtypes = [ctypes.c_int64]
            _DLL = dll
        except Exception:
            _DLL = None
    return _DLL


class SpilledHistory:
    """One host-resident ``[num_nodes+1, dim]`` cache layer (float32) with an
    async pull/push pool of ``pool_size`` slots of ``buffer_size`` rows each
    (reference: History + AsyncIOPool)."""

    def __init__(self, num_nodes: int, dim: int, pool_size: int = 2,
                 buffer_size: int = 65536, device=None,
                 debug_verify: bool = False):
        """``debug_verify``: after each asynchronous pull completes, assert it
        matches a synchronous gather — the concurrency sanitizer SURVEY §5.2
        prescribes for the spill engine (the reference had none)."""
        self.table = np.zeros((num_nodes + 1, dim), dtype=np.float32)
        self.dim = dim
        self.pool_size = pool_size
        self.buffer_size = buffer_size
        self.device = device or jax.devices()[0]
        self._staging: List[np.ndarray] = [
            np.zeros((buffer_size, dim), dtype=np.float32)
            for _ in range(pool_size)
        ]
        self._queue: List[tuple] = []  # (slot, idx_len) FIFO of in-flight pulls
        self._next_slot = 0
        self._dll = _load()
        self._push_seq = 0
        self.debug_verify = debug_verify
        self._keep: List[np.ndarray] = []  # push sources alive until synced

    # ---------------- pull ----------------
    def async_pull(self, idx: np.ndarray) -> None:
        """Start gathering rows ``idx`` into the next staging slot
        (pool.py:64-81)."""
        assert len(self._queue) < self.pool_size, "pull pool exhausted"
        slot = self._next_slot
        self._next_slot = (self._next_slot + 1) % self.pool_size
        idx = np.ascontiguousarray(idx, dtype=np.int64)
        n = idx.shape[0]
        assert n <= self.buffer_size
        if self._dll is not None:
            self._dll.spill_gather_async(self.table, self.dim, idx, n,
                                         self._staging[slot], slot)
        else:
            self._staging[slot][:n] = self.table[idx]
        self._queue.append((slot, n, idx))

    def synchronize_pull(self):
        """Device array of the oldest in-flight pull (pool.py:83-88); the
        host->HBM leg dispatches asynchronously."""
        slot, n, idx = self._queue[0]
        if self._dll is not None:
            self._dll.spill_wait(slot)
        if self.debug_verify:
            expect = self.table[idx]
            assert np.array_equal(self._staging[slot][:n], expect), (
                "spill pull mismatch vs synchronous gather (slot reuse race?)"
            )
        return jax.device_put(self._staging[slot][:n], self.device)

    def free_pull(self) -> None:
        """Retire the oldest pull slot (pool.py:90-99)."""
        self._queue.pop(0)

    # ---------------- push ----------------
    def async_push(self, values, offset: Optional[np.ndarray] = None,
                   count: Optional[np.ndarray] = None,
                   idx: Optional[np.ndarray] = None) -> None:
        """Write device ``values`` back to host rows — chunk-contiguous via
        (offset, count) like the reference's fast path (history.py:60-65,
        async_cuda.cu:146-162) or indexed via ``idx``."""
        host_vals = np.ascontiguousarray(np.asarray(values), dtype=np.float32)
        self._push_seq += 1
        slot = self.pool_size + (self._push_seq % self.pool_size)
        if offset is not None:
            offset = np.ascontiguousarray(offset, dtype=np.int64)
            count = np.ascontiguousarray(count, dtype=np.int64)
            if self._dll is not None:
                self._keep.append(host_vals)  # alive until synchronize_push
                self._dll.spill_scatter_chunks_async(
                    self.table, self.dim, offset, count, len(offset),
                    host_vals, slot)
            else:
                s = 0
                for o, c in zip(offset, count):
                    self.table[o:o + c] = host_vals[s:s + c]
                    s += c
        else:
            idx = np.ascontiguousarray(idx, dtype=np.int64)
            if self._dll is not None:
                self._keep.append(host_vals)
                self._dll.spill_scatter_async(self.table, self.dim, idx,
                                              len(idx), host_vals, slot)
            else:
                self.table[idx] = host_vals[: len(idx)]
        self._last_push_slot = slot

    def synchronize_push(self) -> None:
        if self._dll is not None and self._push_seq:
            for s in range(self.pool_size, 2 * self.pool_size):
                self._dll.spill_wait(s)
        self._keep.clear()
