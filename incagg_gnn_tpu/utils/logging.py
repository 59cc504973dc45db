"""Structured metrics logging + profiling helpers (SURVEY §5.1/§5.5).

The reference logs ad-hoc wall-clock timings and a per-epoch metrics line
through Hydra job logging (main.py:257-261, base.py:233-240 timing dicts).
Here: a JSONL metrics writer for per-step/per-epoch scalars (loss, accuracy,
edges/s, drift norms, neighbor counts) and a ``jax.profiler`` trace context
for deep dives.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Any, Dict, Optional


class MetricsLogger:
    """Append-only JSONL metrics sink; one record per event."""

    def __init__(self, path: Optional[str] = None):
        self.path = path
        self._fh = None
        if path:
            os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
            self._fh = open(path, "a")
        self._t0 = time.time()

    def log(self, kind: str, **scalars: Any) -> Dict[str, Any]:
        rec = {"t": round(time.time() - self._t0, 3), "kind": kind}
        for k, v in scalars.items():
            try:
                rec[k] = float(v)
            except (TypeError, ValueError):
                rec[k] = v
        if self._fh:
            self._fh.write(json.dumps(rec) + "\n")
            self._fh.flush()
        return rec

    def close(self):
        if self._fh:
            self._fh.close()


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str]):
    """jax.profiler trace context (replaces the reference's torch.profiler
    stubs, SURVEY §5.1); no-op when log_dir is None."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock timer that blocks on a jax array before stopping — the
    TPU-correct version of the reference's CUDA-event timings."""

    def __init__(self):
        self.t0 = time.perf_counter()

    def stop(self, *sync_on) -> float:
        import jax

        for a in sync_on:
            jax.block_until_ready(a)
        return time.perf_counter() - self.t0
