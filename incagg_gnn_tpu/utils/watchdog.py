"""Device-dispatch watchdog: fail fast when a device round trip stalls.

The reference silently continues after transfer errors (printed CUDA error
strings without aborting, async_cuda.cu:86-89,106-109,157-160 — a
silent-corruption hazard, SURVEY §5.3).  This framework takes the opposite
stance: a watchdog around ``block_until_ready`` that logs diagnostics the
moment a device round trip exceeds its deadline and then *raises*, so hung
transports (e.g. a stalled remote-chip tunnel) kill the run loudly instead of
wedging it.

Usage (gated by ``TrainerConfig.device_timeout_s``; 0 disables)::

    wd = Watchdog(timeout_s=120.0)
    out = wd.wait(device_arrays, label="train step 12")

The blocked ``block_until_ready`` itself cannot be interrupted from Python;
the watchdog waits on it from a worker thread and abandons it on timeout
(the worker keeps blocking harmlessly — the process is about to exit anyway).
"""

from __future__ import annotations

import logging
import queue
import threading
import time
from typing import Any, Optional

log = logging.getLogger(__name__)


class DeviceTimeoutError(RuntimeError):
    """A device round trip exceeded the watchdog deadline."""


class Watchdog:
    """Deadline-enforced ``jax.block_until_ready`` with stall diagnostics.

    ``warn_fraction``: emit a warning (with elapsed time and label) when a
    wait crosses this fraction of the deadline — early telemetry for flaky
    transports that recover.

    The worker is a **daemon** thread: if the deadline fires while it is
    still wedged inside ``block_until_ready``, the raise must actually
    terminate the process — a non-daemon worker (e.g. ThreadPoolExecutor's)
    would be joined by the interpreter's shutdown hooks and hang exit
    forever, defeating the fail-fast purpose."""

    def __init__(self, timeout_s: float, warn_fraction: float = 0.5):
        self.timeout_s = float(timeout_s)
        self.warn_fraction = warn_fraction
        self._tasks: Optional[queue.Queue] = None
        self._done: Optional[queue.Queue] = None
        self.stalls = 0  # warn-level stalls survived (diagnostic counter)

    def _ensure_worker(self):
        if self._tasks is None:
            self._tasks = queue.Queue()
            self._done = queue.Queue()

            def run(tasks, done):
                import jax

                while True:
                    tree = tasks.get()
                    try:
                        done.put((True, jax.block_until_ready(tree)))
                    except BaseException as e:  # surface device errors too
                        done.put((False, e))

            threading.Thread(target=run, args=(self._tasks, self._done),
                             name="device-watchdog", daemon=True).start()

    def wait(self, tree: Any, label: str = "") -> Any:
        """Block until every array in ``tree`` is ready, or raise
        :class:`DeviceTimeoutError` after ``timeout_s``."""
        import jax

        if self.timeout_s <= 0:
            return jax.block_until_ready(tree)
        self._ensure_worker()
        self._tasks.put(tree)
        warn_at = self.timeout_s * self.warn_fraction
        t0 = time.monotonic()
        warned = False
        while True:
            elapsed = time.monotonic() - t0
            budget = (warn_at if not warned else self.timeout_s) - elapsed
            try:
                ok, result = self._done.get(timeout=max(budget, 0.01))
                if not ok:
                    raise result
                return result
            except queue.Empty:
                elapsed = time.monotonic() - t0
                if not warned and elapsed >= warn_at:
                    warned = True
                    self.stalls += 1
                    log.warning(
                        "device watchdog: %s still blocking after %.1fs "
                        "(deadline %.1fs) — device=%s",
                        label or "round trip", elapsed, self.timeout_s,
                        _device_summary(),
                    )
                    continue
                if elapsed >= self.timeout_s:
                    # abandon the wedged daemon worker (it cannot block exit)
                    self._tasks = self._done = None
                    raise DeviceTimeoutError(
                        f"device round trip {label or ''} exceeded "
                        f"{self.timeout_s:.1f}s (elapsed {elapsed:.1f}s); "
                        f"device={_device_summary()} — failing fast rather "
                        f"than risking silent corruption (SURVEY §5.3)"
                    )


def _device_summary() -> str:
    try:
        import jax

        d = jax.devices()[0]
        return f"{d.platform}:{d.device_kind} x{len(jax.devices())}"
    except Exception as e:  # diagnostics must never mask the stall itself
        return f"<unavailable: {e}>"
