"""Liveness heartbeat for supervisor-level stall recovery.

The in-process transport watchdog (utils/watchdog.py) can only bound waits
on a *returned* value; a host->device transfer that wedges inside the
runtime (observed twice on the remote-chip tunnel: main thread parked in
``tcp_recvmsg`` with zero bytes moving) blocks Python inside C and never
returns anything to wait on.  The only reliable recovery is process-level:
the trainer touches a heartbeat file at progress points (between transfers
and dispatches), and the ``--supervise`` parent kills + restarts the child
from its newest checkpoint when the heartbeat goes stale (main.py).

``beat()`` is a no-op unless the supervisor set ``INCAGG_HEARTBEAT_FILE``,
and is throttled so hot loops pay one ``os.utime`` per second at most.
"""

from __future__ import annotations

import os
import time

ENV_VAR = "INCAGG_HEARTBEAT_FILE"
_last = 0.0


def beat(min_interval_s: float = 1.0) -> None:
    """Touch the supervisor's heartbeat file (throttled; never raises)."""
    global _last
    path = os.environ.get(ENV_VAR)
    if not path:
        return
    now = time.monotonic()
    if now - _last < min_interval_s:
        return
    _last = now
    try:
        with open(path, "a"):
            pass
        os.utime(path, None)
    except OSError:
        pass
