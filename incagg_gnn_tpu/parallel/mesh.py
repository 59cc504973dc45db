"""Device mesh helpers.

The reference is strictly single-process single-GPU (SURVEY §2.1); all
multi-chip structure in this framework is new, built on ``jax.sharding.Mesh``
+ ``shard_map`` with XLA collectives over ICI.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    """A 1-D mesh over the first ``n_devices`` devices (spatial/data axis)."""
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    if n_devices > len(devs):
        raise ValueError(f"requested {n_devices} devices, have {len(devs)}")
    return Mesh(np.array(devs[:n_devices]), (axis,))


def make_mesh_2d(
    n_hosts: Optional[int] = None,
    chips_per_host: Optional[int] = None,
    axes=("host", "chip"),
) -> Mesh:
    """A (hosts × chips) 2-D mesh, host-major.

    On a real multi-process pod (``jax.process_count() > 1``) the hosts axis
    follows process boundaries so the "host" axis genuinely crosses DCN and
    the "chip" axis stays on ICI.  Single-process (including the virtual CPU
    mesh used in tests) it reshapes the device list — the axis *semantics*
    (which collectives ride which axis, how the layout packs clusters) are
    identical, which is what the sharding tests validate.

    Collectives should name both axes, e.g. ``psum(x, ("host", "chip"))`` or
    ``all_to_all(v, ("host", "chip"), ...)`` — tuple-axis collectives use the
    lexicographic (host-major) device order, matching
    ``build_shard_layout_hierarchical``'s ``dev = host * chips + chip``."""
    devs = jax.devices()
    if n_hosts is None:
        n_hosts = max(jax.process_count(), 1)
    if chips_per_host is None:
        chips_per_host = len(devs) // n_hosts
    need = n_hosts * chips_per_host
    if need > len(devs):
        raise ValueError(
            f"requested {n_hosts}x{chips_per_host} devices, have {len(devs)}")
    if jax.process_count() > 1:
        # order devices process-major BEFORE slicing so the kept subset
        # fills whole hosts and the host axis tracks process boundaries
        devs = sorted(devs, key=lambda d: (d.process_index, d.id))
    grid = np.array(devs[:need]).reshape(n_hosts, chips_per_host)
    return Mesh(grid, tuple(axes))


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Initialize ``jax.distributed`` for a real multi-host pod (one process
    per host).  No-op when single-process or already initialized; on TPU pods
    all three arguments are usually auto-detected from the environment, so
    ``init_distributed()`` with no arguments is the normal call."""
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:  # already initialized
        if "already" not in str(e):
            raise
