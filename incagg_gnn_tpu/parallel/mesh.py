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
