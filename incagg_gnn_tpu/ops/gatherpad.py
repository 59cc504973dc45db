"""Pad row-gather index counts into the TPU gather emitter's fast class.

Round-4 finding (docs/RESULTS.md "gather emitter bimodality"): XLA's TPU
row-gather emitter picks an internal tile of 256 or 128 rows depending on
the index count in a way that is not monotonic or obviously periodic
(3729408 -> 128, 3750000 -> 256, 3800000 -> 128, ...).  The 256-tile
programs run the same gather ~1.7x faster (8.1 vs 13.7 ns/row at the
reddit remainder shape, D=256 bf16).  The choice is visible at compile
time in the fusion's ``backend_config`` (``"integer_config":{"integer":
"256"}``), so we *probe*: compile a tiny gather of each candidate padded
length (cheap, cached by the persistent XLA compile cache) and keep the
first length the emitter tiles at 256.  Verified: padding the index
vector with trash indices and slicing the gather output back inherits the
fast emitter exactly (same backend_config, same measured ns/row).

Results are memoized in a JSON cache (``~/.cache/incagg_gnn/gatherpad.json``
or ``$INCAGG_GATHER_PAD_CACHE``) so each (count, table, width, dtype)
probes at most once per machine, ever.

Reference counterpart: none — the reference's cuSPARSE/torch gather path
has no analogous compile-time emitter cliff.  This is a pure TPU-backend
concern.

Env:
  INCAGG_GATHER_PAD=0         disable entirely (identity padding)
  INCAGG_GATHER_PAD_PROBE=0   no new probes (cache hits still apply)
"""

from __future__ import annotations

import json
import os
import re
import tempfile
import threading

_CACHE_PATH = os.environ.get(
    "INCAGG_GATHER_PAD_CACHE",
    os.path.expanduser("~/.cache/incagg_gnn/gatherpad.json"))
_STEP = 50_000  # candidate stride; slow sizes are sparse at this stride
_MAX_CANDS = 6  # bounds padding waste (6*50K on multi-M counts = <10%)
_MIN_N = 500_000  # below this the gather is not the bottleneck; skip

_lock = threading.Lock()
_mem: dict | None = None


def _load() -> dict:
    global _mem
    if _mem is None:
        try:
            with open(_CACHE_PATH) as f:
                _mem = json.load(f)
        except Exception:
            _mem = {}
    return _mem


def _save(mem: dict) -> None:
    try:
        os.makedirs(os.path.dirname(_CACHE_PATH), exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(_CACHE_PATH))
        with os.fdopen(fd, "w") as f:
            json.dump(mem, f)
        os.replace(tmp, _CACHE_PATH)
    except Exception:
        pass  # cache is an optimization; never fail the build over it


def _probe_tile(n: int, n_tab: int, d: int, dtype) -> int:
    """Compile a minimal row gather and read the emitter tile (256 fast /
    128 slow).  Scan-free probes verified to match the in-program choice."""
    import jax
    import jax.numpy as jnp

    x = jnp.zeros((n_tab, d), dtype)
    idx = jnp.zeros((n,), jnp.int32)

    @jax.jit
    def run(x, idx):
        return jnp.take(x, idx, axis=0).sum()

    txt = run.lower(x, idx).compile().as_text()
    for line in txt.splitlines():
        if "kCustom" in line and "gather" in line and "fusion(" in line:
            m = re.search(r'"integer":"(\d+)"', line)
            if m:
                return int(m.group(1))
    return 0  # emitter shape unrecognized -> treat as "don't pad"


def fast_gather_len(n: int, n_tab: int, d: int, dtype,
                    multiple_of: int = 1) -> int:
    """Smallest probed index count >= ``n`` (a multiple of ``multiple_of``)
    in the fast (256-tile) class, or ``n`` when none is found / probing
    unavailable.  ``multiple_of`` lets ELL callers keep the padded count
    reshapeable to [rows, K] so the pad is sliced off *after* the K-reduce
    (a [rows_pad-rows, D] sliver) instead of on the [count, D] gather."""
    if n < _MIN_N or os.environ.get("INCAGG_GATHER_PAD", "1") == "0":
        return n
    try:
        import jax

        if jax.default_backend() != "tpu":
            return n
    except Exception:
        return n
    key = f"{n}:{n_tab}:{d}:{str(dtype)}:{multiple_of}"
    with _lock:
        mem = _load()
        if key in mem:
            return int(mem[key])
    if os.environ.get("INCAGG_GATHER_PAD_PROBE", "1") == "0":
        return n

    def _round(v):
        return ((v + multiple_of - 1) // multiple_of) * multiple_of

    best = n
    try:
        if _probe_tile(n, n_tab, d, dtype) != 128:
            best = n  # already fast (or unrecognized): keep exact
        else:
            c = _round(((n + _STEP - 1) // _STEP) * _STEP)
            for _ in range(_MAX_CANDS):
                if c > n and _probe_tile(c, n_tab, d, dtype) == 256:
                    best = c
                    break
                c = _round(c + _STEP)
    except Exception:
        best = n
    with _lock:
        mem = _load()
        mem[key] = best
        _save(mem)
    return best


def take_rows_fast(x, flat_idx, n: int):
    """``jnp.take(x, flat_idx, axis=0)`` with the index count padded into
    the emitter's fast class (trash index 0) and the output sliced back.
    ``n`` must equal ``flat_idx.shape[0]`` (static)."""
    import jax.numpy as jnp

    npad = fast_gather_len(n, int(x.shape[0]), int(x.shape[1]), x.dtype)
    if npad > n:
        flat_idx = jnp.concatenate(
            [flat_idx, jnp.zeros((npad - n,), flat_idx.dtype)])
        return jnp.take(x, flat_idx, axis=0)[:n]
    return jnp.take(x, flat_idx, axis=0)
