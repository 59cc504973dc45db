"""Gather/scatter microbenchmark: per-slot cost of the ELL remainder ops.

Questions (round 4 train-step attack):
  1. What does one gathered row cost at D=256 as a function of dtype,
     table size, and index locality (random / sorted / 8-aligned-group)?
  2. What does the sorted segment-sum (overflow scatter) cost per edge?
The answers calibrate _C_SLOT_NS/_COO_RATIO in ops/block.py and decide
whether an 8-row-group gather formulation is worth building.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import bench

jax = bench._setup_jax()
import jax.numpy as jnp


REPS = 10


def timeit(fn, *args):
    # axon tunnel: block_until_ready is unreliable -> scalar readback, and
    # REPS scan-chained iterations per timed call so dispatch overhead and
    # the readback amortize away.
    import jax

    @jax.jit
    def run(x, idx, *rest):
        def body(c, _):
            # data-dependent index perturbation (adds 0) so XLA cannot
            # hoist the loop-invariant gather out of the scan
            i2 = idx + (c.astype(jnp.int32) & 0)
            return fn(x, i2, *rest).sum().astype(jnp.float32), None
        return jax.lax.scan(body, jnp.float32(0), None, length=REPS)[0]
    float(run(*args))
    float(run(*args))
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        float(run(*args))
        best = min(best, time.perf_counter() - t0)
    return best / REPS


def main():
    d = 256
    nslots = 4_000_000
    rng = np.random.default_rng(0)

    def take_sum(x, idx):
        g = jnp.take(x, idx, axis=0)
        return g.reshape(-1, 16, d).sum(axis=1)

    def seg_sum(x, idx, rows):
        g = jnp.take(x, idx, axis=0)
        return jax.ops.segment_sum(g, rows, num_segments=x.shape[0],
                                   indices_are_sorted=True)

    for n_tab in (16_384, 131_072, 262_144):
        for dt in (jnp.bfloat16, jnp.float32):
            x = jnp.asarray(rng.standard_normal((n_tab, d)), dt)
            idx_rand = jnp.asarray(rng.integers(0, n_tab, nslots), jnp.int32)
            idx_sort = jnp.sort(idx_rand)
            # 8-aligned groups: gather whole [8] row groups
            base = rng.integers(0, n_tab // 8, nslots // 8) * 8
            idx_grp = jnp.asarray(
                (base[:, None] + np.arange(8)[None, :]).reshape(-1), jnp.int32)
            # local: random within a 4K-row window per 64-slot run
            win = rng.integers(0, max(n_tab - 4096, 1), nslots // 64)
            idx_loc = jnp.asarray(
                (win[:, None] + rng.integers(0, 4096, (nslots // 64, 64)))
                .reshape(-1), jnp.int32)
            r = {}
            for name, idx in [("rand", idx_rand), ("sorted", idx_sort),
                              ("grp8", idx_grp), ("local4k", idx_loc)]:
                t = timeit(take_sum, x, idx)
                r[name] = t / nslots * 1e9
            print(f"take+sum  tab={n_tab:7d} {np.dtype(dt).name:8s} "
                  + " ".join(f"{k}={v:5.2f}ns" for k, v in r.items()),
                  flush=True)

    # overflow scatter: sorted segment-sum at reddit-like overflow scale
    n_tab = 262_144
    for novf in (262_144, 786_432):
        for dt in (jnp.bfloat16, jnp.float32):
            x = jnp.asarray(rng.standard_normal((n_tab, d)), dt)
            cols = jnp.asarray(rng.integers(0, n_tab, novf), jnp.int32)
            rows = jnp.sort(jnp.asarray(
                rng.integers(0, n_tab, novf), jnp.int32))
            t = timeit(seg_sum, x, cols, rows)
            print(f"seg_sum   ovf={novf:7d} {np.dtype(dt).name:8s} "
                  f"{t/novf*1e9:5.2f}ns/edge", flush=True)


if __name__ == "__main__":
    main()
