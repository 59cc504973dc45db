"""Probe: why does the refresh scan cost ~6.8 ms/batch when its parts sum
to ~0.5 ms?  Bisects the scan body: compute-only vs scatter-only vs both,
and scatter hints (unique+sorted)."""

import os
import time
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", ".."))
import jax
import jax.numpy as jnp
import numpy as np

from incagg_gnn_tpu.ops.ell import HybridAdj, spmm_hybrid

rng = np.random.default_rng(0)
L, N, D = 5, 500_008, 128
R, K, C = 16768, 51, 40960
NB = 8
w = jnp.asarray(rng.standard_normal((D, D)) * 0.1, jnp.float32)
vals = jnp.ones((R, K), jnp.float32)
idx_all = jnp.asarray(np.stack([
    np.sort(rng.choice(N - 8, C, replace=False)).astype(np.int32)
    for _ in range(NB)]))
cols_all = jnp.asarray(rng.integers(0, C, size=(NB, R, K)).astype(np.int32))
e0 = jnp.zeros((L, N, D), jnp.bfloat16)
ea0 = jnp.zeros((L, N, D), jnp.bfloat16)
print("arrays ready", flush=True)


def mk_adj(cc):
    return HybridAdj(ell_cols=cc, ell_vals=vals,
                     ovf_rows=jnp.zeros(0, jnp.int32),
                     ovf_cols=jnp.zeros(0, jnp.int32),
                     ovf_vals=jnp.zeros(0, jnp.float32),
                     deg=jnp.full((R,), float(K), jnp.float32))


def timeit(name, f, args, donate):
    f = jax.jit(f, donate_argnums=donate)
    t0 = time.perf_counter()
    o = jax.block_until_ready(f(*args))
    print(f"{name:<46} first {time.perf_counter()-t0:6.1f}s", flush=True)
    outs = o if isinstance(o, tuple) else (o,)
    args2 = list(args)
    for i, d in enumerate(donate):
        args2[d] = outs[i] if i < len(outs) else args2[d]
    t0 = time.perf_counter()
    for _ in range(3):
        o = f(*args2)
        outs = o if isinstance(o, tuple) else (o,)
        for i, d in enumerate(donate):
            args2[d] = outs[i] if i < len(outs) else args2[d]
    jax.block_until_ready(o)
    print(f"{name:<46} {(time.perf_counter()-t0)/3/NB*1e3:8.3f} ms/batch",
          flush=True)


def fA(e, ii, cc):
    def body(c, b):
        ii, cc = b
        x_in = jnp.take(e[2], ii, axis=0).astype(jnp.float32)
        ag = spmm_hybrid(mk_adj(cc), x_in)
        h = (ag @ w + 0.5 * ag) @ w
        return c + h.sum(), None
    return jax.lax.scan(body, jnp.float32(0.0), (ii, cc))[0]


def fB(e, ii):
    def body(e, ii):
        r = jnp.take(e[2], ii[:R], axis=0)
        e = e.at[3, ii[:R]].set(r)
        return e, None
    return jax.lax.scan(body, e, ii)[0]


def fC(e, ea, ii):
    def body(c, ii):
        e, ea = c
        r = jnp.take(e[2], ii[:R], axis=0)
        e = e.at[3, ii[:R]].set(r)
        ea = ea.at[2, ii[:R]].set(r)
        return (e, ea), None
    return jax.lax.scan(body, (e, ea), ii)[0]


def fD(e, ea, ii, cc):
    def body(c, b):
        e, ea = c
        ii, cc = b
        x_in = jnp.take(e[2], ii, axis=0).astype(jnp.float32)
        ag = spmm_hybrid(mk_adj(cc), x_in)
        h = (ag @ w + 0.5 * ag) @ w
        ea = ea.at[2, ii[:R]].set(ag.astype(jnp.bfloat16),
                                  unique_indices=True,
                                  indices_are_sorted=True)
        e = e.at[3, ii[:R]].set(h.astype(jnp.bfloat16),
                                unique_indices=True,
                                indices_are_sorted=True)
        return (e, ea), None
    return jax.lax.scan(body, (e, ea), (ii, cc))[0]


def fE(e2, e3, ea2, ii, cc):
    """Per-layer SPLIT tables: gather source (e2) and scatter targets
    (e3, ea2) are separate buffers — no intra-buffer aliasing hazard."""
    def body(c, b):
        e3, ea2 = c
        ii, cc = b
        x_in = jnp.take(e2, ii, axis=0).astype(jnp.float32)
        ag = spmm_hybrid(mk_adj(cc), x_in)
        h = (ag @ w + 0.5 * ag) @ w
        ea2 = ea2.at[ii[:R]].set(ag.astype(jnp.bfloat16))
        e3 = e3.at[ii[:R]].set(h.astype(jnp.bfloat16))
        return (e3, ea2), None
    return jax.lax.scan(body, (e3, ea2), (ii, cc))[0]


which = sys.argv[1] if len(sys.argv) > 1 else "ABCD"
if "A" in which:
    timeit("A compute-only scan", fA, (e0 + 0, idx_all, cols_all), ())
if "E" in which:
    timeit("E split-table full scan", fE,
           (jnp.zeros((N, D), jnp.bfloat16), jnp.zeros((N, D), jnp.bfloat16),
            jnp.zeros((N, D), jnp.bfloat16), idx_all, cols_all), (1, 2))
if "B" in which:
    timeit("B 1-table gather+scatter scan", fB, (e0 + 0, idx_all), (0,))
if "C" in which:
    timeit("C 2-table scatter scan", fC, (e0 + 0, ea0 + 0, idx_all), (0, 1))
if "D" in which:
    timeit("D full scan + scatter hints", fD,
           (e0 + 0, ea0 + 0, idx_all, cols_all), (0, 1))


def fF(e, ii, cc):
    """A + optimization_barrier after the table gather: forces x_in to
    materialize so the ELL gather reads the compact [C,D] buffer, not a
    fused gather-of-gather from the [5,N,D] HBM table."""
    def body(c, b):
        ii, cc = b
        x_in = jnp.take(e[2], ii, axis=0).astype(jnp.float32)
        x_in = jax.lax.optimization_barrier(x_in)
        ag = spmm_hybrid(mk_adj(cc), x_in)
        h = (ag @ w + 0.5 * ag) @ w
        return c + h.sum(), None
    return jax.lax.scan(body, jnp.float32(0.0), (ii, cc))[0]


def fG(e, ea, ii, cc):
    """Full body (compute + 2 scatters) with the barrier."""
    def body(c, b):
        e, ea = c
        ii, cc = b
        x_in = jnp.take(e[2], ii, axis=0).astype(jnp.float32)
        x_in = jax.lax.optimization_barrier(x_in)
        ag = spmm_hybrid(mk_adj(cc), x_in)
        h = (ag @ w + 0.5 * ag) @ w
        ea = ea.at[2, ii[:R]].set(ag.astype(jnp.bfloat16))
        e = e.at[3, ii[:R]].set(h.astype(jnp.bfloat16))
        return (e, ea), None
    return jax.lax.scan(body, (e, ea), (ii, cc))[0]


if "F" in which:
    timeit("F barrier compute-only scan", fF, (e0 + 0, idx_all, cols_all), ())
if "G" in which:
    timeit("G barrier full scan", fG,
           (e0 + 0, ea0 + 0, idx_all, cols_all), (0, 1))
