"""Micro-probe for the two refresh-sweep hypotheses from the r3 trace
(docs/RESULTS.md): (a) scatters into the [L,N+1,D] stack lower as full
flatten-reshape copies (1.23 s/sweep) and per-layer 2-D tables avoid them;
(b) the f32 upcast of the ~full-graph x_in costs more than aggregating in
bf16 directly.  Products-mid shapes: N=500K, D=128, R=17536, K=56."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/incagg_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
L, N, D, R, K, B = 5, 500_001, 128, 17_536, 56, 30
# generate on-device (host->device staging through the tunnel is MB/s)
k0 = jax.random.PRNGKey(0)
ks = jax.random.split(k0, 4)
idx = jax.jit(lambda k: jax.random.randint(k, (B, R), 0, N - 1, jnp.int32))(ks[0])
vals = jax.jit(lambda k: jax.random.normal(k, (B, R, D), jnp.bfloat16))(ks[1])
cols = jax.jit(lambda k: jax.random.randint(k, (B, R, K), 0, N - 1, jnp.int32))(ks[2])
w = jax.jit(lambda k: jax.random.normal(k, (B, R, K), jnp.bfloat16))(ks[3])
jax.block_until_ready((idx, vals, cols, w))
print("inputs staged", flush=True)


def timeit(f, *a, n=5):
    o = f(*a); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(n):
        o = f(*a)
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / n


# (a) scatter into 3-D stack vs per-layer 2-D tables
@jax.jit
def scat3(stack):
    def body(carry, xs):
        i, v = xs
        carry = carry.at[2, i].set(v)
        return carry, None
    stack, _ = jax.lax.scan(body, stack, (idx, vals))
    return stack


@jax.jit
def scat2(tabs):
    def body(carry, xs):
        i, v = xs
        return tuple(t.at[i].set(v) if k == 2 else t
                     for k, t in enumerate(carry)), None
    tabs, _ = jax.lax.scan(body, tabs, (idx, vals))
    return tabs


stack = jnp.zeros((L, N, D), jnp.bfloat16)
tabs = tuple(jnp.zeros((N, D), jnp.bfloat16) for _ in range(L))
if os.environ.get("SKIP_SCAT") != "1":
    t3 = timeit(scat3, stack)
    t2 = timeit(scat2, tabs)
else:
    t3 = t2 = 1.0
print(f"scatter 30x[{R},{D}] into [L,N,D]: {t3*1e3:.1f} ms; "
      f"into per-layer tables: {t2*1e3:.1f} ms  ({t3/t2:.2f}x)")

# (b) aggregation: upcast-f32 table gather vs direct bf16
tab = jax.jit(lambda k: jax.random.normal(k, (N, D), jnp.bfloat16))(k0)


@jax.jit
def agg_f32(tab):
    def body(_, xs):
        c, ww = xs
        x = tab.astype(jnp.float32)
        g = jnp.take(x, c.reshape(-1), axis=0).reshape(R, K, D)
        return _, (g * ww[..., None].astype(jnp.float32)).sum(axis=1)
    _, out = jax.lax.scan(body, 0, (cols, w))
    return out


@jax.jit
def agg_bf16(tab):
    def body(_, xs):
        c, ww = xs
        g = jnp.take(tab, c.reshape(-1), axis=0).reshape(R, K, D)
        return _, (g * ww[..., None]).sum(axis=1).astype(jnp.float32)
    _, out = jax.lax.scan(body, 0, (cols, w))
    return out


tf = timeit(agg_f32, tab)
tb = timeit(agg_bf16, tab)
slots = B * R * K
print(f"agg f32-upcast: {tf*1e3:.1f} ms ({slots/tf/1e6:.0f}M slots/s); "
      f"bf16 direct: {tb*1e3:.1f} ms ({slots/tb/1e6:.0f}M slots/s)  "
      f"({tf/tb:.2f}x)")
