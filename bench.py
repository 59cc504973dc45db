"""Benchmark entry point (run by the driver on real TPU hardware).

Measures the hot kernel — neighborhood-aggregation SpMM — at the three
operating shapes the framework targets (BASELINE.md: GCN-arxiv,
GCNII/APPNP-products, GraphSAGE-reddit), each on the tier the trainer's
`adj_format=auto` policy actually selects there (docs/RESULTS.md
"Block-dense (MXU) aggregation tier"):

  arxiv-shape    deg 14,  hybrid ELL+COO, f32   (block tier auto-rejects)
  products-shape deg 50,  block+remainder, bf16
  reddit-shape   deg 100, block+remainder, bf16

plus, for each shape, a TRAIN-STEP row (forward + transpose backward via
the custom-VJP bi-format, VERDICT r2 #6) — the quantity that decides epoch
time, not just the forward aggregation.  The train chain includes one
[D, D] weight layer (fwd matmul + grad), as every real train step has:
round-4 tracing showed a bare A@x / A^T@g chain is an XLA
memory-space-assignment pathology — with NO op between producing the
cotangent and the transpose gather, MSA cannot stage the gather table in
alternate memory and the gather runs 4.4x slower (12.3 vs 2.8 ns/slot at
the arxiv shape) than in any realistic step, where the interposed linear
backward provides the prefetch window (docs/RESULTS.md "train-step
backward chain", r4).  The extra matmul work is NOT credited: edges/s
still counts aggregated edges only (conservative).

All rows are scan-chained so the result is data-dependent end-to-end (no
async-dispatch timing artifacts through the axon tunnel).

Robustness (VERDICT r2 "what's weak" #1 — the BENCH_r02 arxiv row collapsed
14x to 8.9M edges/s on the driver's run while the identical code measures
126M when re-run; root cause: transient chip/tunnel contention, not a code
regression — the r1->r2 diff of the arxiv path is empty and the row
reproduces at the r1 value, see docs/RESULTS.md "BENCH_r02 arxiv collapse"):
  * two warm-up calls per row before timing (first-call-after-compile and
    allocator-growth effects excluded),
  * adaptive repeats: keep timing until the two best runs agree within 5%
    (min 3, max 10 timed calls),
  * regression guard: every row is compared against the committed
    prior-round value (PRIOR below); a row below 0.7x prior is re-warmed
    and re-timed once from scratch, and if still low it is flagged in a
    "regressions" list in the output JSON so a bad environment can never
    again masquerade silently as a kernel regression.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline", "suite",
"regressions"}.  The headline row is the best forward tier (reddit-shape
block).  vs_baseline = edges/s divided by a FIXED reference bound: the
HBM-bandwidth roofline of an ideal gather-based SpMM at d=256 f32 on one
v5e chip (819 GB/s / (3 row moves x 256 x 4 B) = 266.6M edges/s).  The
reference publishes no throughput numbers (BASELINE.md), so this
speed-of-light denominator is the honest baseline; the dense MXU tier can
exceed 1.0 by moving fewer bytes per edge than any gather formulation —
that is the design win.  Per-row "vs_tier_roofline" reports each row
against the same bound scaled to its own compute dtype (bf16 moves half
the bytes); train rows against half that bound (each edge is aggregated
twice per step: A@x forward, A^T@g backward).
"""

import json
import os
import sys
import time

import numpy as np

HBM_BW = 819e9  # v5e HBM bytes/s
D = 256
ROOFLINE_F32 = HBM_BW / (3 * D * 4)  # 266.6M edges/s — the fixed baseline

# Committed prior-round per-row values (edges/s) — the regression guard.
# All rows: round-5 tall-tile values re-confirmed on the v5e 2026-08-22
# (arxiv 159.2M/79.1M, products 458.8M/232.7M, reddit fwd 441.1M match
# the docs/RESULTS.md r5 table within 1%; reddit train from that table).
PRIOR = {
    ("arxiv", "fwd"): 159.2e6,
    ("products", "fwd"): 458.8e6,
    ("reddit", "fwd"): 441.1e6,
    ("arxiv", "train"): 79.1e6,
    ("products", "train"): 232.7e6,
    ("reddit", "train"): 222.3e6,
}
GUARD_RATIO = 0.7


def _setup_jax():
    import jax

    # persistent compilation cache: compiles through the chip tunnel take
    # minutes; cache them across bench invocations
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/incagg_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    return jax


def _time_run(run, warmups=2, min_reps=3, max_reps=10, rtol=0.05):
    """Best wall time of an already-jitted nullary thunk.

    Two warm-ups, then timed calls until the two fastest agree within
    ``rtol`` (or ``max_reps``).  Returns best seconds."""
    for _ in range(warmups):
        run()
    times = []
    for i in range(max_reps):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
        if i + 1 >= min_reps:
            a, b = sorted(times)[:2]
            if b - a <= rtol * a:
                break
    return min(times)


def _build(name, n, avg_degree, fmt, dtype_s, num_parts, classes, kind):
    """Returns (ops, fn, fmt, e, x) for one row."""
    import jax.numpy as jnp
    import ml_dtypes

    from incagg_gnn_tpu.graph.csr import gcn_norm, permute
    from incagg_gnn_tpu.graph.datasets import make_sbm
    from incagg_gnn_tpu.graph.partition import partition_graph
    from incagg_gnn_tpu.ops.block import (
        build_bi_block_hybrid, build_block_hybrid, plan_block_tier_rb,
        spmm_block, spmm_block_bi)
    from incagg_gnn_tpu.ops.ell import (
        build_bi_hybrid_adj, build_hybrid_adj, spmm_bi, spmm_hybrid)

    data, _, _ = make_sbm(num_nodes=n, num_classes=classes, num_features=8,
                          avg_degree=avg_degree, seed=0)
    adj = data.adj_t
    if fmt == "block":
        # the dense tier needs partition+permute locality (like the trainer)
        perm, ptr = partition_graph(adj, num_parts)
        data = permute(data, perm)
        adj = data.adj_t
    adj = gcn_norm(adj.set_diag())
    e = int(adj.nnz)
    n_pad = ((n + 128) // 128) * 128
    dt = jnp.bfloat16 if dtype_s == "bf16" else jnp.float32
    a_np = ml_dtypes.bfloat16 if dtype_s == "bf16" else np.float32
    itemsize = 2 if dtype_s == "bf16" else 4

    def _cast_hyb(h):
        return h.cast_values(dt)

    ops, fn = None, None
    if fmt == "block":
        plan = plan_block_tier_rb(adj.rowptr, adj.col, n_pad,
                                  x_itemsize=itemsize, a_itemsize=itemsize,
                                  d_hint=D)
        if plan is not None:
            th, rb = plan
            if kind == "train":
                blk = build_bi_block_hybrid(adj.rowptr, adj.col, adj.value,
                                            n_pad, n_pad, thresh=th,
                                            a_dtype=a_np, rb_rows=rb)
                blk = blk._replace(fwd=blk.fwd._replace(rem=_cast_hyb(blk.fwd.rem)),
                                   bwd=blk.bwd._replace(rem=_cast_hyb(blk.bwd.rem)))
                ops, fn = blk, spmm_block_bi
            else:
                blk = build_block_hybrid(adj.rowptr, adj.col, adj.value,
                                         n_pad, n_pad, thresh=th,
                                         a_dtype=a_np, rb_rows=rb)
                blk = blk._replace(rem=_cast_hyb(blk.rem))
                ops, fn = blk, spmm_block
        else:
            fmt = "hybrid"  # tier auto-rejected: report the actual path
    if ops is None:
        if kind == "train":
            bi = build_bi_hybrid_adj(adj.rowptr, adj.col, adj.value,
                                     n_pad, n_pad)
            ops = bi._replace(fwd=_cast_hyb(bi.fwd), bwd=_cast_hyb(bi.bwd))
            fn = spmm_bi
        else:
            ops = _cast_hyb(build_hybrid_adj(adj.rowptr, adj.col, adj.value,
                                             n_pad, n_pad))
            fn = spmm_hybrid

    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((n_pad, D)) * 0.1, dt)
    return ops, fn, fmt, e, x


def _bench_shape(name, n, avg_degree, fmt, dtype_s, num_parts, classes,
                 kind="fwd", iters=10):
    jax = _setup_jax()
    import jax.numpy as jnp

    itemsize = 2 if dtype_s == "bf16" else 4
    ops, fn, fmt, e, x = _build(name, n, avg_degree, fmt, dtype_s,
                                num_parts, classes, kind)
    # more scan iterations at small shapes: the axon tunnel adds ~30-38 ms
    # of per-call dispatch/readback latency, which at the arxiv shape
    # (~19 ms/iter on-chip) would otherwise masquerade as kernel time —
    # at iters=10 the products fwd row read 371M for a 449M kernel (r5)
    if e < 3_000_000:
        iters = 200
    elif e < 10_000_000:
        iters = 100
    else:
        iters = 30
    import jax.numpy as jnp

    w = jnp.asarray(
        np.random.default_rng(3).standard_normal((D, D)) * 0.05, x.dtype)

    if kind == "train":
        # representative train step: aggregation fwd -> weight layer ->
        # full backward (weight grad + transpose aggregation), chained
        # through x so the scan stays data-dependent
        def step(h, w_, o):
            def f(v, w_):
                return (fn(o, v) @ w_).sum().astype(jnp.float32)
            _, (dx, dw) = jax.value_and_grad(f, argnums=(0, 1))(h, w_)
            return ((h - 1e-3 * dx.astype(h.dtype)).astype(h.dtype),
                    (w_ - 1e-3 * dw.astype(w_.dtype)).astype(w_.dtype))
    else:
        def step(h, w_, o):
            return fn(o, h).astype(h.dtype), w_

    # NOTE: step must close over run's *parameter* (a tracer), never the
    # outer concrete ops arrays — closed-over device arrays are inlined
    # into the HLO as constants, and the remote-compile tunnel rejects
    # the resulting 100s-of-MB program (HTTP 413) at products/reddit
    # shapes.
    @jax.jit
    def run(x, w, ops):
        def body(carry, _):
            h, w_ = carry
            return step(h, w_, ops), None
        (h, w_), _ = jax.lax.scan(body, (x, w), None, length=iters)
        return h.sum().astype(jnp.float32) + w_.sum().astype(jnp.float32)

    def timed():
        float(run(x, w, ops))  # scalar readback forces completion

    def measure():
        return e / (_time_run(timed) / iters)

    edges_per_s = measure()
    prior = PRIOR.get((name, kind))
    regressed = prior is not None and edges_per_s < GUARD_RATIO * prior
    if regressed:
        # one full re-warm + re-time: transient tunnel/chip contention is
        # the known failure mode (BENCH_r02 arxiv row) — never let one bad
        # window stand as the number of record without a second look
        print(f"# guard: {name}/{kind} {edges_per_s:.3g} < "
              f"{GUARD_RATIO}x prior {prior:.3g}; re-timing",
              file=sys.stderr)
        edges_per_s = max(edges_per_s, measure())
        regressed = edges_per_s < GUARD_RATIO * prior

    tier_roof = HBM_BW / (3 * D * itemsize)
    if kind == "train":
        tier_roof = tier_roof / 2  # two aggregations per edge per step
    return {
        "shape": name, "kind": kind, "fmt": fmt, "dtype": dtype_s,
        "n": n, "edges": e,
        "edges_per_s": round(edges_per_s),
        "vs_baseline": round(edges_per_s / ROOFLINE_F32, 4),
        "vs_tier_roofline": round(edges_per_s / tier_roof, 4),
        "vs_prior": round(edges_per_s / prior, 4) if prior else None,
        "regressed": regressed,
    }


def main():
    _setup_jax()

    shapes = [
        # round-1 headline row kept first (VERDICT r1 #1); community widths
        # follow the sbm presets (reddit = 41 classes: ~5.7K-wide
        # communities give the high LOCAL block density real reddit has —
        # 16 classes is the uniform-density pessimum, docs/RESULTS.md
        # "Products-mid ... when the tier pays")
        ("arxiv", 100_000, 14.0, "hybrid", "f32", 80, 16),
        ("products", 100_000, 50.0, "block", "bf16", 80, 16),
        ("reddit", 233_000, 100.0, "block", "bf16", 200, 41),
    ]
    # dev filter: INCAGG_BENCH_ONLY="reddit:train" re-measures one row
    # without the ~12-min full sweep (driver runs always do the full suite)
    only = os.environ.get("INCAGG_BENCH_ONLY", "")
    suite = []
    for args in shapes:
        for kind in ("fwd", "train"):
            if only and f"{args[0]}:{kind}" != only:
                continue
            row = _bench_shape(*args, kind=kind)
            suite.append(row)
            print(f"# {row}", file=sys.stderr)

    head = max([r for r in suite if r["kind"] == "fwd"] or suite,
               key=lambda r: r["vs_baseline"])
    regressions = [f"{r['shape']}/{r['kind']}" for r in suite
                   if r.get("regressed")]
    print(json.dumps({
        "metric": f"spmm_agg_edges_per_s_per_chip_d256_{head['shape']}"
                  f"_{head['fmt']}",
        "value": head["edges_per_s"],
        "unit": "edges/s",
        "vs_baseline": head["vs_baseline"],
        "suite": suite,
        "regressions": regressions,
    }))


if __name__ == "__main__":
    main()
