"""Minimal-repro bisection for the tiny-batch hybrid train-step worker crash
(VERDICT r3 weak #5 / next #8; docs/RESULTS.md "Train-step worker-crash
bisection").

Known from the r2 bisection: the COMPOSED hybrid train step (hybrid fwd +
transpose hybrid bwd + BN + dropout + loss + Adam in one jit) kills the TPU
worker at ~1.4K-row shapes (~5/7 dispatches) while the bare bi-hybrid grad
loop at the same shapes is clean, and COO-everything is clean.  This script
adds the remaining ingredients ONE AT A TIME onto the bare chain at exactly
the crashing shapes, each candidate in a fresh subprocess, to isolate which
component (or pair) triggers the XLA:TPU fault.

  python scripts/probes/tinybatch_repro.py driver          # run the matrix
  python scripts/probes/tinybatch_repro.py <variant>       # one candidate

Variants: bare, linear, bn, dropout, adam, bn_dropout, full
(each includes everything the previous proved clean plus one component —
see VARIANTS).  Outcome table is printed by the driver and belongs in
docs/RESULTS.md; a pinned auto-gate test (tests/test_spmm_loader.py::
TestAutoFormatGate) already guards the shipped mitigation.
"""

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

N_ROWS = 1408  # the crashing padded batch height
K = 8
D = 256
HIDDEN = 256
ITERS = 40  # the r2 crash fired within ~5 dispatches when it fired


def build_batch():
    """One real loader batch at the original crashing operating point:
    sbm-arxiv, 150 single-cluster parts, VR (IB-only) hybrid bi pair."""
    import numpy as np

    from incagg_gnn_tpu.graph.csr import gcn_norm, permute
    from incagg_gnn_tpu.graph.datasets import make_sbm
    from incagg_gnn_tpu.graph.partition import partition_graph
    from incagg_gnn_tpu.ops.ell import build_bi_hybrid_adj

    data, _, _ = make_sbm(num_nodes=169_343, num_classes=40,
                          num_features=128, avg_degree=13.7, seed=0)
    perm, ptr = partition_graph(data.adj_t, 150, seed=0)
    data = permute(data, perm)
    adj = gcn_norm(data.adj_t.set_diag())
    # first cluster, IB-only block, padded to the crashing height
    n0 = int(ptr[1] - ptr[0])
    rowptr = adj.rowptr[: n0 + 1].copy()
    e0 = int(rowptr[-1])
    col = adj.col[:e0].copy()
    val = adj.value[:e0].copy()
    keep = col < n0  # IB-only (VR batches drop OB cols)
    # rebuild CSR with only IB edges
    import numpy as np
    deg = np.diff(rowptr)
    rows = np.repeat(np.arange(n0), deg)
    rows, col, val = rows[keep], col[keep], val[keep]
    rp = np.zeros(N_ROWS + 1, dtype=np.int64)
    np.add.at(rp, rows + 1, 1)
    rp = np.cumsum(rp)
    bi = build_bi_hybrid_adj(rp, col.astype(np.int32), val, N_ROWS, N_ROWS,
                             k=K, bucket_ext=False)
    x = np.random.default_rng(0).standard_normal((N_ROWS, D)).astype(np.float32)
    y = np.random.default_rng(1).integers(0, 40, N_ROWS)
    return bi, x, y, n0


def run_variant(name: str) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from incagg_gnn_tpu.ops.ell import spmm_bi

    bi, x_np, y_np, n0 = build_batch()
    x = jnp.asarray(x_np)
    y = jnp.asarray(y_np)
    rng = jax.random.PRNGKey(0)

    use_linear = name in ("linear", "bn", "dropout", "adam", "bn_dropout",
                          "full")
    use_bn = name in ("bn", "bn_dropout", "full")
    use_dropout = name in ("dropout", "bn_dropout", "full")
    use_adam = name in ("adam", "full")

    w1 = jnp.asarray(np.random.default_rng(2)
                     .standard_normal((D, HIDDEN)) * 0.05, jnp.float32)
    w2 = jnp.asarray(np.random.default_rng(3)
                     .standard_normal((HIDDEN, 40)) * 0.05, jnp.float32)
    params = {"w1": w1, "w2": w2}
    bn_state = {"mean": jnp.zeros((HIDDEN,)), "var": jnp.ones((HIDDEN,))}

    if use_adam:
        import optax

        tx = optax.adam(1e-3)
        opt_state = tx.init(params)
    else:
        tx, opt_state = None, ()

    def forward(p, state, xx, key):
        h = spmm_bi(bi, xx)
        if not use_linear:
            return h.sum(), state
        h = h @ p["w1"]
        if use_bn:
            mu = h[:n0].mean(0)
            var = h[:n0].var(0) + 1e-5
            h = (h - mu) / jnp.sqrt(var)
            state = {"mean": 0.9 * state["mean"] + 0.1 * mu,
                     "var": 0.9 * state["var"] + 0.1 * var}
        h = jax.nn.relu(h)
        if use_dropout:
            keep = jax.random.bernoulli(key, 0.7, h.shape)
            h = jnp.where(keep, h / 0.7, 0.0)
        h = spmm_bi(bi, h)
        logits = h @ p["w2"]
        valid = jnp.arange(N_ROWS) < n0
        ll = jax.nn.log_softmax(logits)
        loss = -jnp.where(valid, ll[jnp.arange(N_ROWS), y], 0.0).sum() / n0
        return loss, state

    @jax.jit
    def step(p, o, state, xx, key):
        (loss, state), g = jax.value_and_grad(forward, has_aux=True)(
            p, state, xx, key)
        if use_adam:
            upd, o = tx.update(g, o, p)
            p = jax.tree.map(lambda a, b: a + b, p, upd)
        else:
            p = jax.tree.map(lambda a, b: a - 1e-3 * b, p, g)
        return p, o, state, loss

    # "fill"-like prelude: a scanned forward-only pass (the r2 table showed
    # crashes fired after the fill had run in the same process)
    @jax.jit
    def fill(xx):
        def body(c, _):
            return spmm_bi(bi, c).astype(c.dtype), None
        h, _ = jax.lax.scan(body, xx, None, length=10)
        return h

    jax.block_until_ready(fill(x))
    t0 = time.time()
    for i in range(ITERS):
        rng, key = jax.random.split(rng)
        params, opt_state, bn_state, loss = step(params, opt_state, bn_state,
                                                 x, key)
        jax.block_until_ready(loss)
    print(f"CLEAN {name}: {ITERS} dispatches, last loss "
          f"{float(loss):.4f} [{time.time()-t0:.0f}s]")


def driver():
    variants = ["bare", "linear", "bn", "dropout", "adam", "bn_dropout",
                "full"]
    reps = 2
    results = {}
    for v in variants:
        outs = []
        for r in range(reps):
            pr = subprocess.run(
                [sys.executable, os.path.abspath(__file__), v],
                capture_output=True, text=True, timeout=900)
            ok = pr.returncode == 0 and "CLEAN" in pr.stdout
            tail = (pr.stdout + pr.stderr).strip().splitlines()[-1:] or [""]
            outs.append("clean" if ok else f"CRASH(rc={pr.returncode})")
            print(f"{v} rep{r}: {outs[-1]}  | {tail[0][:120]}", flush=True)
        results[v] = outs
    print("\n=== outcome matrix ===")
    for v, outs in results.items():
        print(f"{v:12s} {outs}")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] != "driver":
        run_variant(sys.argv[1])
    else:
        driver()
