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
(each includes everything the previous proved clean plus one component),
plus — after the first matrix came back ALL CLEAN while the original
main.py command still crashes (2026-08-21) — the history-cache axis the
r2 bisection implicated ("full step after fill, fresh on-device copy of
hist: crash"): vrpull (VR-style M_in/M_ag gathers from [N+1, D] tables
inside the step), vrpull_full (vrpull + BN/dropout/Adam), multibatch
(10 distinct batches at identical padded shapes, cycled).  Outcome table
is printed by the driver and belongs in docs/RESULTS.md; a pinned
auto-gate test (tests/test_spmm_loader.py::TestAutoFormatGate) already
guards the shipped mitigation.
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
ITERS = int(os.environ.get("INCAGG_REPRO_ITERS", "40"))  # r2 crash fired within ~5 dispatches


def build_batches(count: int = 1):
    """Real loader-shaped batches at the original crashing operating point:
    sbm-arxiv, 150 single-cluster parts, VR (IB-only) hybrid bi pairs at
    common padded shapes, plus each batch's global node ids (push_idx)."""
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
    n_nodes = data.num_nodes
    batches = []
    ovf_pad = 640  # the original crashing layout
    for b in range(count):
        lo, hi = int(ptr[b]), int(ptr[b + 1])
        n0 = hi - lo
        assert n0 <= N_ROWS
        rowptr = adj.rowptr[lo: hi + 1] - adj.rowptr[lo]
        e0, e1 = int(adj.rowptr[lo]), int(adj.rowptr[hi])
        col = adj.col[e0:e1].astype(np.int64)
        val = adj.value[e0:e1]
        keep = (col >= lo) & (col < hi)  # IB-only (VR batches drop OB cols)
        deg = np.diff(rowptr)
        rows = np.repeat(np.arange(n0), deg)
        rows, col, val = rows[keep], (col[keep] - lo), val[keep]
        rp = np.zeros(N_ROWS + 1, dtype=np.int64)
        np.add.at(rp, rows + 1, 1)
        rp = np.cumsum(rp)
        bi = build_bi_hybrid_adj(rp, col.astype(np.int32), val, N_ROWS,
                                 N_ROWS, k=K, k_t=K, ovf_pad=ovf_pad,
                                 ovf_pad_t=ovf_pad, bucket_ext=False)
        push_idx = np.full(N_ROWS, n_nodes, dtype=np.int32)  # pad -> trash
        push_idx[:n0] = np.arange(lo, hi)
        batches.append((bi, push_idx, n0))
    x = np.random.default_rng(0).standard_normal((N_ROWS, D)).astype(np.float32)
    y = np.random.default_rng(1).integers(0, 40, N_ROWS)
    return batches, x, y, n_nodes


def run_variant(name: str) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from incagg_gnn_tpu.ops.ell import spmm_bi

    n_batches = 10 if name == "multibatch" else 1
    batches, x_np, y_np, n_nodes = build_batches(n_batches)
    bi, push_np, n0 = batches[0]
    x = jnp.asarray(x_np)
    y = jnp.asarray(y_np)
    rng = jax.random.PRNGKey(0)

    use_linear = name in ("linear", "bn", "dropout", "adam", "bn_dropout",
                          "full", "vrpull", "vrpull_full", "multibatch")
    use_bn = name in ("bn", "bn_dropout", "full", "vrpull_full",
                      "multibatch")
    use_dropout = name in ("dropout", "bn_dropout", "full", "vrpull_full",
                           "multibatch")
    use_adam = name in ("adam", "full", "vrpull_full", "multibatch")
    use_vrpull = name in ("vrpull", "vrpull_full", "multibatch",
                          "vrpull_1table", "vrpull_fwdonly",
                          "vrpull_nofill")
    if name in ("vrpull_1table", "vrpull_fwdonly", "vrpull_nofill"):
        use_linear = True

    if use_vrpull:
        # the history tables the r2 bisection implicated: per-layer
        # [N+1, D] stacks the VR step gathers M_in/M_ag from
        t_in = jnp.asarray(np.random.default_rng(5)
                           .standard_normal((n_nodes + 1, D)) * 0.1,
                           jnp.float32)
        t_ag = jnp.asarray(np.random.default_rng(6)
                           .standard_normal((n_nodes + 1, D)) * 0.1,
                           jnp.float32)
    else:
        t_in = t_ag = None

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

    def agg(b, xx, tabs):
        if use_vrpull:
            # VR-shaped: fresh IB aggregation of (x - M_in) + cached M_ag
            # (gcn_conv_vr structure, two stop-grad table gathers per layer).
            # NOTE the tables are jit ARGUMENTS (as in the real trainer) —
            # closed-over [N, D] constants exceed the remote-compile
            # tunnel's request limit (HTTP 413) and never reach the chip.
            m_in = jax.lax.stop_gradient(jnp.take(tabs[0], b[1], axis=0))
            if name == "vrpull_1table":
                return spmm_bi(b[0], xx - m_in)
            m_ag = jax.lax.stop_gradient(jnp.take(tabs[1], b[1], axis=0))
            return spmm_bi(b[0], xx - m_in) + m_ag
        return spmm_bi(b[0], xx)

    def forward(p, state, b, xx, key, tabs):
        h = agg(b, xx, tabs)
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
        h = agg(b, h, tabs)
        logits = h @ p["w2"]
        valid = jnp.arange(N_ROWS) < n0
        ll = jax.nn.log_softmax(logits)
        loss = -jnp.where(valid, ll[jnp.arange(N_ROWS), y], 0.0).sum() / n0
        return loss, state

    @jax.jit
    def step(p, o, state, b, xx, key, tabs):
        (loss, state), g = jax.value_and_grad(
            forward, argnums=0, has_aux=True)(p, state, b, xx, key, tabs)
        if use_adam:
            upd, o = tx.update(g, o, p)
            p = jax.tree.map(lambda a, b2: a + b2, p, upd)
        else:
            p = jax.tree.map(lambda a, b2: a - 1e-3 * b2, p, g)
        return p, o, state, loss

    dev_batches = [(jax.device_put(b), jnp.asarray(pi))
                   for b, pi, _ in batches]
    fwd_jit = jax.jit(forward)

    # "fill"-like prelude: a scanned forward-only pass (the r2 table showed
    # crashes fired after the fill had run in the same process)
    @jax.jit
    def fill(xx):
        def body(c, _):
            return spmm_bi(dev_batches[0][0], c).astype(c.dtype), None
        h, _ = jax.lax.scan(body, xx, None, length=10)
        return h

    if name != "vrpull_nofill":
        jax.block_until_ready(fill(x))
    t0 = time.time()
    for i in range(ITERS):
        rng, key = jax.random.split(rng)
        b = dev_batches[i % len(dev_batches)]
        if name == "vrpull_fwdonly":
            loss, bn_state = fwd_jit(params, bn_state, b, x, key,
                                     (t_in, t_ag))
        else:
            params, opt_state, bn_state, loss = step(
                params, opt_state, bn_state, b, x, key, (t_in, t_ag))
        jax.block_until_ready(loss)
    print(f"CLEAN {name}: {ITERS} dispatches, last loss "
          f"{float(loss):.4f} [{time.time()-t0:.0f}s]")


def driver(only=None):
    variants = only or ["bare", "linear", "bn", "dropout", "adam",
                        "bn_dropout", "full", "vrpull", "vrpull_full",
                        "multibatch"]
    reps = 2
    results = {}
    for v in variants:
        outs = []
        for r in range(reps):
            try:
                pr = subprocess.run(
                    [sys.executable, os.path.abspath(__file__), v],
                    capture_output=True, text=True, timeout=900)
            except subprocess.TimeoutExpired:
                # a worker crash can wedge the runtime rather than raise —
                # count a hang as a fault and keep going
                outs.append("HANG(900s)")
                print(f"{v} rep{r}: {outs[-1]}", flush=True)
                continue
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
        driver(sys.argv[2:] or None)
