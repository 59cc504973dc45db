"""On-chip trace of the bench train-step chain (fwd + transpose bwd + update)
at one of the three bench shapes.  VERDICT r3 #1: every train row is <=0.52x
its tier roofline; find the dominating term.

Usage: python _train_trace.py [shape] [outdir]
  shape in {arxiv, products, reddit}
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

SHAPES = {
    "arxiv": ("arxiv", 100_000, 14.0, "hybrid", "f32", 80, 16),
    "products": ("products", 100_000, 50.0, "block", "bf16", 80, 16),
    "reddit": ("reddit", 233_000, 100.0, "block", "bf16", 200, 41),
}


def main():
    shape = sys.argv[1] if len(sys.argv) > 1 else "reddit"
    outdir = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/train_trace_{shape}"
    name, n, deg, fmt, dtype_s, parts, classes = SHAPES[shape]

    import bench
    jax = bench._setup_jax()

    ops, fn, fmt, e, x = bench._build(name, n, deg, fmt, dtype_s, parts,
                                      classes, "train")
    print(f"# {name}: fmt={fmt} edges={e}", file=sys.stderr)

    iters = 10
    import jax.numpy as jnp

    # identical step shape to bench.py's train rows: aggregation -> [D, D]
    # weight layer -> full backward.  The linear is load-bearing — without
    # it the bare A@x / A^T@g chain hits the MSA pathology (no prefetch
    # window for the cotangent gather table, docs/RESULTS.md r4).
    w0 = jnp.asarray(np.random.default_rng(3)
                     .standard_normal((x.shape[1], x.shape[1])) * 0.05,
                     x.dtype)

    def step(h, w_, o):
        def f(v, w_):
            return (fn(o, v) @ w_).sum().astype(jnp.float32)
        _, (dx, dw) = jax.value_and_grad(f, argnums=(0, 1))(h, w_)
        return ((h - 1e-3 * dx.astype(h.dtype)).astype(h.dtype),
                (w_ - 1e-3 * dw.astype(w_.dtype)).astype(w_.dtype))

    @jax.jit
    def run(x, w, ops):
        def body(carry, _):
            h, w_ = carry
            return step(h, w_, ops), None
        (h, w_), _ = jax.lax.scan(body, (x, w), None, length=iters)
        return h.sum().astype(jnp.float32) + w_.sum().astype(jnp.float32)

    run = lambda x, ops, _run=run: _run(x, w0, ops)  # keep call sites below

    # warm
    float(run(x, ops))
    float(run(x, ops))
    t0 = time.perf_counter()
    float(run(x, ops))
    dt = time.perf_counter() - t0
    print(f"# wall {dt*1e3:.1f} ms for {iters} iters -> "
          f"{e/(dt/iters)/1e6:.1f}M e/s", file=sys.stderr)

    with jax.profiler.trace(outdir):
        float(run(x, ops))
    print(outdir)


if __name__ == "__main__":
    main()
