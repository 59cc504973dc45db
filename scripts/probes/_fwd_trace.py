"""On-chip trace of the bench FORWARD chain at one of the three bench shapes.

VERDICT r3 #3: take the forward block tiers from 0.63x to >=0.75x of their
bf16 roofline (reddit fwd >=400M e/s).  Find the dominating term.

Usage: python _fwd_trace.py [shape] [outdir]
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
    outdir = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/fwd_trace_{shape}"
    name, n, deg, fmt, dtype_s, parts, classes = SHAPES[shape]

    import bench
    jax = bench._setup_jax()

    ops, fn, fmt, e, x = bench._build(name, n, deg, fmt, dtype_s, parts,
                                      classes, "fwd")
    print(f"# {name}: fmt={fmt} edges={e}", file=sys.stderr)

    iters = 10

    @jax.jit
    def run(x, ops):
        def body(h, _):
            return fn(ops, h).astype(h.dtype), None
        h, _ = jax.lax.scan(body, x, None, length=iters)
        return h.sum()

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
