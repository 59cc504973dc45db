"""Scaling benchmark harness: Reverb training throughput at 1..N devices.

Targets the BASELINE.json north-star "≥80% edges/s scaling efficiency at
1 chip / 1 host / N hosts".  Runs the sharded Reverb trainer over meshes of
increasing size on whatever devices are available (real chips, or the virtual
CPU mesh via --force-cpu N) and reports edges/s and efficiency vs the
1-device run.

    python scripts/scaling_bench.py --devices 1 2 4 8 --force-cpu 8
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--force-cpu", type=int, default=0,
                    help="use a virtual CPU mesh with this many devices")
    ap.add_argument("--num-nodes", type=int, default=100_000)
    ap.add_argument("--num-parts", type=int, default=64)
    ap.add_argument("--hidden", type=int, default=256)
    ap.add_argument("--layers", type=int, default=3)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--hosts", type=int, default=1,
                    help="emulate a (hosts x chips) 2-D mesh at each device "
                         "count divisible by it (hierarchy-aware layout)")
    args = ap.parse_args()

    if args.force_cpu:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.force_cpu}"
        ).strip()
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    from incagg_gnn_tpu.graph.datasets import make_sbm
    from incagg_gnn_tpu.models import GCN, GCNConfig
    from incagg_gnn_tpu.parallel.mesh import make_mesh
    from incagg_gnn_tpu.parallel.spatial import ShardedVRTrainer
    from incagg_gnn_tpu.train.trainer import TrainerConfig

    data, in_c, out_c = make_sbm(
        num_nodes=args.num_nodes, num_classes=16, num_features=64,
        avg_degree=14.0, seed=0,
    )
    # IB edges trained per epoch approximates total edges kept by the
    # partition; measure per-run below from actual batches
    results = []
    base = None
    for nd in args.devices:
        if nd > len(jax.devices()):
            print(f"skip {nd} devices (have {len(jax.devices())})")
            continue
        cfg = GCNConfig(
            num_nodes=data.num_nodes, in_channels=in_c,
            hidden_channels=args.hidden, out_channels=out_c,
            num_layers=args.layers, dropout=0.1, drop_input=False,
        )
        tcfg = TrainerConfig(num_parts=args.num_parts, batch_size=1,
                             vr_update=True, seed=0, epochs=args.epochs)
        if args.hosts > 1 and nd % args.hosts == 0 and nd > args.hosts:
            from incagg_gnn_tpu.parallel.mesh import make_mesh_2d

            mesh = make_mesh_2d(args.hosts, nd // args.hosts)
        else:
            mesh = make_mesh(nd)
        tr = ShardedVRTrainer(GCN(cfg), data, tcfg, mesh=mesh)
        tr.refresh()
        tr.train_epoch()  # warm up / compile
        # count IB edges across one epoch of batches (deg holds true counts)
        edges = sum(int(np.asarray(s.adj.deg).sum()) for s in tr._train_stacks)
        t0 = time.perf_counter()
        for _ in range(args.epochs):
            tr.train_epoch()
        dt = (time.perf_counter() - t0) / args.epochs
        eps = edges / dt
        if base is None:
            base = eps / nd
        eff = eps / (base * nd)
        rec = {"devices": nd, "edges_per_s": round(eps), "epoch_s": round(dt, 3),
               "efficiency": round(eff, 3)}
        results.append(rec)
        print(json.dumps(rec), flush=True)
    return results


if __name__ == "__main__":
    import numpy as np  # noqa: F401  (used above)
    main()
