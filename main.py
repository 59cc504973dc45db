"""CLI trainer (reference: main.py, Hydra-driven).

Usage:
    python main.py --model conf/model/gcn.yaml --dataset arxiv [key=value ...]
    python main.py --model conf/model/gcn2.yaml --dataset sbm-small vr_update=true

Overrides accept any TrainerConfig field (vr_update, num_parts, batch_size,
lr, epochs, seed, max_steps, edge_dropout, aggregate_combined,
use_aggregation, num_neighbors, drift_norm, hist_dtype, ...) or architecture
keys — all declared, unlike the reference's undeclared ++flags (SURVEY §2.9).
"""

from __future__ import annotations

import argparse
import logging
import sys
import time

log = logging.getLogger("incagg_gnn_tpu")


def build_model(run_cfg, data, in_c, out_c):
    from incagg_gnn_tpu.models import MODEL_REGISTRY, compute_avg_deg

    cls, cfg_cls = MODEL_REGISTRY[run_cfg.model]
    arch = dict(run_cfg.architecture)
    if run_cfg.model.startswith("PNA"):
        # degree statistics for scalers (reference main.py:181-182)
        lin_d, log_d = compute_avg_deg(data.adj_t.degrees())
        arch.setdefault("avg_deg_lin", lin_d)
        arch.setdefault("avg_deg_log", log_d)
        if "aggregators" in arch:
            arch["aggregators"] = tuple(arch["aggregators"])
        if "scalers" in arch:
            arch["scalers"] = tuple(arch["scalers"])
    cfg = cfg_cls(num_nodes=data.num_nodes, in_channels=in_c,
                  out_channels=out_c, **arch)
    return cls(cfg)


def main(argv=None):
    logging.basicConfig(level=logging.INFO, format="%(message)s")
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True, help="path to a conf/model YAML")
    ap.add_argument("--dataset", required=True)
    ap.add_argument("--root", default="/tmp/datasets")
    ap.add_argument("--n-devices", type=int, default=0,
                    help="shard over N devices (VR mode only); 0 = single chip")
    ap.add_argument("--n-hosts", type=int, default=1,
                    help="with --n-devices: use a (hosts x chips) 2-D mesh "
                         "with hierarchy-aware cluster placement (cross-host "
                         "halo minimized); on real pods call "
                         "parallel.mesh.init_distributed() per process first")
    ap.add_argument("--runs", type=int, default=1,
                    help="repeat with seeds seed..seed+runs-1, report mean±std "
                         "(the reference README's accuracy-table protocol)")
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument("--spill", action="store_true",
                    help="keep history caches in host DRAM streamed through "
                         "the C++ staging worker (SpillVRTrainer — the "
                         "reference's operating mode; for caches beyond HBM)")
    ap.add_argument("--eval-only", action="store_true",
                    help="no training: fill/refresh histories (restoring a "
                         "checkpoint first if --checkpoint-dir has one) and "
                         "report train/val/test accuracy")
    ap.add_argument("--save-logits", default=None,
                    help="with --eval-only: write full-graph logits (original "
                         "node order) to this .npy path")
    ap.add_argument("overrides", nargs="*", help="key=value overrides")
    args = ap.parse_args(argv)

    from incagg_gnn_tpu.graph.datasets import INDUCTIVE_DATASETS, get_data
    from incagg_gnn_tpu.train.config import load_config, parse_overrides
    from incagg_gnn_tpu.train.trainer import Trainer

    run_cfg = load_config(args.model, args.dataset, parse_overrides(args.overrides))
    run_cfg.root = args.root

    t = time.perf_counter()
    data, in_c, out_c = get_data(run_cfg.root, run_cfg.dataset)
    log.info(f"data: {run_cfg.dataset} N={data.num_nodes} E={data.adj_t.nnz} "
             f"F={in_c} C={out_c} [{time.perf_counter() - t:.1f}s]")

    # inductive datasets: val/test are *separate graphs*, evaluated with a
    # full-graph forward (reference main.py:167-175,244-249 for PPI)
    eval_graphs = None
    if run_cfg.dataset.lower() in INDUCTIVE_DATASETS:
        val_data, _, _ = get_data(run_cfg.root, run_cfg.dataset, split="val")
        test_data, _, _ = get_data(run_cfg.root, run_cfg.dataset, split="test")
        eval_graphs = (val_data, test_data)
        log.info(f"inductive eval graphs: val N={val_data.num_nodes} "
                 f"test N={test_data.num_nodes}")

    if args.runs > 1:
        import dataclasses as _dc

        import numpy as _np

        vals, tests = [], []
        base_seed = run_cfg.trainer.seed
        for r in range(args.runs):
            run_cfg.trainer = _dc.replace(run_cfg.trainer, seed=base_seed + r)
            v, t_acc = _run_once(args, run_cfg, data, in_c, out_c,
                                 eval_graphs=eval_graphs)
            vals.append(v)
            tests.append(t_acc)
            log.info(f"run {r}: val {v:.4f} test {t_acc:.4f}")
        log.info(
            f"{args.runs} runs — Val: {_np.mean(vals):.4f} ± {_np.std(vals):.4f}, "
            f"Test: {_np.mean(tests):.4f} ± {_np.std(tests):.4f}"
        )
        return float(_np.mean(vals)), float(_np.mean(tests))

    return _run_once(args, run_cfg, data, in_c, out_c, eval_graphs=eval_graphs)


def _run_once(args, run_cfg, data, in_c, out_c, eval_graphs=None):
    from incagg_gnn_tpu.train.trainer import Trainer

    model = build_model(run_cfg, data, in_c, out_c)
    log.info(f"model: {run_cfg.model} {run_cfg.architecture} "
             f"trainer: {run_cfg.trainer}")

    if args.n_devices > 1:
        from incagg_gnn_tpu.parallel.spatial import ShardedVRTrainer

        mesh = None
        if getattr(args, "n_hosts", 1) > 1:
            from incagg_gnn_tpu.parallel.mesh import make_mesh_2d

            assert args.n_devices % args.n_hosts == 0, (args.n_devices, args.n_hosts)
            mesh = make_mesh_2d(args.n_hosts, args.n_devices // args.n_hosts)
        trainer = ShardedVRTrainer(model, data, run_cfg.trainer, mesh=mesh,
                                   n_devices=args.n_devices, log=True)
    elif getattr(args, "spill", False):
        from incagg_gnn_tpu.train.spill_trainer import SpillVRTrainer

        trainer = SpillVRTrainer(model, data, run_cfg.trainer, log=True)
    else:
        trainer = Trainer(model, data, run_cfg.trainer, log=True)

    ckpt = None
    if args.checkpoint_dir:
        from incagg_gnn_tpu.train.checkpoint import CheckpointManager

        ckpt = CheckpointManager(args.checkpoint_dir)
        ckpt.maybe_restore(trainer)

    def inductive_eval(ev):
        """Replace val/test metrics with full-graph forwards on the separate
        inductive graphs (reference main.py:244-249)."""
        if eval_graphs is None:
            return ev
        from incagg_gnn_tpu.utils.metrics import compute_micro_f1

        val_data, test_data = eval_graphs
        ev = dict(ev)
        ev["val_acc"] = compute_micro_f1(
            trainer.full_forward(val_data), val_data.y)
        ev["test_acc"] = compute_micro_f1(
            trainer.full_forward(test_data), test_data.y)
        return ev

    t = time.perf_counter()
    logits = trainer.fill_history()
    log.info(f"history filled [{time.perf_counter() - t:.1f}s]")

    if getattr(args, "eval_only", False):
        # reuse the sweep fill_history just ran (no second refresh)
        ev = inductive_eval(trainer.metrics_from_logits(logits))
        log.info(f"eval-only: train {ev['train_acc']:.4f} "
                 f"val {ev['val_acc']:.4f} test {ev['test_acc']:.4f}")
        if args.save_logits:
            import numpy as _np

            # undo the METIS permutation: row i = original node i
            out = _np.empty_like(logits)
            out[trainer.perm] = logits
            _np.save(args.save_logits, out)
            log.info(f"logits saved to {args.save_logits}")
        return ev["val_acc"], ev["test_acc"]

    best_val = best_test = 0.0
    start_epoch = getattr(trainer, "epoch", 0)
    for epoch in range(start_epoch, run_cfg.trainer.epochs):
        t = time.perf_counter()
        tr = trainer.train_epoch()
        ev = inductive_eval(trainer.evaluate())
        if ev["val_acc"] > best_val:
            best_val, best_test = ev["val_acc"], ev["test_acc"]
        if epoch % run_cfg.log_every == 0:
            log.info(
                f"Epoch {epoch:04d} loss {tr['loss']:.4f} "
                f"train {ev['train_acc']:.4f} val {ev['val_acc']:.4f} "
                f"test {ev['test_acc']:.4f} final {best_test:.4f} "
                f"[{time.perf_counter() - t:.1f}s]"
            )
        if ckpt is not None:
            ckpt.save(trainer, epoch)
    log.info("=========================")
    log.info(f"Val: {best_val:.4f}, Test: {best_test:.4f}")
    return best_val, best_test


if __name__ == "__main__":
    main()
