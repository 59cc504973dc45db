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
import os
import sys
import time

log = logging.getLogger("incagg_gnn_tpu")

#: child exit code meaning "the device was lost mid-run" (TPU worker crash /
#: restart, transfer watchdog timeout) — the one failure class the supervisor
#: restarts from the latest checkpoint; every other failure propagates.
DEVICE_LOSS_EXIT = 23

_DEVICE_LOSS_MARKERS = (
    "UNAVAILABLE",            # PJRT status of a dead/restarted worker
    "DATA_LOSS",              # PJRT status of lost device buffers
    "crashed or restarted",   # TPU worker crash message
    "DeviceTimeoutError",     # our fail-fast transfer watchdog
)


def _is_device_loss(exc: BaseException) -> bool:
    """Classify an exception as device loss (worker crash, lost buffers,
    watchdog timeout) vs an ordinary program error.  The reference has no
    failure detection at all (SURVEY §5.3 — CUDA memcpy errors are printed
    and execution continues); here device loss is detected, surfaced with a
    dedicated exit code, and — under ``--supervise`` — recovered from the
    latest checkpoint."""
    from incagg_gnn_tpu.utils.watchdog import DeviceTimeoutError

    if isinstance(exc, DeviceTimeoutError):
        return True
    msg = f"{type(exc).__name__}: {exc}"
    return any(m in msg for m in _DEVICE_LOSS_MARKERS)


def _maybe_inject_fault(epoch: int, ckpt_dir):
    """Fault-injection hook for testing the recovery path (the reference has
    none, SURVEY §5.3).  ``INCAGG_FAULT_INJECT=epoch=K`` raises a synthetic
    device-loss error the first time epoch K completes (one-shot via a marker
    file in the checkpoint dir, so the supervised restart then runs clean);
    ``INCAGG_FAULT_INJECT=always`` crashes at every epoch end — a permanent
    failure that must exhaust the supervisor's retry budget."""
    spec = os.environ.get("INCAGG_FAULT_INJECT")
    if not spec:
        return
    if spec != "always":
        if not ckpt_dir:
            return
        kind, _, at = spec.partition("=")
        marker = os.path.join(ckpt_dir, ".fault_injected")
        if epoch != int(at) or os.path.exists(marker):
            return
        with open(marker, "w"):
            pass
        if kind == "hang_epoch":
            # simulate the observed transport wedge (main thread parked in
            # tcp_recvmsg forever, no heartbeat): only the supervisor's
            # stall watchdog can recover this
            log.warning("INCAGG_FAULT_INJECT: hanging forever at epoch %d",
                        epoch)
            while True:
                time.sleep(3600)
    raise RuntimeError(
        "UNAVAILABLE: TPU worker process crashed or restarted "
        "(injected by INCAGG_FAULT_INJECT)"
    )


def _supervise(raw_argv, retries: int, ckpt_dir: str,
               stall_s: float = 1800.0) -> int:
    """Elastic recovery (SURVEY §5.3): run the training CLI in a child
    process; when the child dies of device loss (exit ``DEVICE_LOSS_EXIT``),
    relaunch it — the child restores the newest checkpoint itself via
    ``--checkpoint-dir``.  A fresh process is required because a JAX client
    whose backend died cannot reinitialize in-process.

    ``retries`` bounds consecutive restarts *without checkpoint progress*;
    any restart that advanced the saved epoch resets the budget."""
    import json
    import subprocess

    # strip --supervise[=N] / --supervise-stall-s so the child runs the
    # plain training path
    child_argv, skip = [], False
    for a in raw_argv:
        if skip:
            skip = False
            continue
        if a in ("--supervise", "--supervise-stall-s"):
            skip = True
            continue
        if a.startswith(("--supervise=", "--supervise-stall-s=")):
            continue
        child_argv.append(a)

    def ckpt_epoch() -> int:
        # fall back over older metas (mirrors maybe_restore): a crash can
        # land exactly mid-save, and misreading progress as none would burn
        # the retry budget of a run that is in fact advancing
        try:
            metas = sorted((f for f in os.listdir(ckpt_dir)
                            if f.endswith(".meta.json")), reverse=True)
        except Exception:
            return -1
        for name in metas:
            try:
                with open(os.path.join(ckpt_dir, name)) as f:
                    return int(json.load(f)["epoch"])
            except Exception:
                continue
        return -1

    from incagg_gnn_tpu.utils.heartbeat import ENV_VAR as HB_ENV

    hb_path = os.path.join(ckpt_dir, ".heartbeat")
    env = {**os.environ, HB_ENV: hb_path}

    def run_child() -> int:
        """Run one attempt; kill it (SIGKILL, exact pid) if its heartbeat
        goes stale — the transport-wedge mode (thread parked in tcp_recvmsg
        with zero bytes moving, observed on the remote-chip link) that no
        in-process watchdog can escape."""
        p = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), *child_argv], env=env
        )
        start = time.time()
        poll_s = 10.0 if stall_s <= 0 else max(0.5, min(10.0, stall_s / 3))
        while True:
            try:
                return p.wait(timeout=poll_s)
            except subprocess.TimeoutExpired:
                pass
            if stall_s <= 0:
                continue
            try:
                last = os.path.getmtime(hb_path)
            except OSError:
                last = start  # no beat yet: measure from launch
            # before the FIRST beat of this attempt, the child is in
            # startup (imports, partition, jit compile) where silence is
            # legitimate — the transport-wedge mode this watchdog targets
            # strikes mid-run.  Grant a grace window so a loaded host or a
            # slow first compile isn't killed as a stall.
            limit = stall_s if last > start else max(stall_s * 5.0, 60.0)
            if time.time() - max(last, start) > limit:
                log.error(
                    f"supervisor: no heartbeat for {limit:.0f}s — killing "
                    f"stalled child {p.pid}"
                )
                p.kill()
                p.wait()
                return DEVICE_LOSS_EXIT

    attempt, last_epoch = 0, ckpt_epoch()
    while True:
        rc = run_child()
        if rc != DEVICE_LOSS_EXIT:
            return rc
        epoch = ckpt_epoch()
        if epoch > last_epoch:
            attempt, last_epoch = 0, epoch  # progress — reset the budget
        attempt += 1
        if attempt > retries:
            log.error(
                f"supervisor: device lost {attempt} times with no checkpoint "
                f"progress past epoch {last_epoch}; giving up"
            )
            return DEVICE_LOSS_EXIT
        delay = min(60.0, 5.0 * attempt)
        log.warning(
            f"supervisor: device loss (attempt {attempt}/{retries}); "
            f"restarting from checkpoint epoch {last_epoch} in {delay:.0f}s"
        )
        time.sleep(delay)


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
    # no prefix abbreviation: the supervisor strips the literal "--supervise"
    # from the child argv; an abbreviated spelling would survive the strip
    # and recurse
    ap = argparse.ArgumentParser(allow_abbrev=False)
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
    ap.add_argument("--supervise", type=int, default=0, metavar="N",
                    help="elastic recovery: run training in a child process "
                         "and, on device loss (TPU worker crash/restart, "
                         "watchdog timeout), restart it from the latest "
                         "checkpoint — up to N consecutive times without "
                         "checkpoint progress (requires --checkpoint-dir)")
    ap.add_argument("--supervise-stall-s", type=float, default=1800.0,
                    help="with --supervise: kill + restart the child when "
                         "its liveness heartbeat goes stale this long — "
                         "recovers silent transport wedges (a hung transfer "
                         "never raises, so only the supervisor can act); "
                         "0 disables")
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

    # This environment's JAX build ignores the JAX_PLATFORMS env var (device
    # plugins win platform selection); honor an explicit platform request via
    # the config API before any backend init (used by tests / CPU dry runs).
    plat = os.environ.get("INCAGG_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)

    # persistent compilation cache: compiles through a remote-chip tunnel
    # take minutes; reuse them across runs (harmless elsewhere)
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("INCAGG_COMPILE_CACHE",
                                         "/tmp/incagg_jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    if args.supervise > 0:
        if not args.checkpoint_dir:
            ap.error("--supervise requires --checkpoint-dir")
        raw = list(argv) if argv is not None else sys.argv[1:]
        rc = _supervise(raw, args.supervise, args.checkpoint_dir,
                        stall_s=args.supervise_stall_s)
        if rc != 0:
            sys.exit(rc)
        return

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

    try:
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
    except Exception as e:
        if _is_device_loss(e):
            # fail fast with the dedicated exit code (SURVEY §5.3 — the
            # reference logs CUDA errors and continues, a silent-corruption
            # hazard); under --supervise this triggers a checkpoint restart
            log.error(f"device loss: {type(e).__name__}: {e}")
            sys.exit(DEVICE_LOSS_EXIT)
        raise


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
        # memory-budget gate: when a shard's cache slab would not fit the
        # per-chip HBM budget, fall to the host-DRAM spill composition
        # (--spill forces it; both modes since r4 — GAS via staged IB+OB
        # pulls + fresh-push halo splice, VERDICT r3 #6)
        L = int(run_cfg.architecture.get("num_layers", model.cfg.num_layers))
        hist_bytes = (2 * L * (data.num_nodes + args.n_devices)
                      * model.hist_dim
                      * (2 if run_cfg.trainer.hist_dtype == "bfloat16" else 4))
        budget = int(os.environ.get("INCAGG_HBM_BUDGET_MB",
                                    "9000")) << 20  # v5e: 16 GB minus
        # activations/tables/stacked-batch headroom
        want_spill = (getattr(args, "spill", False)
                      or hist_bytes // args.n_devices > budget)
        if want_spill:
            from incagg_gnn_tpu.parallel.spill_sharded import (
                ShardedSpillVRTrainer)

            log.info(
                f"sharded spill tier: cache slab "
                f"{hist_bytes // args.n_devices >> 20} MB/device vs budget "
                f"{budget >> 20} MB — histories stay in host DRAM")
            trainer = ShardedSpillVRTrainer(model, data, run_cfg.trainer,
                                            mesh=mesh,
                                            n_devices=args.n_devices,
                                            log=True)
        else:
            trainer = ShardedVRTrainer(model, data, run_cfg.trainer,
                                       mesh=mesh, n_devices=args.n_devices,
                                       log=True)
    elif getattr(args, "spill", False):
        from incagg_gnn_tpu.train.spill_trainer import SpillVRTrainer

        trainer = SpillVRTrainer(model, data, run_cfg.trainer, log=True)
    else:
        trainer = Trainer(model, data, run_cfg.trainer, log=True)

    ckpt = None
    if args.checkpoint_dir:
        import jax

        from incagg_gnn_tpu.train.checkpoint import (
            CheckpointManager, ShardedCheckpointManager)

        # multi-host pods save per-process history shards (no full gather);
        # single-host keeps the gathered single-file format.
        # INCAGG_SHARDED_CKPT=1 forces the sharded path (virtual-mesh tests)
        sharded_ck = hasattr(trainer, "hist_arrays") and (
            jax.process_count() > 1
            or os.environ.get("INCAGG_SHARDED_CKPT") == "1")
        mgr = ShardedCheckpointManager if sharded_ck else CheckpointManager
        ckpt = mgr(args.checkpoint_dir)
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

    # resume the best-so-far metrics from the checkpoint meta so a
    # supervised restart reports finals over the WHOLE run
    meta = getattr(trainer, "restored_meta", {}) or {}
    best_val = float(meta.get("best_val", 0.0))
    best_test = float(meta.get("best_test", 0.0))
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
        _maybe_inject_fault(epoch, args.checkpoint_dir)
        if ckpt is not None:
            ckpt.save(trainer, epoch,
                      extra={"best_val": best_val, "best_test": best_test})
    log.info("=========================")
    log.info(f"Val: {best_val:.4f}, Test: {best_test:.4f}")
    return best_val, best_test


if __name__ == "__main__":
    main()
