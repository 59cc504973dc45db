"""Scaling measurement harness: strong scaling + a *measured* decomposition
of where the efficiency goes on the virtual CPU mesh (VERDICT r2 item 3),
with the same evidence discipline bench.py got after the BENCH_r02
environmental collapse (VERDICT r4 item 1 — SCALING_r04 was contaminated by
host load and shipped unnoticed, flipping the north-star artifact from 0.82
to 0.389 with internally impossible terms).

Physical constraint this environment cannot get around: the host has only
``os.cpu_count()`` (=2 here) cores, and every "device" of the virtual CPU
mesh shares them — so strong-scaling wall clock is capped at min(nd, cores)
speedup no matter how good the sharded program is.  The honest measurement
is therefore a *decomposition* at fixed total work and fixed total cores:

1. ``T_full(nd)``   — sharded GAS epoch/refresh with real collectives.
2. ``T_loopback(nd)`` — identical program with the halo wire looped back
   locally (``halo_wire="loopback"``: same staging gathers, same assembly
   reads, no collective).  ``T_full - T_loopback`` is the measured
   communication + synchronization term, not a model.
3. An isolated ``all_to_all`` microbench at the exact HaloPlan buffer
   shapes — measured wire GB/s on this host, plus the byte count that an
   ICI projection can be applied to.

Since total work and total cores are constant across nd, ``T_loopback(nd) /
T_loopback(1)`` measures pure sharding overhead (padding, round imbalance,
per-device program scheduling), and the comm fraction is measured directly.

Guards (every run, on by default):
  * host-load sniff — ``os.getloadavg()`` is recorded at start and per leg;
    the run REFUSES to start when load1 exceeds ``--max-start-load``
    (another process on the shared 2-core box is exactly what invalidated
    SCALING_r04; its own a2a microbench ran 3x slower than r3's identical
    one).
  * adaptive repeats — each leg is timed until the best two epochs agree
    within 6% (min 3, max 5 timed epochs); the reported time is the mean
    of the best two.
  * internal-consistency checks — loopback cannot be slower than full
    (it runs a strict subset of the work; SCALING_r04's nd=1 row had
    loopback 25.2 vs full 21.0, a physical impossibility) and sharding
    overhead vs 1 device cannot be materially negative.  A violated leg is
    re-run once from scratch; if still violated the artifact is stamped
    ``"valid": false`` with the reasons listed.
  * prior-artifact comparison — per-nd totals are compared against the
    newest committed SCALING_r*.json that itself passes the consistency
    checks; a leg deviating >1.3x slower is re-run once (the faster of the
    two runs is kept — contamination only ever slows) and flagged in
    ``"suspect_legs"`` if it stays slow.

2-D mesh rows (``--mesh2d HxC``, VERDICT r4 item 7): the same
full/loopback methodology on a (hosts x chips) tuple-axis mesh with the
DCN-aware hierarchical layout, plus the *measured* cross-host halo-edge
reduction of the hierarchical packer vs the flat affinity packer at the
same device count (``parallel/layout.edge_locality``).

    python scripts/scaling_bench.py --force-cpu 8 --out SCALING_r05.json

Reference context: the reference is single-GPU (SURVEY §2.1 gap); the
north-star ≥80% efficiency bar (BASELINE.json) is assessed from the
measured comm fraction + measured sharding overhead + measured halo bytes
at assumed ICI bandwidth, with every term except ICI bandwidth measured.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


# ---------------------------------------------------------------------------
# consistency checking — applied to fresh rows AND candidate prior artifacts
# ---------------------------------------------------------------------------
def _totals(r):
    return (r["train_s_full"] + r["refresh_s_full"],
            r["train_s_loopback"] + r["refresh_s_loopback"])


def row_issues(r) -> list:
    """Physical-impossibility check on one decomposition row: loopback runs
    a strict subset of the full program's work, so it cannot be slower
    (SCALING_r04's nd=1 row had loopback 25.2 vs full 21.0)."""
    full, loop = _totals(r)
    if loop > full * 1.08:
        return [f"nd={r['devices']}: loopback ({loop:.1f}s) slower than "
                f"full ({full:.1f}s) — loopback runs a strict subset of "
                f"the work"]
    return []


def cross_row_issues(rows, cores) -> list:
    """Cross-leg impossibilities at known core ceilings.  Total work is
    fixed, so between two legs that both saturate the host (ceiling ==
    cores) the larger mesh can only ADD sharding overhead — its loopback
    time cannot shrink (SCALING_r04: nd=8 loopback 76.8s vs nd=4's 89.7s,
    i.e. the nd=4 capture was inflated).  And no leg can beat the nd=1 leg
    by more than the core ratio."""
    out = []
    by_nd = {r["devices"]: r for r in rows}
    ordered = sorted(by_nd)
    for a, b in zip(ordered, ordered[1:]):
        ca = min(a, cores)
        cb = min(b, cores)
        la, lb = _totals(by_nd[a])[1], _totals(by_nd[b])[1]
        if ca == cb and lb < la * 0.97:
            out.append((a,
                f"nd={a}: loopback ({la:.1f}s) slower than nd={b}'s "
                f"({lb:.1f}s) at the same {ca}-core ceiling — sharding "
                f"overhead cannot decrease with more shards; the nd={a} "
                f"capture is inflated"))
    if 1 in by_nd:
        l1 = _totals(by_nd[1])[1]
        for nd in ordered:
            if nd == 1:
                continue
            ln = _totals(by_nd[nd])[1]
            ratio_max = min(nd, cores) * 1.05
            if ln < l1 / ratio_max:
                out.append((1,
                    f"nd={nd}: loopback ({ln:.1f}s) beats nd=1 "
                    f"({l1:.1f}s) by more than the {min(nd, cores)}x core "
                    f"ratio — the nd=1 capture is inflated"))
    return [m for _, m in out]


def cross_row_flags(rows, cores) -> list:
    """Like cross_row_issues but keeps the implicated (inflated) nd so the
    harness can re-run exactly that leg."""
    msgs = cross_row_issues(rows, cores)
    flags = []
    for m in msgs:
        nd = int(re.search(r"the nd=(\d+) capture is inflated", m).group(1))
        flags.append((nd, m))
    return flags


def artifact_issues(art: dict, cores=None) -> list:
    rows = art.get("decomposition", [])
    out = []
    for r in rows:
        out.extend(row_issues(r))
    if cores is None:
        m = re.search(r"(\d+) physical", art.get("platform", ""))
        cores = int(m.group(1)) if m else (os.cpu_count() or 1)
    out.extend(cross_row_issues(rows, cores))
    if not rows:
        out.append("no decomposition rows")
    return out


def find_prior(explicit: str | None) -> tuple[str, dict] | None:
    """Newest committed SCALING_r*.json that passes the consistency checks
    (SCALING_r04 fails them — exactly why this guard exists)."""
    if explicit == "none":
        return None
    if explicit:
        with open(explicit) as f:
            return explicit, json.load(f)
    cands = sorted(
        glob.glob(os.path.join(REPO, "SCALING_r*.json")),
        key=lambda p: int(re.search(r"_r(\d+)", p).group(1)), reverse=True)
    for p in cands:
        try:
            with open(p) as f:
                art = json.load(f)
        except Exception:
            continue
        iss = artifact_issues(art)
        if art.get("valid", True) and not iss:
            return p, art
        print(f"prior {os.path.basename(p)} rejected: "
              f"{iss or ['valid=false']}", flush=True)
    return None


def _measure_mesh2d(args, build, run_leg, make_row, make_mesh, make_mesh_2d,
                    edge_locality, t1_loop):
    """The 2-D (hosts x chips) leg: full/loopback timing on the tuple-axis
    mesh + the measured cross-host halo-edge term of the hierarchical
    layout vs the flat affinity layout at the same device count."""
    import jax

    if args.mesh2d == "none":
        return None
    h, c = (int(v) for v in args.mesh2d.split("x"))
    if h * c > len(jax.devices()):
        return None

    def derive(row):
        full_t = row["train_s_full"] + row["refresh_s_full"]
        loop_t = row["train_s_loopback"] + row["refresh_s_loopback"]
        row["mesh"] = f"{h}x{c} (hosts x chips, tuple-axis collectives)"
        row["comm_fraction_measured"] = round(
            max(0.0, full_t - loop_t) / full_t, 4)
        if t1_loop:
            row["sharding_overhead_vs_1dev"] = round(
                loop_t / t1_loop - 1.0, 4)
        return full_t

    leg, meta = run_leg(lambda: make_mesh_2d(h, c), f"2d_{h}x{c}")
    row = make_row(h * c, leg)
    full_t = derive(row)
    if row_issues(row):  # one re-run, same discipline as the 1-D legs
        leg2, meta2 = run_leg(lambda: make_mesh_2d(h, c),
                              f"2d_{h}x{c}_rerun")
        row2 = make_row(h * c, leg2)
        if derive(row2) < full_t:
            row, meta = row2, meta2

    # measured cross-"host" halo term: hierarchical layout on the 2-D mesh
    # vs the flat affinity layout at the same device count, both read at
    # the host grouping of the 2-D mesh
    from incagg_gnn_tpu.parallel.layout import build_shard_layout_hierarchical

    tr2 = meta["trainer"]
    adj = tr2.data.adj_t  # permuted CSR the layout indexes
    loc_hier = edge_locality(tr2.layout, adj.rowptr, adj.col,
                             tr2.ptr, chips_per_host=c)
    flat_lay = build_shard_layout_hierarchical(
        tr2.ptr, adj.rowptr, adj.col, h * c, 1)
    loc_flat = edge_locality(flat_lay, adj.rowptr, adj.col,
                             tr2.ptr, chips_per_host=c)
    row["edge_locality_hierarchical"] = {
        k: round(v, 4) for k, v in loc_hier.items()}
    row["edge_locality_flat_same_grouping"] = {
        k: round(v, 4) for k, v in loc_flat.items()}
    row["cross_host_halo_reduction"] = round(
        1.0 - loc_hier["cross_host"]
        / max(loc_flat["cross_host"], 1e-12), 4)
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--force-cpu", type=int, default=0,
                    help="use a virtual CPU mesh with this many devices")
    ap.add_argument("--num-nodes", type=int, default=200_000)
    ap.add_argument("--avg-degree", type=float, default=14.0)
    ap.add_argument("--num-parts", type=int, default=64)
    ap.add_argument("--hidden", type=int, default=256)
    ap.add_argument("--layers", type=int, default=3)
    ap.add_argument("--mode", choices=["gas", "vr"], default="gas",
                    help="gas = halo-heavy batch-parallel (the hard case); "
                         "vr = Reverb (grad psum only)")
    ap.add_argument("--mesh2d", default="2x4",
                    help="'HxC' hosts-x-chips 2-D mesh row (needs H*C "
                         "devices), or 'none'")
    ap.add_argument("--ici-gbps", type=float, default=45.0)
    ap.add_argument("--prior", default=None,
                    help="prior artifact to guard against (default: newest "
                         "consistent SCALING_r*.json; 'none' disables)")
    ap.add_argument("--max-start-load", type=float, default=0.8,
                    help="refuse to run when load1 exceeds this at start")
    ap.add_argument("--min-reps", type=int, default=3)
    ap.add_argument("--max-reps", type=int, default=5)
    ap.add_argument("--agree-tol", type=float, default=0.06)
    ap.add_argument("--update-mesh2d", default=None, metavar="ARTIFACT",
                    help="re-measure ONLY the 2-D mesh leg (same "
                         "methodology; nd=1 baseline read from the "
                         "artifact) and update that artifact in place")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    # ---- host-load sniff (guard #1) -------------------------------------
    load_start = os.getloadavg()
    if load_start[0] > args.max_start_load:
        print(json.dumps({
            "error": "host busy at start — refusing to measure",
            "loadavg": load_start,
            "max_start_load": args.max_start_load}))
        sys.exit(3)

    if args.force_cpu:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.force_cpu}"
        ).strip()
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import numpy as np

    from incagg_gnn_tpu.graph.datasets import make_sbm
    from incagg_gnn_tpu.models import GCN, GCNConfig
    from incagg_gnn_tpu.parallel import spatial as spatial_mod
    from incagg_gnn_tpu.parallel.layout import edge_locality
    from incagg_gnn_tpu.parallel.mesh import make_mesh, make_mesh_2d
    from incagg_gnn_tpu.parallel.spatial import ShardedVRTrainer
    from incagg_gnn_tpu.train.trainer import TrainerConfig

    data, in_c, out_c = make_sbm(
        num_nodes=args.num_nodes, num_classes=16, num_features=64,
        avg_degree=args.avg_degree, seed=0,
    )

    # one partition per (parts, seed, method) — identical across every
    # build; recomputing it 10x is pure wall-clock waste
    _part_cache = {}
    _orig_partition = spatial_mod.partition_graph

    def _cached_partition(adj_t, num_parts, seed=0, **kw):
        key = (num_parts, seed, tuple(sorted(kw.items())))
        if key not in _part_cache:
            _part_cache[key] = _orig_partition(adj_t, num_parts, seed=seed,
                                               **kw)
        return _part_cache[key]

    spatial_mod.partition_graph = _cached_partition

    def build(mesh, wire):
        cfg = GCNConfig(
            num_nodes=data.num_nodes, in_channels=in_c,
            hidden_channels=args.hidden, out_channels=out_c,
            num_layers=args.layers, dropout=0.1, drop_input=False,
        )
        tcfg = TrainerConfig(num_parts=args.num_parts, batch_size=1,
                             vr_update=(args.mode == "vr"), seed=0,
                             epochs=1, halo_wire=wire)
        return ShardedVRTrainer(GCN(cfg), data, tcfg, mesh=mesh)

    def adaptive_time(fn) -> tuple[float, list]:
        """Repeat until the best two agree within tol (guard #2)."""
        times = []
        while True:
            t0 = time.perf_counter()
            fn()
            times.append(time.perf_counter() - t0)
            if len(times) >= args.min_reps:
                b = sorted(times)[:2]
                if (b[1] - b[0]) / max(b[0], 1e-9) <= args.agree_tol:
                    break
            if len(times) >= args.max_reps:
                break
        b = sorted(times)[:2]
        return (b[0] + b[1]) / 2, [round(t, 3) for t in times]

    def time_leg(mesh, wire):
        tr = build(mesh, wire)
        tr.refresh(host_logits=False)
        tr.train_epoch()  # compile + warm
        train_s, train_all = adaptive_time(tr.train_epoch)

        def one_refresh():
            tr.refresh(host_logits=False)
            jax.block_until_ready(tr.out_tab)

        one_refresh()  # warm every refresh fn
        refresh_s, refresh_all = adaptive_time(one_refresh)
        edges = int(np.asarray(data.adj_t.col).size)
        halo_plans = getattr(tr, "_halo_plans", None)
        meta = {"layout": tr.layout, "halo_plans": halo_plans,
                "mesh": tr.mesh, "axis": tr.axis, "trainer": tr}
        return {"train_s": train_s, "train_all": train_all,
                "refresh_s": refresh_s, "refresh_all": refresh_all,
                "edges": edges}, meta

    def run_leg(mesh_fn, label):
        loads = os.getloadavg()
        full, meta = time_leg(mesh_fn(), "dense")
        loop, _ = time_leg(mesh_fn(), "loopback")
        return {"full": full, "loop": loop, "loadavg_at_leg": list(loads),
                "label": label}, meta

    prior = find_prior(args.prior)
    prior_rows = {}
    if prior is not None:
        prior_rows = {r["devices"]: r for r in prior[1]["decomposition"]}
        print(f"prior guard: {os.path.basename(prior[0])}", flush=True)

    results = {"harness": "scripts/scaling_bench.py",
               "platform": f"virtual CPU mesh, {os.cpu_count()} physical "
                           f"cores shared by all devices",
               "loadavg_at_start": list(load_start),
               "prior_artifact": prior[0] if prior else None,
               "graph": {"num_nodes": args.num_nodes,
                         "avg_degree": args.avg_degree,
                         "num_parts": args.num_parts, "mode": args.mode,
                         "model": f"GCN {args.layers}x{args.hidden}"},
               "decomposition": [], "suspect_legs": [],
               "consistency_issues": []}

    def make_row(nd, leg):
        full = leg["full"]
        loop = leg["loop"]
        return {
            "devices": nd,
            "train_s_full": round(full["train_s"], 3),
            "train_s_loopback": round(loop["train_s"], 3),
            "refresh_s_full": round(full["refresh_s"], 3),
            "refresh_s_loopback": round(loop["refresh_s"], 3),
            "train_s_all_reps": full["train_all"],
            "edges_per_s_full": round(
                full["edges"] / max(full["train_s"], 1e-9)),
            "loadavg_at_leg": leg["loadavg_at_leg"],
        }

    cores = os.cpu_count() or 1

    def measure_leg(nd):
        """One 1-D leg with the per-leg guards: loopback<=full and the
        prior comparison (contamination only ever slows; keep the faster
        of at most two runs)."""
        leg, meta = run_leg(lambda: make_mesh(nd), f"1d_nd{nd}")
        row = make_row(nd, leg)
        pr = prior_rows.get(nd)
        needs_rerun = bool(row_issues(row))
        if pr is not None and _totals(row)[0] > 1.3 * _totals(pr)[0]:
            needs_rerun = True
        if needs_rerun:
            print(f"nd={nd}: per-leg guard tripped — re-running", flush=True)
            leg2, meta2 = run_leg(lambda: make_mesh(nd), f"1d_nd{nd}_rerun")
            row2 = make_row(nd, leg2)
            if _totals(row2)[0] < _totals(row)[0]:
                row, meta = row2, meta2
            if pr is not None and _totals(row)[0] > 1.3 * _totals(pr)[0]:
                results["suspect_legs"].append(
                    {"devices": nd, "total_s": round(_totals(row)[0], 1),
                     "prior_total_s": round(_totals(pr)[0], 1)})
        print(json.dumps(row), flush=True)
        return row, meta

    if args.update_mesh2d:
        # surgical re-measure of the 2-D leg only (e.g. after a layout
        # change): identical methodology, nd=1 loopback baseline and the
        # decomposition taken from the existing artifact
        with open(args.update_mesh2d) as f:
            art = json.load(f)
        r1 = next(r for r in art["decomposition"] if r["devices"] == 1)
        t1_loop = r1["train_s_loopback"] + r1["refresh_s_loopback"]
        row = _measure_mesh2d(args, build, run_leg, make_row, make_mesh,
                              make_mesh_2d, edge_locality, t1_loop)
        if row is not None:
            art["mesh2d"] = row
            art["mesh2d_note"] = "re-measured after layout change"
            art["consistency_issues"] = [
                i for i in art.get("consistency_issues", [])
                if "mesh2d" not in i] + [f"mesh2d: {m}"
                                         for m in row_issues(row)]
            art["valid"] = (not art["consistency_issues"]
                            and not art.get("suspect_legs"))
            with open(args.update_mesh2d, "w") as f:
                json.dump(art, f, indent=1)
            print(json.dumps(row))
            print("updated", args.update_mesh2d)
        return art

    raw = {}
    metas = {}
    for nd in args.devices:
        if nd > len(jax.devices()):
            print(f"skip {nd} devices (have {len(jax.devices())})")
            continue
        raw[nd], metas[nd] = measure_leg(nd)

    # ---- cross-leg repair pass (guard #3) --------------------------------
    # a cross-row impossibility names the INFLATED leg; re-run exactly
    # that leg once (keep the faster capture), then re-check
    flags = cross_row_flags(list(raw.values()), cores)
    for nd in sorted({f[0] for f in flags}):
        print(f"cross-leg guard: nd={nd} capture implicated — re-running",
              flush=True)
        row2, meta2 = measure_leg(nd)
        if _totals(row2)[0] < _totals(raw[nd])[0]:
            raw[nd], metas[nd] = row2, meta2
    for r in raw.values():
        results["consistency_issues"].extend(row_issues(r))
    results["consistency_issues"].extend(
        cross_row_issues(list(raw.values()), cores))

    # ---- derived fields + corrected communication fraction ---------------
    # The loopback control skips BOTH the wire and the send-buffer
    # materialization (XLA fuses recv=send into the assembly gather), so
    # the raw full-vs-loopback delta includes staging work both paths pay
    # on real hardware.  The nd=1 row HAS no communication — its delta IS
    # the staging-materialization term; subtracting it isolates the
    # collective itself.
    t1_full = t1_loop = None
    last_meta = None
    for nd in sorted(raw):
        row = raw[nd]
        full_t, loop_t = _totals(row)
        if t1_full is None:
            t1_full, t1_loop = full_t, loop_t
        row["comm_fraction_measured"] = round(
            max(0.0, full_t - loop_t) / full_t, 4)
        row["sharding_overhead_vs_1dev"] = round(loop_t / t1_loop - 1.0, 4)
        row["raw_strong_efficiency"] = round(t1_full / (full_t * nd), 4)
        row["host_core_ceiling"] = min(nd, cores)
        results["decomposition"].append(row)
        last_meta = (nd, metas[nd])

    rows = results["decomposition"]
    if rows and rows[0]["devices"] == 1:
        base_delta = rows[0]["comm_fraction_measured"]
        for r in rows:
            r["collective_fraction_corrected"] = round(
                max(0.0, r["comm_fraction_measured"] - base_delta), 4)
        nd_last = rows[-1]
        results["projected_hw_efficiency_at_max_devices"] = round(
            1.0 / (1.0 + max(0.0, nd_last["sharding_overhead_vs_1dev"])
                   + nd_last["collective_fraction_corrected"]), 3)

    # ---- 2-D (hosts x chips) mesh row (VERDICT r4 item 7) ----------------
    row = _measure_mesh2d(args, build, run_leg, make_row, make_mesh,
                          make_mesh_2d, edge_locality, t1_loop)
    if row is not None:
        results["consistency_issues"].extend(
            f"mesh2d: {m}" for m in row_issues(row))
        results["mesh2d"] = row
        print(json.dumps(row), flush=True)

    # ---- isolated all_to_all microbench at the real HaloPlan shapes ------
    nd = max(d for d in args.devices if d <= len(jax.devices()))
    tr = (last_meta[1]["trainer"] if last_meta and last_meta[0] == nd
          else build(make_mesh(nd), "dense"))
    from jax.sharding import NamedSharding, PartitionSpec as P
    from jax import shard_map
    import jax.numpy as jnp

    plan = tr._halo_plans[0]
    h_w = int(np.asarray(plan.send_idx).shape[2])
    d_feat = args.hidden
    payload_rows = sum(
        int(np.asarray(p.send_sizes).sum()) for p in tr._halo_plans)
    wire_rows_dense = nd * (nd - 1) * h_w * len(tr._halo_plans)

    def a2a(x):
        return jax.lax.all_to_all(
            x.reshape(nd, h_w, d_feat), tr.axis, split_axis=0, concat_axis=0)

    sm = jax.jit(shard_map(
        lambda x: a2a(jax.tree.map(lambda a: a[0], x)[: nd * h_w]),
        mesh=tr.mesh, in_specs=P(tr.axis), out_specs=P(tr.axis)))
    buf = jax.device_put(
        jnp.ones((nd, nd * h_w, d_feat), jnp.float32),
        NamedSharding(tr.mesh, P(tr.axis)))
    jax.block_until_ready(sm(buf))

    def time_a2a():
        jax.block_until_ready(sm(buf))

    a2a_s, a2a_all = adaptive_time(time_a2a)
    bytes_dense = nd * nd * h_w * d_feat * 4
    gbps = bytes_dense / a2a_s / 1e9
    prior_a2a = prior[1].get("all_to_all_microbench") if prior else None
    if prior_a2a and gbps < 0.7 * prior_a2a.get("host_gbps", 0):
        print(f"a2a guard tripped ({gbps:.2f} vs prior "
              f"{prior_a2a['host_gbps']} GB/s) — re-running", flush=True)
        a2a_s2, _ = adaptive_time(time_a2a)
        if a2a_s2 < a2a_s:
            a2a_s = a2a_s2
            gbps = bytes_dense / a2a_s / 1e9
        if gbps < 0.7 * prior_a2a.get("host_gbps", 0):
            results["consistency_issues"].append(
                f"a2a microbench {gbps:.2f} GB/s < 0.7x prior "
                f"{prior_a2a['host_gbps']} GB/s for the identical op — "
                f"host contention suspected")
    results["all_to_all_microbench"] = {
        "devices": nd, "halo_width_h": h_w,
        "buffer_bytes_total": bytes_dense,
        "ms": round(a2a_s * 1e3, 3),
        "host_gbps": round(gbps, 2),
        "reps_s": a2a_all,
        "note": "virtual-mesh all_to_all is a host memcpy; the byte count "
                "is the hardware-independent quantity",
    }
    results["halo_bytes"] = {
        "payload_rows_per_sweep": payload_rows,
        "wire_rows_dense": wire_rows_dense,
        "wire_rows_ragged": payload_rows,
        "payload_mb_per_sweep_bf16": round(payload_rows * d_feat * 2 / 1e6, 2),
        "ici_ms_per_sweep_at_assumed_bw": round(
            payload_rows * d_feat * 2 / nd / (args.ici_gbps * 1e9) * 1e3, 3),
    }
    results["loadavg_at_end"] = list(os.getloadavg())
    results["valid"] = (not results["consistency_issues"]
                        and not results["suspect_legs"])
    print(json.dumps({k: results[k] for k in
                      ("all_to_all_microbench", "halo_bytes", "valid",
                       "consistency_issues", "suspect_legs")}, indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
        print("wrote", args.out)
    return results


if __name__ == "__main__":
    main()
