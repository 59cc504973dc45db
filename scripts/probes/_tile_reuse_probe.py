"""Offline analyzer: how much dense-tile x-block DMA the Pallas pipeline
could skip via index-equality between consecutive grid steps (VERDICT r4
item 3 — the dense tile runs 140 ns vs its 117 ns DMA roofline; x tiles
are 2/3 of the bytes).

Mosaic's BlockSpec pipeline skips an input DMA when a block's index_map
output equals the previous grid step's (standard revisit elision — the
out_spec already exploits this for the row-tile accumulator).  Today the
x-tile lane assignment is whatever column order the tile build emits, so
consecutive steps almost never line up.  Two candidate layouts:

  baseline   — shipped layout (col-sorted runs, fillers bcol=0)
  fillprev   — fillers copy the previous step's same-lane bcol
               (zero-tile matmul, but the 64 KB x fetch is elided)
  laneaffine — within each row-block, place col c in lane hash-slot
               argmin over free lanes of |lane - last_lane_of[c]|;
               popular hub columns stick to one lane across row-blocks

Prints, per layout: the fraction of (step, lane) x fetches elided and the
projected ns/tile assuming 117 ns full-DMA cost split A:x = 1:2 at D=256
bf16.  Pure numpy — decides whether the kernel-side change is worth
building before touching the chip.

    python scripts/probes/_tile_reuse_probe.py [reddit|products]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

import numpy as np

SHAPES = {
    "reddit": dict(n=233_000, deg=100.0, parts=200, classes=41),
    "products": dict(n=100_000, deg=50.0, parts=80, classes=16),
}
B = 128


def tile_list(shape: str):
    from incagg_gnn_tpu.graph.csr import gcn_norm, permute
    from incagg_gnn_tpu.graph.datasets import make_sbm
    from incagg_gnn_tpu.graph.partition import partition_graph
    from incagg_gnn_tpu.ops.block import LANES, plan_block_tier

    cfg = SHAPES[shape]
    data, _, _ = make_sbm(num_nodes=cfg["n"], num_classes=cfg["classes"],
                          num_features=8, avg_degree=cfg["deg"], seed=0)
    perm, ptr = partition_graph(data.adj_t, cfg["parts"])
    data = permute(data, perm)
    adj = gcn_norm(data.adj_t.set_diag())
    n_pad = ((cfg["n"] + 128) // 128) * 128
    th = plan_block_tier(adj.rowptr, adj.col, n_pad, x_itemsize=2,
                         a_itemsize=2)
    deg = np.diff(adj.rowptr)
    row = np.repeat(np.arange(cfg["n"], dtype=np.int64), deg)
    ncb = n_pad // B
    key = (row // B) * ncb + adj.col.astype(np.int64) // B
    uniq, counts = np.unique(key, return_counts=True)
    dense = uniq[counts >= th]
    drb = (dense // ncb).astype(np.int64)
    dcb = (dense % ncb).astype(np.int32)
    return drb, dcb, n_pad // B, LANES


def pack(drb, dcb, nrb, lanes, mode):
    """Returns bcols [lanes, steps] (with -1 fillers resolved per mode) and
    brow_step."""
    runs = np.bincount(drb, minlength=nrb)
    runs_pad = ((np.maximum(runs, 1) + lanes - 1) // lanes) * lanes
    steps = runs_pad // lanes
    total_steps = int(steps.sum())
    bcols = np.full((lanes, total_steps), -1, dtype=np.int64)
    brow_step = np.repeat(np.arange(nrb), steps)
    starts = np.concatenate([[0], np.cumsum(steps)])[:-1]
    order = np.argsort(drb, kind="stable")
    drb_s, dcb_s = drb[order], dcb[order]
    ptr = np.concatenate([[0], np.cumsum(runs)])
    if mode in ("baseline", "fillprev"):
        # shipped flat layout: tile t of a run -> lane t % lanes,
        # step s0 + t // lanes (bcol_flat.reshape(s, LANES).T)
        for rb in range(nrb):
            cols = np.sort(dcb_s[ptr[rb]:ptr[rb + 1]])
            s0 = starts[rb]
            for t, c in enumerate(cols):
                bcols[t % lanes, s0 + t // lanes] = c
    elif mode == "laneaffine":
        last_lane = {}
        for rb in range(nrb):
            cols = np.sort(dcb_s[ptr[rb]:ptr[rb + 1]])
            s0, ns = starts[rb], steps[rb]
            # slots: ns per lane
            free = {l: list(range(s0, s0 + ns)) for l in range(lanes)}
            # assign sticky columns first
            sticky = [c for c in cols if c in last_lane]
            rest = [c for c in cols if c not in last_lane]
            for c in sticky + rest:
                pref = last_lane.get(c, c % lanes)
                cand = sorted(range(lanes),
                              key=lambda l: (abs(l - pref), l))
                for l in cand:
                    if free[l]:
                        bcols[l, free[l].pop(0)] = c
                        last_lane[c] = l
                        break
    else:
        raise ValueError(mode)
    if mode == "fillprev" or mode == "laneaffine":
        # fillers inherit previous same-lane bcol -> DMA elided
        for l in range(lanes):
            col = bcols[l]
            for i in range(total_steps):
                if col[i] < 0:
                    col[i] = col[i - 1] if i else 0
    else:
        bcols[bcols < 0] = 0
    return bcols, brow_step


def analyze(shape: str):
    drb, dcb, nrb, lanes = tile_list(shape)
    print(f"{shape}: {drb.size} dense tiles, {nrb} row-blocks, "
          f"lanes={lanes}")
    for mode in ("baseline", "fillprev", "laneaffine"):
        bcols, _ = pack(drb, dcb, nrb, lanes, mode)
        total = bcols.size
        elided = int((bcols[:, 1:] == bcols[:, :-1]).sum())
        frac = elided / total
        # DMA roofline split at D=256 bf16: A 32 KB + x 64 KB = 96 KB ->
        # 117 ns; elided x fetches remove 64/96 of a tile's bytes
        ns = 117.0 * (1.0 - frac * 64.0 / 96.0)
        print(f"  {mode:10s}: x-fetch elided {frac*100:5.1f}%  "
              f"-> DMA floor {ns:6.1f} ns/tile (vs 117)")


if __name__ == "__main__":
    for s in sys.argv[1:] or ["reddit"]:
        analyze(s)
