"""Dataset registry (reference: torch_geometric_autoscale/data.py:118-145).

The reference downloads PyG/OGB datasets at runtime.  This environment has no
network egress, so the registry supports two sources:

1. **On-disk archives** in ``{root}/{name}/`` as ``.npz`` files holding
   ``rowptr, col, x, y, train_mask, val_mask, test_mask`` (the standard
   preprocessed format produced by ``scripts/convert_dataset.py`` from OGB /
   GraphSAINT raw files).  Covers arxiv / products / reddit / flickr / yelp /
   ppi / amazonproducts when the data is present.
2. **Synthetic generators** — a stochastic block model whose community
   structure gives METIS-style partitioners real locality and makes GNN
   accuracy meaningfully exceed an MLP baseline, used for tests and
   benchmarks (names ``sbm-small``, ``sbm-arxiv``, ``sbm-products`` or
   parameterized via :func:`make_sbm`).

All loaders return ``(GraphData, in_channels, out_channels)`` like the
reference's ``get_data``.  Adjacencies are symmetrized, matching the
reference's use of undirected ``adj_t`` (data.py:55-116 apply
``ToSparseTensor`` on undirected graphs).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Tuple

import numpy as np

from incagg_gnn_tpu.graph.csr import CSRGraph, GraphData
from incagg_gnn_tpu.utils.metrics import index2mask


def make_sbm(
    num_nodes: int = 2000,
    num_classes: int = 8,
    num_features: int = 32,
    avg_degree: float = 10.0,
    p_in: float = 0.85,
    feature_noise: float = 1.0,
    train_frac: float = 0.3,
    val_frac: float = 0.2,
    seed: int = 0,
    multilabel: bool = False,
    centers_seed: int | None = None,
    label_noise: float = 0.0,
    degree_skew: float = 0.0,
) -> Tuple[GraphData, int, int]:
    """Stochastic-block-model graph with class-correlated features.

    Edges are sampled so a fraction ``p_in`` stays within the node's community
    (community == label), giving both homophily (GNNs beat MLPs) and locality
    (partitioners find low cuts).  The graph is symmetrized.

    ``degree_skew`` > 0 switches to a degree-corrected SBM: per-node Pareto
    weights with shape ``1/degree_skew`` bias BOTH endpoints of every edge,
    producing the power-law degree profile + hub nodes of real web-scale
    graphs (ogbn-products' clustering is power-law, not uniform).  Hubs'
    neighborhoods span many partitions, so out-of-batch pulls become common
    and cache staleness actually bites — the adversarial regime the
    staleness-robustness suite needs (uniform SBMs make OB pulls rare by
    construction; VERDICT r3 weak #4).

    ``label_noise`` flips that fraction of OBSERVED labels (train, val and
    test alike) to a uniformly random class AFTER the graph/features were
    generated from the true communities — an accuracy ceiling of about
    ``1 - label_noise * (C-1)/C`` that no model can exceed, mirroring the
    label-ambiguity ceiling of real benchmarks (ogbn-products tops out at
    75-84% for every architecture).  Used by the hard presets to keep
    strong models in a non-saturated band: homophily (p_in) alone cannot —
    identity-propagation models (GCNII) have a sharp phase transition
    around p_in ~0.35-0.4 at degree 50 while GCN stays saturated at any
    p_in above it (docs/RESULTS.md r3 calibration)."""
    rng = np.random.default_rng(seed)
    y = rng.integers(0, num_classes, size=num_nodes).astype(np.int32)

    num_edges = int(num_nodes * avg_degree / 2)
    order = np.argsort(y, kind="stable")
    class_ptr = np.zeros(num_classes + 1, dtype=np.int64)
    class_ptr[1:] = np.cumsum(np.bincount(y, minlength=num_classes))
    intra = rng.random(num_edges) < p_in
    if degree_skew > 0.0:
        # degree-corrected: Pareto node weights bias both edge endpoints.
        # Inverse-CDF sampling over weight cumsums (global for src/inter
        # targets, per-class segments for intra targets) keeps this fully
        # vectorized at products scale.
        w = (1.0 - rng.random(num_nodes)) ** (-degree_skew)
        np.minimum(w, float(num_nodes) ** 0.5, out=w)  # cap extreme hubs
        w_sorted = w[order]
        cum_g = np.cumsum(w)
        src = np.searchsorted(cum_g, rng.random(num_edges) * cum_g[-1])
        src = np.minimum(src, num_nodes - 1).astype(np.int64)
        cum_c = np.cumsum(w_sorted)
        lo = class_ptr[y[src]]
        hi = class_ptr[y[src] + 1]
        base = np.where(lo > 0, cum_c[np.maximum(lo - 1, 0)], 0.0)
        span = cum_c[np.maximum(hi - 1, 0)] - base
        u = base + rng.random(num_edges) * np.maximum(span, 1e-12)
        dst_intra = order[np.minimum(np.searchsorted(cum_c, u), num_nodes - 1)]
        dst_inter = order[np.minimum(
            np.searchsorted(cum_c, rng.random(num_edges) * cum_c[-1]),
            num_nodes - 1)]
    else:
        src = rng.integers(0, num_nodes, size=num_edges)
        # same-community targets: pick random members of src's community
        cs = y[src]
        rand_in_class = class_ptr[cs] + rng.integers(0, np.maximum(class_ptr[cs + 1] - class_ptr[cs], 1))
        dst_intra = order[np.minimum(rand_in_class, num_nodes - 1)]
        dst_inter = rng.integers(0, num_nodes, size=num_edges)
    dst = np.where(intra, dst_intra, dst_inter)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    row = np.concatenate([src, dst])
    col = np.concatenate([dst, src])
    adj = CSRGraph.from_coo(row, col, num_nodes)

    # centers_seed pins the class geometry independently of the node/edge
    # draw, so several graphs (inductive splits) share one label distribution
    centers_rng = rng if centers_seed is None else np.random.default_rng(centers_seed)
    centers = centers_rng.normal(size=(num_classes, num_features)).astype(np.float32)
    x = centers[y] + feature_noise * rng.normal(size=(num_nodes, num_features)).astype(np.float32)

    perm = rng.permutation(num_nodes)
    n_train = int(train_frac * num_nodes)
    n_val = int(val_frac * num_nodes)
    train_mask = index2mask(perm[:n_train], num_nodes)
    val_mask = index2mask(perm[n_train : n_train + n_val], num_nodes)
    test_mask = index2mask(perm[n_train + n_val :], num_nodes)

    if label_noise > 0.0:
        flip = rng.random(num_nodes) < label_noise
        y = np.where(flip, rng.integers(0, num_classes, size=num_nodes),
                     y).astype(np.int32)

    if multilabel:
        y_ml = np.zeros((num_nodes, num_classes), dtype=np.float32)
        y_ml[np.arange(num_nodes), y] = 1.0
        extra = rng.integers(0, num_classes, size=num_nodes)
        y_ml[np.arange(num_nodes), extra] = 1.0
        y_out: np.ndarray = y_ml
    else:
        y_out = y

    data = GraphData(
        adj_t=adj, x=x, y=y_out,
        train_mask=train_mask, val_mask=val_mask, test_mask=test_mask,
    )
    return data, num_features, num_classes


_SBM_PRESETS = {
    # name: (num_nodes, num_classes, num_features, avg_degree)
    "sbm-tiny": (400, 4, 16, 8.0),
    "sbm-small": (2_000, 8, 32, 10.0),
    "sbm-medium": (20_000, 16, 64, 12.0),
    "sbm-arxiv": (169_343, 40, 128, 13.7),  # ogbn-arxiv scale
    "sbm-products": (2_449_029, 47, 100, 50.0),  # ogbn-products scale
    # products degree/width at a scale the remote-tunnel chip can stage in
    # minutes (full products refresh sweeps are tunnel-bandwidth-bound,
    # docs/RESULTS.md) — the operating point for block-tier training runs
    "sbm-products-mid": (500_000, 47, 100, 50.0),
    "sbm-reddit": (232_965, 41, 602, 100.0),  # reddit scale
    # reddit degree/width at a size whose dense-tile working set fits a
    # single 16 GB chip end-to-end (communities ~2.4K wide at deg 100 give
    # the high local block density the MXU tier needs)
    "sbm-reddit-mid": (100_000, 41, 602, 100.0),
}

# "Hard" presets: full make_sbm kwargs calibrated so test accuracy lands in
# the 0.6-0.8 band with GNN >> MLP — the non-saturated accuracy benchmark
# (a VR-staleness or hyperparameter regression moves the number, unlike the
# easy presets above whose accuracy saturates at ~1.0).  Calibrated on CPU,
# 3-layer GCN, 25 epochs (docs/RESULTS.md "Hard-SBM accuracy suite"):
# sbm-arxiv-hard -> GAS 0.74 / VR 0.74 / MLP 0.21.
_SBM_HARD_PRESETS = {
    "sbm-arxiv-hard": dict(
        num_nodes=20_000, num_classes=16, num_features=64, avg_degree=12.0,
        p_in=0.4, feature_noise=6.0, train_frac=0.05,
    ),
    # products degree (50): the r2 point (p_in 0.2, GCN-calibrated to
    # 0.666) sat BELOW the working regime of strong-smoothing models —
    # under the suite's generic hparams GCNII scores 0.36 and APPNP 0.18
    # even at p_in 0.4, because effective edge homophily there is ~0.44
    # while real ogbn-products sits near ~0.8 (the regime APPNP/GCNII are
    # built for).  v3 (r4 calibration sweep, docs/RESULTS.md): homophily
    # matching the real benchmark (p_in 0.8) with saturation prevented by
    # the label-noise ceiling (~0.77 for 0.25 noise at C=16) + 5% label
    # rate + heavy feature noise — mirroring how real ogbn-products keeps
    # every architecture at 75-84%.  Measured (seed 0, 20 epochs, GAS):
    # GCN 0.764, GCNII 0.764, APPNP 0.741 — the whole family in the
    # 0.6-0.8 band under ONE generic hparam set.
    "sbm-products-hard": dict(
        num_nodes=50_000, num_classes=16, num_features=64, avg_degree=50.0,
        p_in=0.8, feature_noise=8.0, train_frac=0.05, label_noise=0.25,
    ),
    # v4 DISCRIMINATIVE products proxy (VERDICT r4 #4): v3's 0.25-label-noise
    # ceiling pinned every architecture at 0.766 to 3 decimals — zero power
    # to see a model-specific regression.  v4 opens a gap below a higher
    # ceiling (label_noise 0.15 -> 0.852) by hardening the feature geometry
    # (64 near-overlapping classes, 16 features): GCN pins the ceiling
    # (0.853) while GCNII trains ~1 pt BELOW it (0.843) — a separated,
    # regression-sensitive value.  The r5 calibration sweep
    # (scripts/probes/_prodhard_sweep.py, docs/RESULTS.md) shows the
    # REAL-products ordering (GCNII > GCN) is not expressible in this
    # generator family: identity-propagation models are strictly the
    # fragile ones here (collapse under feature noise >= 20, power-law
    # hubs, or p_in near their 0.35-0.4 phase transition), and
    # BatchNorm rescues even 8-layer GCN from oversmoothing (equal-depth
    # probe: GCN-8L 0.839 ~= GCNII-8L 0.838).  What the suite pins instead:
    # per-model values separated by >> seed noise, GAS<->Reverb parity.
    "sbm-products-hard-v4": dict(
        num_nodes=50_000, num_classes=64, num_features=16, avg_degree=50.0,
        p_in=0.8, feature_noise=8.0, train_frac=0.05, label_noise=0.15,
    ),
    # Adversarial staleness preset (VERDICT r3 weak #4): power-law hubs +
    # lower homophily make out-of-batch pulls COMMON (uniform SBMs keep
    # them rare by construction), so frozen/stale caches must visibly cost
    # accuracy and the refresh knobs (refresh_frac / max_steps /
    # refresh_drift_threshold) must recover it — the regime the
    # reference's VR correction exists for.
    # Calibrated (r4): GCN 0.89 / MLP 0.13 fresh; 80% cross-partition
    # edges (vs 33% on products-hard); deg median 13 / p99 278 / max 1329.
    "sbm-powerlaw-hard": dict(
        num_nodes=50_000, num_classes=16, num_features=64, avg_degree=30.0,
        p_in=0.55, feature_noise=10.0, train_frac=0.05, degree_skew=0.8,
    ),
}


# datasets whose val/test live on *separate graphs* (reference: get_ppi with
# split= returns disjoint graph sets, data.py:100-107; main.py:167-175,244-249
# evaluates them with a full-graph forward)
INDUCTIVE_DATASETS = frozenset({"ppi", "sbm-ppi"})


def make_sbm_inductive(
    split: str = "train",
    num_nodes: int = 2000,
    num_classes: int = 8,
    num_features: int = 32,
    seed: int = 0,
    **kwargs,
) -> Tuple[GraphData, int, int]:
    """Synthetic inductive (PPI-style) dataset: three disjoint multilabel SBM
    graphs drawn from one shared class geometry (``centers_seed``), so a model
    trained on the train graph generalizes to the val/test graphs — the same
    shape as the reference's PPI protocol (data.py:100-107).  The split's own
    mask is all-True (reference sets ``data[f'{split}_mask'] = ones``)."""
    sizes = {"train": num_nodes, "val": max(num_nodes // 4, 50),
             "test": max(num_nodes // 4, 50)}
    if split not in sizes:
        raise ValueError(f"split must be train/val/test, got {split!r}")
    offset = {"train": 0, "val": 1, "test": 2}[split]
    data, in_c, out_c = make_sbm(
        num_nodes=sizes[split], num_classes=num_classes,
        num_features=num_features, seed=seed * 3 + 1 + offset,
        centers_seed=seed, multilabel=True, **kwargs,
    )
    n = data.num_nodes
    masks = {s: np.full(n, s == split, dtype=bool) for s in sizes}
    data = dataclasses.replace(
        data, train_mask=masks["train"], val_mask=masks["val"],
        test_mask=masks["test"],
    )
    return data, in_c, out_c


def load_npz_dataset(root: str, name: str,
                     split: str | None = None) -> Tuple[GraphData, int, int]:
    """Load a preprocessed ``.npz`` dataset from ``{root}/{name}/data.npz``
    (or ``data_{split}.npz`` for inductive per-split archives as written by
    ``scripts/convert_dataset.py --format ppi``)."""
    fname = f"data_{split}.npz" if split else "data.npz"
    path = os.path.join(root, name, fname)
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"Dataset archive not found: {path}. Real datasets must be "
            f"preprocessed to npz (rowptr,col,[value],x,y,train_mask,val_mask,"
            f"test_mask); no network egress is available to download them."
        )
    z = np.load(path)
    adj = CSRGraph(z["rowptr"], z["col"], z["value"] if "value" in z else None)
    y = z["y"]
    data = GraphData(
        adj_t=adj,
        x=z["x"].astype(np.float32),
        y=y.astype(np.int32) if y.ndim == 1 else y.astype(np.float32),
        train_mask=z["train_mask"].astype(bool),
        val_mask=z["val_mask"].astype(bool),
        test_mask=z["test_mask"].astype(bool),
    )
    in_c = data.num_features
    out_c = data.num_classes
    return data, in_c, out_c


def get_data(root: str, name: str, split: str = "train",
             **kwargs) -> Tuple[GraphData, int, int]:
    """Dataset dispatch, mirroring the reference's ``get_data``
    (data.py:118-145): arxiv/products/reddit/flickr/yelp/ppi/amazonproducts
    resolve to on-disk archives; ``sbm-*`` names resolve to synthetic
    generators (deterministic per seed).  For inductive datasets
    (``INDUCTIVE_DATASETS``) ``split`` selects which of the disjoint
    train/val/test graphs to load (reference ``get_ppi(root, split)``,
    data.py:100-107); other datasets ignore it."""
    name = name.lower()
    if name == "sbm-ppi":
        return make_sbm_inductive(split=split, **kwargs)
    if name in _SBM_PRESETS:
        n, c, f, d = _SBM_PRESETS[name]
        return make_sbm(num_nodes=n, num_classes=c, num_features=f, avg_degree=d, **kwargs)
    if name in _SBM_HARD_PRESETS:
        return make_sbm(**{**_SBM_HARD_PRESETS[name], **kwargs})
    if name == "sbm":
        return make_sbm(**kwargs)
    return load_npz_dataset(root, name,
                            split=split if name in INDUCTIVE_DATASETS else None)
