"""Non-saturated accuracy regression bands (VERDICT r1 item 2).

The easy SBM presets saturate at ~1.0 test accuracy, which proves the
pipeline runs but cannot detect a hyperparameter- or VR-staleness-level
regression.  ``sbm-arxiv-hard`` (graph/datasets.py::_SBM_HARD_PRESETS) is
calibrated so a 3-layer GCN lands in the 0.6-0.8 band with GAS/VR far above
MLP — mirroring the role of the reference's real-dataset results table
(/root/reference/README.md:53-75) in an environment with no dataset files.

Staleness findings (measured, docs/RESULTS.md): freezing the caches at
their initial fill (hist_momentum -> ~0) costs under ONE point in either
mode — partition locality keeps out-of-batch pulls rare and the eval sweep
always recomputes logits fresh, i.e. the VR design is staleness-robust *by
construction*.  So the suite pins BOTH directions: (a) frozen caches must
stay within the band and near fresh accuracy (a VR-correction regression
that amplifies staleness fails it), and (b) the canonical refresh-scheduler
bug — the sweep never running again after the initial fill, so logits and
caches both stay stale — must crash out of the band.
"""

import numpy as np
import pytest

from incagg_gnn_tpu.graph.datasets import get_data
from incagg_gnn_tpu.models import GCN, GCNConfig
from incagg_gnn_tpu.train.trainer import Trainer, TrainerConfig


def _fit(data, in_c, out_c, *, vr, agg, momentum=0.0, epochs=25):
    cfg = GCNConfig(num_nodes=data.num_nodes, in_channels=in_c,
                    hidden_channels=64, out_channels=out_c, num_layers=3,
                    dropout=0.3, drop_input=False, batch_norm=True)
    tcfg = TrainerConfig(num_parts=16, batch_size=4, vr_update=vr,
                         epochs=epochs, lr=0.01, seed=0, use_aggregation=agg,
                         hist_momentum=momentum, log_every=100)
    return Trainer(GCN(cfg), data, tcfg).fit()["best_test"]


@pytest.mark.full
class TestHardSBMBands:
    """Pinned regression bands on the calibrated hard preset (CPU, seed 0).

    Calibration (docs/RESULTS.md "Hard-SBM accuracy suite"): GAS 0.74,
    VR 0.74, MLP 0.21.  Bands leave ~±0.08 for platform jitter; a silent
    20-point loss (the failure mode VERDICT r1 called out) is far outside.
    """

    @pytest.fixture(scope="class")
    def hard(self):
        return get_data("/tmp", "sbm-arxiv-hard", seed=0)

    def test_gas_band(self, hard):
        data, in_c, out_c = hard
        acc = _fit(data, in_c, out_c, vr=False, agg=True)
        assert 0.62 <= acc <= 0.85, acc

    def test_vr_band_and_staleness_robustness(self, hard):
        data, in_c, out_c = hard
        acc = _fit(data, in_c, out_c, vr=True, agg=True)
        assert 0.62 <= acc <= 0.85, acc
        # frozen caches (EMA weight ~0 keeps the initial fill forever):
        # VR trains on stale aggregates yet must stay in band and within
        # ~5 points of fresh — the staleness-robustness the VR correction
        # exists to provide (measured cost <1 point; GAS 0.738 -> 0.731)
        stale = _fit(data, in_c, out_c, vr=True, agg=True, momentum=1e-4)
        assert 0.62 <= stale <= 0.85, (stale, acc)
        assert stale >= acc - 0.05, (stale, acc)

    def test_skipped_refresh_fails_band(self, hard):
        """The canonical staleness bug — the refresh sweep never fires
        after the first one, so eval logits and caches both freeze — must
        fall far out of the band (loud failure, VERDICT r1 item 2)."""
        data, in_c, out_c = hard

        class NoRefreshTrainer(Trainer):
            def _refresh(self, host_logits=True):
                if not hasattr(self, "_stale_logits"):
                    self._stale_logits = super()._refresh()
                    self._stale_out_table = self.out_table
                # keep the logits table stale too (evaluate reads it)
                self.out_table = self._stale_out_table
                return self._stale_logits

        from incagg_gnn_tpu.models import GCN as _GCN

        cfg = GCNConfig(num_nodes=data.num_nodes, in_channels=in_c,
                        hidden_channels=64, out_channels=out_c, num_layers=3,
                        dropout=0.3, drop_input=False, batch_norm=True)
        tcfg = TrainerConfig(num_parts=16, batch_size=4, vr_update=True,
                             epochs=12, lr=0.01, seed=0, log_every=100)
        acc = NoRefreshTrainer(_GCN(cfg), data, tcfg).fit()["best_test"]
        assert acc < 0.5, acc

    def test_mlp_far_below(self, hard):
        data, in_c, out_c = hard
        acc = _fit(data, in_c, out_c, vr=False, agg=False)
        assert acc < 0.35, acc


@pytest.mark.full
class TestProductsHardGCN2Band:
    """The north-star model's products-scale accuracy pin (VERDICT r3 #2):
    GCNII-Reverb in the 0.6-0.8 band on the v3 products-hard preset
    (real-products homophily + label-noise ceiling; r4 suite measured
    0.766 +- 0.002 over 3 seeds, docs/accuracy_suite_prod_r04.json).
    A regression that knocks GCNII out of its working regime (the r2/r3
    state: 0.22-0.36) fails loudly."""

    def test_gcn2_reverb_band(self):
        from incagg_gnn_tpu.models import GCN2, GCN2Config

        data, in_c, out_c = get_data("/tmp", "sbm-products-hard", seed=0)
        cfg = GCN2Config(num_nodes=data.num_nodes, in_channels=in_c,
                         hidden_channels=64, out_channels=out_c,
                         num_layers=4, dropout=0.3, drop_input=False,
                         batch_norm=True, alpha=0.1, theta=0.5)
        tcfg = TrainerConfig(num_parts=16, batch_size=4, vr_update=True,
                             epochs=20, lr=0.01, seed=0, log_every=1000)
        acc = Trainer(GCN2(cfg), data, tcfg).fit()["best_test"]
        assert 0.60 <= acc <= 0.85, acc


@pytest.mark.full
class TestProductsHardV4Separation:
    """The DISCRIMINATIVE products proxy (VERDICT r4 #4, r5 v4 preset).

    v3 pins band membership + GAS<->Reverb parity but every model reads
    0.766 to 3 decimals — no power to see a model-specific regression.
    v4 (64 near-overlapping classes, 16 features, label-noise ceiling
    0.852) separates the family into DISTINCT pinned values
    (docs/accuracy_suite_prod_r05.json, 3 seeds, float32):

        GCN-GAS    0.8524 +- 0.0008   (pins the ceiling)
        GCN-Reverb 0.8525 +- 0.0009   (exact parity)
        GCNII-GAS  0.8487 +- 0.0043
        GCNII-Rev  0.4851 +- 0.0581   (VR staleness finally COSTS here)
        APPNP-GAS  0.1442 +- 0.0065   (out of its working regime)

    so a regression in GCNII's propagate/update math or its VR correction
    moves a number nothing else moves.  The calibration sweep
    (docs/RESULTS.md "v4") documents why the real-products GCNII>GCN
    ordering is NOT expressible in a uniform SBM; v3's band/parity pins
    stay in force unchanged.  NOTE the GCNII-Reverb band has an UPPER
    bound on purpose: a toolchain/VR change that closes the staleness gap
    should fail this loudly and prompt re-pinning (same philosophy as the
    tiny-batch toolchain gate)."""

    def _fit_v4(self, model_name, vr):
        from incagg_gnn_tpu.models import GCN2, GCN2Config

        data, in_c, out_c = get_data("/tmp", "sbm-products-hard-v4", seed=0)
        cfg = GCN2Config(num_nodes=data.num_nodes, in_channels=in_c,
                         hidden_channels=64, out_channels=out_c,
                         num_layers=4, dropout=0.3, drop_input=False,
                         batch_norm=True, alpha=0.1, theta=0.5)
        from incagg_gnn_tpu.models import GCN2 as M
        tcfg = TrainerConfig(num_parts=16, batch_size=4, vr_update=vr,
                             epochs=20, lr=0.01, seed=0, log_every=1000)
        return Trainer(M(cfg), data, tcfg).fit()["best_test"]

    def test_gcn2_gas_near_ceiling_and_reverb_sensitivity(self):
        gas = self._fit_v4("gcn2", vr=False)
        assert 0.82 <= gas <= 0.87, gas  # seed 0 measured 0.8427
        rev = self._fit_v4("gcn2", vr=True)
        # seed 0 measured 0.5439; the VR-staleness cost IS the signal —
        # a VR-correction regression collapses it further, a fix raises
        # it past 0.65 and must be re-pinned
        assert 0.30 <= rev <= 0.65, rev
        assert gas - rev > 0.15, (gas, rev)
