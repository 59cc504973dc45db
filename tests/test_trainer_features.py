"""Trainer feature tests: periodic in-epoch refresh, EMA cache momentum,
inductive full-graph eval, multilabel (BCE) training, metrics logging."""

import json
import os

import numpy as np
import pytest

from incagg_gnn_tpu.graph.datasets import make_sbm
from incagg_gnn_tpu.models import GCN, GCNConfig, GraphSAGE, SAGEConfig
from incagg_gnn_tpu.train.trainer import Trainer, TrainerConfig

pytestmark = pytest.mark.full


def make_trainer(data, in_c, out_c, **tkw):
    cfg = GCNConfig(num_nodes=data.num_nodes, in_channels=in_c,
                    hidden_channels=24, out_channels=out_c, num_layers=2,
                    dropout=0.1, drop_input=False)
    return Trainer(GCN(cfg), data, TrainerConfig(num_parts=4, batch_size=1,
                                                 seed=0, **tkw))


class TestPeriodUpdates:
    def test_midepoch_refresh_runs(self, sbm_small):
        data, in_c, out_c = sbm_small
        t = make_trainer(data, in_c, out_c, vr_update=True,
                         period_updates_in_one_epoch=2)
        t.fill_history()
        before = np.asarray(t.hist.emb).copy()
        t.train_epoch()
        # mid-epoch refresh rewrote the caches with updated params
        assert not np.allclose(before, np.asarray(t.hist.emb))


class TestMomentum:
    def test_ema_blend(self, sbm_small):
        data, in_c, out_c = sbm_small
        t = make_trainer(data, in_c, out_c, vr_update=True, hist_momentum=0.5)
        t.fill_history()
        h0 = np.asarray(t.hist.emb).copy()
        t.train_epoch()
        # fresh refresh result (hard) for comparison
        t_hard = make_trainer(data, in_c, out_c, vr_update=True)
        t_hard.params = t.params
        t_hard.state = t.state
        hard = np.asarray(t_hard.fill_history())
        t.evaluate()
        h1 = np.asarray(t.hist.emb)
        # blended cache must lie strictly between old and hard-refresh values
        # (can't equal the old cache)
        assert not np.allclose(h1, h0)


class TestInductive:
    def test_full_forward_matches_dense(self, sbm_tiny):
        data, in_c, out_c = sbm_tiny
        t = make_trainer(data, in_c, out_c)
        t.fill_history()
        # a *different* graph with the same feature/label dims
        other, _, _ = make_sbm(num_nodes=300, num_classes=out_c,
                               num_features=in_c, avg_degree=6.0, seed=9)
        logits = t.full_forward(other)
        assert logits.shape == (300, out_c)
        assert np.isfinite(logits).all()
        # oracle: dense forward on the transformed graph
        from incagg_gnn_tpu.graph.csr import gcn_norm
        g = gcn_norm(other.adj_t.set_diag())
        a = np.zeros((300, 300))
        row, col, val = g.to_coo()
        a[row, col] = val
        h = other.x
        for l in range(2):
            w = np.asarray(t.params["convs"][l]["w"])
            b = np.asarray(t.params["convs"][l]["b"])
            h = a @ (h @ w) + b
            if l == 0:
                h = np.maximum(h, 0)
        assert np.allclose(logits, h, atol=2e-3, rtol=1e-3)


class TestMultilabel:
    def test_bce_training(self):
        data, in_c, out_c = make_sbm(num_nodes=800, num_classes=6,
                                     num_features=24, avg_degree=8.0, seed=4,
                                     multilabel=True)
        cfg = SAGEConfig(num_nodes=data.num_nodes, in_channels=in_c,
                         hidden_channels=32, out_channels=out_c, num_layers=2,
                         dropout=0.1, drop_input=False)
        tcfg = TrainerConfig(num_parts=4, batch_size=2, vr_update=True,
                             epochs=10, lr=0.01, seed=0)
        res = Trainer(GraphSAGE(cfg), data, tcfg).fit()
        assert res["best_test"] > 0.5, res  # micro-F1 on multilabel


class TestMetricsLog:
    def test_jsonl_written(self, sbm_tiny, tmp_path):
        data, in_c, out_c = sbm_tiny
        path = str(tmp_path / "m.jsonl")
        t = make_trainer(data, in_c, out_c, vr_update=True, metrics_path=path)
        t.fill_history()
        t.train_epoch()
        t.evaluate()
        lines = [json.loads(l) for l in open(path)]
        kinds = {l["kind"] for l in lines}
        assert "train_epoch" in kinds and "eval" in kinds
        tr = [l for l in lines if l["kind"] == "train_epoch"][0]
        assert "loss" in tr and "drift" in tr and "epoch_s" in tr


class TestBF16Tables:
    def test_bf16_features_and_caches_learn(self, sbm_small):
        data, in_c, out_c = sbm_small
        from incagg_gnn_tpu.models import GCN, GCNConfig

        cfg = GCNConfig(num_nodes=data.num_nodes, in_channels=in_c,
                        hidden_channels=32, out_channels=out_c, num_layers=2,
                        dropout=0.1, drop_input=False)
        tcfg = TrainerConfig(num_parts=8, batch_size=2, vr_update=True,
                             epochs=8, lr=0.01, seed=0,
                             hist_dtype="bfloat16", x_dtype="bfloat16")
        res = Trainer(GCN(cfg), data, tcfg).fit()
        assert res["best_test"] > 0.8, res


class TestWatchdog:
    def test_passthrough_when_fast(self, sbm_small):
        """With the watchdog armed, a healthy run behaves identically."""
        data, in_c, out_c = sbm_small
        t = make_trainer(data, in_c, out_c, vr_update=True, epochs=2,
                         device_timeout_s=120.0)
        res = t.fit()
        assert np.isfinite(res["best_test"])
        assert t.watchdog.stalls == 0

    def test_times_out_on_stall(self):
        """A wedged round trip raises DeviceTimeoutError with diagnostics
        instead of hanging (the reference prints CUDA errors and continues,
        async_cuda.cu:86-89 — SURVEY §5.3 calls out the corruption hazard)."""
        import pytest

        from incagg_gnn_tpu.utils.watchdog import DeviceTimeoutError, Watchdog

        class _Stuck:
            """Pytree leaf whose readiness never arrives."""

        import time as _time
        import jax

        wd = Watchdog(timeout_s=0.3, warn_fraction=0.5)
        orig = jax.block_until_ready
        try:
            jax.block_until_ready = lambda t: _time.sleep(10)
            t0 = _time.monotonic()
            with pytest.raises(DeviceTimeoutError, match="failing fast"):
                wd.wait(_Stuck(), label="unit stall")
            assert _time.monotonic() - t0 < 5.0
            assert wd.stalls == 1  # the warn fired before the deadline
        finally:
            jax.block_until_ready = orig

    def test_disabled_by_default(self, sbm_small):
        data, in_c, out_c = sbm_small
        t = make_trainer(data, in_c, out_c, vr_update=False, epochs=1)
        assert t.cfg.device_timeout_s == 0.0
        res = t.fit()
        assert np.isfinite(res["best_test"])


class TestDriftAdaptiveRefresh:
    """Adaptive staleness control (beyond the reference's fixed
    period_updates_in_one_epoch): refresh exactly when measured drift
    crosses the threshold."""

    def test_triggers_on_tiny_threshold(self, sbm_small):
        data, in_c, out_c = sbm_small
        t = make_trainer(data, in_c, out_c, vr_update=True, epochs=1,
                         refresh_drift_threshold=1e-9)
        t.fill_history()
        m = t.train_epoch()
        assert m["drift_refreshes"] > 0, m

    def test_silent_on_huge_threshold(self, sbm_small):
        data, in_c, out_c = sbm_small
        t = make_trainer(data, in_c, out_c, vr_update=True, epochs=1,
                         refresh_drift_threshold=1e9)
        t.fill_history()
        m = t.train_epoch()
        assert m["drift_refreshes"] == 0, m

    def test_converges_with_threshold(self, sbm_small):
        data, in_c, out_c = sbm_small
        t = make_trainer(data, in_c, out_c, vr_update=True, epochs=6,
                         refresh_drift_threshold=0.5)
        res = t.fit()
        assert res["best_test"] > 0.8, res


class TestFusedEpoch:
    """Whole-epoch scanned jit must be step-for-step equivalent to the
    per-batch loop (both Reverb and GAS modes carry identical math; GAS
    additionally carries the cache through the scan)."""

    def _train(self, vr, fused, epochs=2):
        data, in_c, out_c = make_sbm(num_nodes=300, num_classes=4,
                                     num_features=12, avg_degree=8.0, seed=3)
        cfg = GCNConfig(num_nodes=data.num_nodes, in_channels=in_c,
                        hidden_channels=16, out_channels=out_c,
                        num_layers=2, dropout=0.0)
        tcfg = TrainerConfig(num_parts=4, batch_size=1, vr_update=vr,
                             epochs=epochs, seed=0, fused_epoch=fused)
        tr = Trainer(GCN(cfg), data, tcfg)
        tr.fill_history()
        for _ in range(epochs):
            out = tr.train_epoch()
        return tr, out

    @pytest.mark.parametrize("vr", [False, True])
    def test_fused_matches_loop(self, vr):
        tr_f, out_f = self._train(vr, "on")
        tr_l, out_l = self._train(vr, "off")
        # fused path actually ran (shapes uniform, constraints satisfied)
        assert getattr(tr_f, "_fused_fn", None) is not None
        assert getattr(tr_l, "_fused_fn", None) is None
        import jax

        for a, b in zip(jax.tree.leaves(tr_f.params),
                        jax.tree.leaves(tr_l.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)
        if not vr:  # GAS: per-step cache pushes must match too
            np.testing.assert_allclose(
                np.asarray(tr_f.hist.emb), np.asarray(tr_l.hist.emb),
                rtol=1e-4, atol=1e-5)
        ev_f, ev_l = tr_f.evaluate(), tr_l.evaluate()
        assert abs(ev_f["test_acc"] - ev_l["test_acc"]) < 1e-6


class TestFP8Caches:
    def test_fp8_caches_learn(self, sbm_small):
        """float8_e4m3 caches: quarter the HBM of f32; quantization error is
        absorbed by the VR correction like staleness drift."""
        data, in_c, out_c = sbm_small
        from incagg_gnn_tpu.models import GCN, GCNConfig

        cfg = GCNConfig(num_nodes=data.num_nodes, in_channels=in_c,
                        hidden_channels=32, out_channels=out_c, num_layers=2,
                        dropout=0.1, drop_input=False)
        tcfg = TrainerConfig(num_parts=8, batch_size=2, vr_update=True,
                             epochs=8, lr=0.01, seed=0,
                             hist_dtype="float8_e4m3")
        res = Trainer(GCN(cfg), data, tcfg).fit()
        assert res["best_test"] > 0.8, res

    def test_unknown_dtype_rejected(self, sbm_small):
        from incagg_gnn_tpu.history import resolve_dtype

        with pytest.raises(ValueError):
            resolve_dtype("int4")


class TestPartialRefresh:
    """refresh_frac (VERDICT r1 #5): each sweep refreshes a rotating
    stalest-first window; skipped clusters keep the previous caches/logits."""

    def _trainer(self, sbm_small, frac):
        from incagg_gnn_tpu.models import GCN, GCNConfig

        data, in_c, out_c = sbm_small
        cfg = GCNConfig(num_nodes=data.num_nodes, in_channels=in_c,
                        hidden_channels=32, out_channels=out_c, num_layers=2,
                        dropout=0.0, drop_input=False, batch_norm=False,
                        residual=False)
        tcfg = TrainerConfig(num_parts=8, batch_size=1, vr_update=True,
                             epochs=12, lr=0.01, seed=0, refresh_frac=frac)
        return Trainer(GCN(cfg), data, tcfg)

    def test_window_rotates_and_skipped_rows_stay(self, sbm_small):
        import jax

        tr = self._trainer(sbm_small, 0.5)
        tr.fill_history()  # fill is always complete
        before = np.asarray(tr.out_table)
        # perturb params so refreshed rows must change
        tr.params = jax.tree.map(lambda p: p * 1.5, tr.params)
        tr._refresh()
        after1 = np.asarray(tr.out_table)
        changed1 = ~np.isclose(before[:-1], after1[:-1]).all(axis=1)
        # exactly the first-window clusters changed, the rest kept stale rows
        assert 0 < changed1.sum() < changed1.size
        tr._refresh()
        after2 = np.asarray(tr.out_table)
        changed_total = ~np.isclose(before[:-1], after2[:-1]).all(axis=1)
        # two half-sweeps cover every node with a nonzero logit row
        assert changed_total.sum() > 0.95 * changed_total.size

    def test_converges_with_partial_refresh(self, sbm_small):
        res = self._trainer(sbm_small, 0.5).fit()
        assert res["best_test"] > 0.8, res["best_test"]


class TestChunkedDeviceScanRefresh:
    def test_on_device_overbudget_scan_matches_per_batch(self):
        """Device-resident eval stacks engage the chunked refresh scan even
        when batch count and total bytes exceed the host-restaging gates
        (the 72 s products-scale per-batch eval sweep, docs/RESULTS.md):
        with a deliberately tiny HBM budget the sweep runs multi-chunk
        per layer and must equal the per-batch (scan=False) sweep."""
        import jax
        import jax.numpy as jnp

        data, in_c, out_c = make_sbm(num_nodes=2000, num_classes=4,
                                     num_features=8, avg_degree=6.0, seed=0)
        cfg = GCNConfig(num_nodes=data.num_nodes, in_channels=in_c,
                        hidden_channels=16, out_channels=out_c, num_layers=2,
                        dropout=0.0, drop_input=False)
        t = Trainer(GCN(cfg), data,
                    TrainerConfig(num_parts=70, batch_size=1, seed=0,
                                  vr_update=True, epochs=1))
        batches = list(t.eval_loader)
        leaves = jax.tree_util.tree_leaves(batches[0].device)
        assert len(batches) > 64
        assert all(isinstance(l, jax.Array) for l in leaves)
        per = sum(int(np.prod(l.shape)) * l.dtype.itemsize for l in leaves)
        # budget of ~3 batches -> many chunks, resident stacked copy refused
        t.model._refresh_hbm_budget = 3 * per

        logits_scan, hist_scan, out_scan = t.model.refresh(
            t.params, t.state, t.tables.x, t.eval_loader,
            jax.tree.map(jnp.zeros_like, t.hist), None, vr=True)
        logits_ref, hist_ref, out_ref = t.model.refresh(
            t.params, t.state, t.tables.x, t.eval_loader,
            jax.tree.map(jnp.zeros_like, t.hist), None, vr=True, scan=False)
        assert np.allclose(logits_scan, logits_ref, atol=1e-5)
        assert np.allclose(np.asarray(hist_scan.emb),
                           np.asarray(hist_ref.emb), atol=1e-5)
        assert np.allclose(np.asarray(hist_scan.emb_ag),
                           np.asarray(hist_ref.emb_ag), atol=1e-5)


class TestDeviceMetrics:
    """evaluate() computes split metrics on device (3-scalar readback);
    must equal the host compute_micro_f1 path in both label modes."""

    def _check(self, multilabel):
        from incagg_gnn_tpu.models import GraphSAGE, SAGEConfig

        data, in_c, out_c = make_sbm(num_nodes=1500, num_classes=5,
                                     num_features=12, avg_degree=8.0,
                                     seed=0, multilabel=multilabel)
        cfg = SAGEConfig(num_nodes=data.num_nodes, in_channels=in_c,
                         hidden_channels=16, out_channels=out_c,
                         num_layers=2, dropout=0.0, drop_input=False)
        t = Trainer(GraphSAGE(cfg), data,
                    TrainerConfig(num_parts=4, batch_size=2, seed=0,
                                  vr_update=True, epochs=1))
        t.fit()
        dev = t.evaluate()
        host = t.metrics_from_logits(t._refresh())
        for k in ("train_acc", "val_acc", "test_acc"):
            assert abs(dev[k] - host[k]) < 1e-6, (k, dev, host)

    def test_single_label(self):
        self._check(False)

    def test_multilabel(self):
        self._check(True)


class TestGlobalColsRefresh:
    """Global-column eval refresh (loader.global_cols → model
    _refresh_batch_step_global): aggregation slots gather straight from the
    cache tables.  Must be numerically equivalent to the batch-local COO
    sweep in f32 on every covered model family and in every dispatch mode
    (resident scan / per-batch fallback / partial-refresh subset)."""

    def _mk(self, sbm_small, model_name, fmt, **tkw):
        import numpy as np

        from incagg_gnn_tpu.models import (
            APPNP, APPNPConfig, GCN, GCN2, GCN2Config, GCNConfig, GraphSAGE,
            SAGEConfig)
        from incagg_gnn_tpu.train.trainer import Trainer, TrainerConfig

        data, in_c, out_c = sbm_small
        common = dict(num_nodes=data.num_nodes, in_channels=in_c,
                      out_channels=out_c, num_layers=2, dropout=0.0)
        di = dict(drop_input=False)
        model = {
            "gcn": lambda: GCN(GCNConfig(hidden_channels=16, **common, **di)),
            "gcn2": lambda: GCN2(GCN2Config(hidden_channels=16,
                                            shared_weights=False, alpha=0.1,
                                            theta=0.5, **common, **di)),
            "appnp": lambda: APPNP(APPNPConfig(hidden_channels=16, alpha=0.1,
                                               **common)),
            "sage": lambda: GraphSAGE(SAGEConfig(hidden_channels=16,
                                                 **common, **di)),
        }[model_name]()
        tcfg = TrainerConfig(num_parts=8, batch_size=1, vr_update=True,
                             seed=0, epochs=1, adj_format=fmt, **tkw)
        tr = Trainer(model, data, tcfg)
        tr.fill_history()
        return tr

    @pytest.mark.parametrize("model_name", ["gcn", "gcn2", "appnp", "sage"])
    def test_matches_coo_sweep(self, sbm_small, model_name):
        import numpy as np

        hy = self._mk(sbm_small, model_name, "hybrid")
        co = self._mk(sbm_small, model_name, "coo")
        assert hy.model._last_refresh_plan["global_cols"] is True
        assert co.model._last_refresh_plan["global_cols"] is False
        lh = np.asarray(hy.out_table[: sbm_small[0].num_nodes])
        lc = np.asarray(co.out_table[: sbm_small[0].num_nodes])
        assert np.allclose(lh, lc, atol=2e-5), np.abs(lh - lc).max()
        # caches match too (M_in and M_ag per layer)
        for a, b in zip(hy.hist.emb, co.hist.emb):
            assert np.allclose(np.asarray(a), np.asarray(b), atol=2e-5)
        for a, b in zip(hy.hist.emb_ag, co.hist.emb_ag):
            assert np.allclose(np.asarray(a), np.asarray(b), atol=2e-5)

    def test_per_batch_fallback_matches(self, sbm_small):
        import jax
        import jax.numpy as jnp
        import numpy as np

        tr = self._mk(sbm_small, "gcn2", "hybrid")
        scan_out = np.asarray(tr.out_table[: sbm_small[0].num_nodes])
        # re-run the sweep unscanned (per-batch global jits)
        _, hist, out = tr.model.refresh(
            tr.params, tr.state, tr.tables.x, tr.eval_loader,
            jax.tree.map(jnp.copy, tr.hist), None, vr=True, scan=False,
            host_logits=False)
        assert tr.model._last_refresh_plan["use_scan"] is False
        assert tr.model._last_refresh_plan["global_cols"] is True
        got = np.asarray(out[: sbm_small[0].num_nodes])
        assert np.allclose(got, scan_out, atol=2e-5)

    def test_partial_refresh_global(self, sbm_small):
        """refresh_frac under the global path: refreshed clusters update,
        and training still converges (pair consistency kept per batch)."""
        tr = self._mk(sbm_small, "gcn", "hybrid", refresh_frac=0.5)
        for _ in range(6):
            tr.train_epoch()
            tr._refresh(host_logits=False)
        acc = tr.evaluate()
        assert acc["test_acc"] > 0.8, acc


@pytest.mark.full
def test_fp8_hard_preset_band():
    """fp8 caches on the NON-saturated hard preset (VERDICT r4 #5): the
    easy-SBM 'learns' check cannot see a quantization-accuracy cost; this
    pins the characterized band (docs/fp8_characterization_r05.json:
    GCN-Reverb fp8 0.755 +- 0.006 over 3 seeds ~= f32's 0.756)."""
    from incagg_gnn_tpu.graph.datasets import get_data
    from incagg_gnn_tpu.models import GCN, GCNConfig
    from incagg_gnn_tpu.train.trainer import Trainer, TrainerConfig

    data, in_c, out_c = get_data("/tmp", "sbm-arxiv-hard", seed=0)
    cfg = GCNConfig(num_nodes=data.num_nodes, in_channels=in_c,
                    hidden_channels=64, out_channels=out_c, num_layers=3,
                    dropout=0.3, drop_input=False, batch_norm=True)
    tcfg = TrainerConfig(num_parts=16, batch_size=4, vr_update=True,
                         epochs=25, lr=0.01, seed=0, log_every=1000,
                         hist_dtype="float8_e4m3")
    acc = Trainer(GCN(cfg), data, tcfg).fit()["best_test"]
    assert 0.70 <= acc <= 0.82, acc
