"""Config composition, CLI smoke run, and checkpoint round-trip tests."""

import os

import numpy as np
import pytest

from incagg_gnn_tpu.train.config import load_config, parse_overrides


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class TestConfig:
    def test_load_gcn_arxiv(self):
        cfg = load_config(os.path.join(REPO, "conf/model/gcn.yaml"), "arxiv")
        assert cfg.model == "GCN"
        assert cfg.architecture["hidden_channels"] == 256
        assert cfg.trainer.num_parts == 80
        assert cfg.trainer.batch_size == 40
        assert cfg.trainer.loop and cfg.trainer.norm
        assert cfg.trainer.grad_norm is None

    def test_overrides(self):
        ov = parse_overrides(["vr_update=true", "lr=0.1", "hidden_channels=64",
                              "grad_norm=1.5"])
        cfg = load_config(os.path.join(REPO, "conf/model/gcn.yaml"), "arxiv", ov)
        assert cfg.trainer.vr_update is True
        assert cfg.trainer.lr == 0.1
        assert cfg.trainer.grad_norm == 1.5
        assert cfg.architecture["hidden_channels"] == 64

    def test_vr_update_alias(self):
        ov = parse_overrides(["VR_update=true"])
        cfg = load_config(os.path.join(REPO, "conf/model/appnp.yaml"), "arxiv", ov)
        assert cfg.trainer.vr_update is True

    def test_every_model_yaml_parses(self):
        for name in ["gcn", "gcn2", "appnp", "graphsage", "pna", "gat"]:
            path = os.path.join(REPO, "conf/model", f"{name}.yaml")
            import yaml
            doc = yaml.safe_load(open(path))
            for ds in doc["params"]:
                cfg = load_config(path, ds)
                assert cfg.trainer.epochs > 0

    def test_missing_dataset_raises(self):
        with pytest.raises(KeyError):
            load_config(os.path.join(REPO, "conf/model/gcn.yaml"), "nope")


@pytest.mark.full
class TestCLI:
    def test_main_smoke(self, tmp_path):
        import main as cli

        val, test = cli.main([
            "--model", os.path.join(REPO, "conf/model/gcn.yaml"),
            "--dataset", "sbm-small",
            "epochs=3", "num_parts=4", "batch_size=2",
        ])
        assert 0.0 <= val <= 1.0

    def test_main_vr_with_checkpoint(self, tmp_path):
        import main as cli

        ck = str(tmp_path / "ck")
        cli.main([
            "--model", os.path.join(REPO, "conf/model/gcn.yaml"),
            "--dataset", "sbm-small", "--checkpoint-dir", ck,
            "epochs=2", "num_parts=4", "vr_update=true",
        ])
        assert any(f.startswith("ckpt_") for f in os.listdir(ck))
        # resume continues from the stored epoch
        val2, _ = cli.main([
            "--model", os.path.join(REPO, "conf/model/gcn.yaml"),
            "--dataset", "sbm-small", "--checkpoint-dir", ck,
            "epochs=3", "num_parts=4", "vr_update=true",
        ])
        assert 0.0 <= val2 <= 1.0

    def test_eval_only_with_logits(self, tmp_path):
        """--eval-only restores the checkpoint, reports accuracy without
        training, and dumps full-graph logits in the ORIGINAL node order."""
        import numpy as np

        import main as cli

        ck = str(tmp_path / "ck")
        val_tr, _ = cli.main([
            "--model", os.path.join(REPO, "conf/model/gcn.yaml"),
            "--dataset", "sbm-small", "--checkpoint-dir", ck,
            "epochs=4", "num_parts=4", "vr_update=true",
        ])
        lp = str(tmp_path / "logits.npy")
        val_ev, _ = cli.main([
            "--model", os.path.join(REPO, "conf/model/gcn.yaml"),
            "--dataset", "sbm-small", "--checkpoint-dir", ck,
            "--eval-only", "--save-logits", lp,
            "epochs=4", "num_parts=4", "vr_update=true",
        ])
        logits = np.load(lp)
        from incagg_gnn_tpu.graph.datasets import get_data

        data, _, out_c = get_data("/tmp/datasets", "sbm-small")
        assert logits.shape == (data.num_nodes, out_c)
        # logits are de-permuted: argmax accuracy on the original labels
        # must reproduce the reported eval accuracy on the val split
        pred = logits.argmax(1)
        acc = float((pred[data.val_mask] == data.y[data.val_mask]).mean())
        assert abs(acc - val_ev) < 1e-6

    def test_supervised_restart_after_device_loss(self, tmp_path):
        """Elastic recovery (SURVEY §5.3, absent in the reference): a child
        that dies of device loss mid-run is restarted by --supervise and
        resumes from the latest checkpoint to completion."""
        import subprocess
        import sys

        ck = str(tmp_path / "ck")
        env = dict(os.environ, INCAGG_PLATFORM="cpu",
                   INCAGG_FAULT_INJECT="epoch=1")
        p = subprocess.run(
            [sys.executable, os.path.join(REPO, "main.py"),
             "--model", os.path.join(REPO, "conf/model/gcn.yaml"),
             "--dataset", "sbm-small",
             "--checkpoint-dir", ck, "--supervise", "2",
             "epochs=3", "num_parts=4", "batch_size=2", "vr_update=true"],
            capture_output=True, text=True, env=env, cwd=REPO, timeout=900,
        )
        out = p.stdout + p.stderr
        assert p.returncode == 0, out
        # the injected crash happened (one-shot marker) ...
        assert os.path.exists(os.path.join(ck, ".fault_injected")), out
        assert "supervisor: device loss" in out, out
        # ... and the restarted child resumed past it to the final epoch
        assert "Epoch 0002" in out, out
        # checkpoints advanced to the last epoch
        metas = sorted(f for f in os.listdir(ck) if f.endswith(".meta.json"))
        import json
        with open(os.path.join(ck, metas[-1])) as f:
            assert json.load(f)["epoch"] == 2

    def test_supervise_gives_up_without_progress(self, tmp_path):
        """A failure that repeats with no checkpoint progress exhausts the
        retry budget and surfaces the device-loss exit code."""
        import subprocess
        import sys

        ck = str(tmp_path / "ck")
        env = dict(os.environ, INCAGG_PLATFORM="cpu",
                   INCAGG_FAULT_INJECT="always")
        p = subprocess.run(
            [sys.executable, os.path.join(REPO, "main.py"),
             "--model", os.path.join(REPO, "conf/model/gcn.yaml"),
             "--dataset", "sbm-small",
             "--checkpoint-dir", ck, "--supervise", "1",
             "epochs=2", "num_parts=4", "batch_size=2"],
            capture_output=True, text=True, env=env, cwd=REPO, timeout=900,
        )
        out = p.stdout + p.stderr
        assert p.returncode == 23, out
        assert "giving up" in out, out

    def test_spill_flag(self):
        import main as cli

        val, test = cli.main([
            "--model", os.path.join(REPO, "conf/model/gcn.yaml"),
            "--dataset", "sbm-small", "--spill",
            "epochs=2", "num_parts=4", "vr_update=true",
        ])
        assert 0.0 <= val <= 1.0


class TestCheckpoint:
    def test_roundtrip(self, sbm_small, tmp_path):
        from incagg_gnn_tpu.models import GCN, GCNConfig
        from incagg_gnn_tpu.train.checkpoint import CheckpointManager
        from incagg_gnn_tpu.train.trainer import Trainer, TrainerConfig

        data, in_c, out_c = sbm_small
        cfg = GCNConfig(num_nodes=data.num_nodes, in_channels=in_c,
                        hidden_channels=16, out_channels=out_c, num_layers=2,
                        dropout=0.0, drop_input=False)
        tcfg = TrainerConfig(num_parts=4, batch_size=2, vr_update=True, seed=0)
        t1 = Trainer(GCN(cfg), data, tcfg)
        t1.fill_history()
        t1.train_epoch()
        cm = CheckpointManager(str(tmp_path))
        cm.save(t1, epoch=0)

        t2 = Trainer(GCN(cfg), data, tcfg)
        assert cm.maybe_restore(t2)
        assert t2.epoch == 1
        for a, b in zip(
            np.asarray(t1.hist.emb).ravel(), np.asarray(t2.hist.emb).ravel()
        ):
            pass  # shape check implied by load; spot-check below
        assert np.allclose(np.asarray(t1.hist.emb), np.asarray(t2.hist.emb))
        l1 = np.asarray(t1.params["convs"][0]["w"])
        l2 = np.asarray(t2.params["convs"][0]["w"])
        assert np.allclose(l1, l2)

    def test_gc_keeps_latest(self, sbm_tiny, tmp_path):
        from incagg_gnn_tpu.models import GCN, GCNConfig
        from incagg_gnn_tpu.train.checkpoint import CheckpointManager
        from incagg_gnn_tpu.train.trainer import Trainer, TrainerConfig

        data, in_c, out_c = sbm_tiny
        cfg = GCNConfig(num_nodes=data.num_nodes, in_channels=in_c,
                        hidden_channels=8, out_channels=out_c, num_layers=2)
        t = Trainer(GCN(cfg), data, TrainerConfig(num_parts=2, seed=0))
        cm = CheckpointManager(str(tmp_path), keep=2)
        for e in range(4):
            cm.save(t, e)
        names = sorted(f for f in os.listdir(tmp_path) if f.endswith(".npz"))
        assert names == ["ckpt_000002.npz", "ckpt_000003.npz"]


@pytest.mark.full
class TestCheckpointVariants:
    """Checkpoint protocol on the spill and sharded trainers."""

    def test_spill_trainer_roundtrip(self, sbm_small, tmp_path):
        from incagg_gnn_tpu.models import GCN, GCNConfig
        from incagg_gnn_tpu.train.checkpoint import CheckpointManager
        from incagg_gnn_tpu.train.spill_trainer import SpillVRTrainer
        from incagg_gnn_tpu.train.trainer import TrainerConfig

        data, in_c, out_c = sbm_small
        cfg = GCNConfig(num_nodes=data.num_nodes, in_channels=in_c,
                        hidden_channels=16, out_channels=out_c, num_layers=2,
                        dropout=0.0, drop_input=False)
        tcfg = TrainerConfig(num_parts=4, batch_size=2, vr_update=True, seed=0)
        t1 = SpillVRTrainer(GCN(cfg), data, tcfg)
        t1.fill_history()
        t1.train_epoch()
        cm = CheckpointManager(str(tmp_path))
        cm.save(t1, epoch=0)

        t2 = SpillVRTrainer(GCN(cfg), data, tcfg)
        assert cm.maybe_restore(t2)
        assert t2.epoch == 1
        for l in range(2):
            assert np.array_equal(t1.spill_in[l].table, t2.spill_in[l].table)
            assert np.array_equal(t1.spill_ag[l].table, t2.spill_ag[l].table)
        assert np.allclose(np.asarray(t1.params["convs"][0]["w"]),
                           np.asarray(t2.params["convs"][0]["w"]))
        # restored trainer evaluates identically
        e1, e2 = t1.evaluate(), t2.evaluate()
        assert abs(e1["test_acc"] - e2["test_acc"]) < 1e-6

    def test_sharded_trainer_roundtrip(self, sbm_small, tmp_path):
        import jax

        if len(jax.devices()) < 4:
            import pytest
            pytest.skip("needs >=4 virtual devices")
        from incagg_gnn_tpu.models import GCN, GCNConfig
        from incagg_gnn_tpu.parallel.mesh import make_mesh
        from incagg_gnn_tpu.parallel.spatial import ShardedVRTrainer
        from incagg_gnn_tpu.train.checkpoint import CheckpointManager
        from incagg_gnn_tpu.train.trainer import TrainerConfig

        data, in_c, out_c = sbm_small
        cfg = GCNConfig(num_nodes=data.num_nodes, in_channels=in_c,
                        hidden_channels=16, out_channels=out_c, num_layers=2,
                        dropout=0.0, drop_input=False)
        tcfg = TrainerConfig(num_parts=8, batch_size=1, vr_update=True, seed=0)
        t1 = ShardedVRTrainer(GCN(cfg), data, tcfg, mesh=make_mesh(4))
        t1.refresh()
        t1.train_epoch()
        cm = CheckpointManager(str(tmp_path))
        cm.save(t1, epoch=3)

        t2 = ShardedVRTrainer(GCN(cfg), data, tcfg, mesh=make_mesh(4))
        assert cm.maybe_restore(t2)
        assert t2.epoch == 4
        assert np.allclose(np.asarray(t1.hist.emb), np.asarray(t2.hist.emb))
        # restored history keeps its mesh sharding
        assert t2.hist.emb[0].sharding.is_equivalent_to(
            t1.hist.emb[0].sharding, t1.hist.emb[0].ndim)
        e1, e2 = t1.evaluate(), t2.evaluate()
        assert abs(e1["test_acc"] - e2["test_acc"]) < 1e-6

    def test_sharded_per_process_roundtrip(self, sbm_small, tmp_path):
        """Per-process sharded checkpointing (VERDICT r1 #6): the save path
        writes each device's history slab from its addressable shard —
        NO full-array gather — and restore reassembles onto the mesh."""
        import jax

        if len(jax.devices()) < 4:
            import pytest
            pytest.skip("needs >=4 virtual devices")
        from incagg_gnn_tpu.models import GCN, GCNConfig
        from incagg_gnn_tpu.parallel.mesh import make_mesh
        from incagg_gnn_tpu.parallel.spatial import ShardedVRTrainer
        from incagg_gnn_tpu.train.checkpoint import ShardedCheckpointManager
        from incagg_gnn_tpu.train.trainer import TrainerConfig

        data, in_c, out_c = sbm_small
        cfg = GCNConfig(num_nodes=data.num_nodes, in_channels=in_c,
                        hidden_channels=16, out_channels=out_c, num_layers=2,
                        dropout=0.0, drop_input=False)
        tcfg = TrainerConfig(num_parts=8, batch_size=1, vr_update=True, seed=0)
        t1 = ShardedVRTrainer(GCN(cfg), data, tcfg, mesh=make_mesh(4))
        t1.refresh()
        t1.train_epoch()
        cm = ShardedCheckpointManager(str(tmp_path))
        cm.save(t1, epoch=3)

        # file layout: replicated pytree + one hist shard file per process
        assert (tmp_path / "ckpt_000003.npz").exists()
        shard = tmp_path / "ckpt_000003.hist-p000.npz"
        assert shard.exists()
        z = np.load(shard)
        emb_keys = sorted(k for k in z.files if k.startswith("hist_emb_0:"))
        assert len(emb_keys) == 4  # one slab per device — never the full array
        full_rows = t1.hist.emb[0].shape[0]
        for k in emb_keys:
            assert z[k].shape[0] == full_rows // 4, (k, z[k].shape)

        t2 = ShardedVRTrainer(GCN(cfg), data, tcfg, mesh=make_mesh(4))
        assert cm.maybe_restore(t2)
        assert t2.epoch == 4
        assert np.allclose(np.asarray(t1.hist.emb), np.asarray(t2.hist.emb))
        assert np.allclose(np.asarray(t1.hist.emb_ag),
                           np.asarray(t2.hist.emb_ag))
        assert t2.hist.emb[0].sharding.is_equivalent_to(
            t1.hist.emb[0].sharding, t1.hist.emb[0].ndim)
        e1, e2 = t1.evaluate(), t2.evaluate()
        assert abs(e1["test_acc"] - e2["test_acc"]) < 1e-6
        # GC removes whole checkpoint epochs including their shard files
        cm.save(t2, epoch=4)
        cm.save(t2, epoch=5)
        assert not (tmp_path / "ckpt_000003.npz").exists()
        assert not shard.exists()

    def test_corrupt_latest_falls_back(self, sbm_tiny, tmp_path):
        """A truncated newest checkpoint is skipped (warning) and the older
        readable one restored; a shape mismatch raises a clear error."""
        import pytest
        from incagg_gnn_tpu.models import GCN, GCNConfig
        from incagg_gnn_tpu.train.checkpoint import CheckpointManager
        from incagg_gnn_tpu.train.trainer import Trainer, TrainerConfig

        data, in_c, out_c = sbm_tiny
        cfg = GCNConfig(num_nodes=data.num_nodes, in_channels=in_c,
                        hidden_channels=8, out_channels=out_c, num_layers=2,
                        dropout=0.0, drop_input=False)
        tcfg = TrainerConfig(num_parts=2, batch_size=1, vr_update=True, seed=0)
        t1 = Trainer(GCN(cfg), data, tcfg)
        t1.fill_history()
        cm = CheckpointManager(str(tmp_path))
        cm.save(t1, epoch=0)
        # truncated "newer" checkpoint
        good = tmp_path / "ckpt_000000.npz"
        (tmp_path / "ckpt_000001.npz").write_bytes(good.read_bytes()[:4096])
        (tmp_path / "ckpt_000001.npz.meta.json").write_text('{"epoch": 1}')

        t2 = Trainer(GCN(cfg), data, tcfg)
        with pytest.warns(UserWarning, match="unreadable checkpoint"):
            assert cm.maybe_restore(t2)
        assert t2.epoch == 1  # restored epoch-0 ckpt, not the corrupt one
        assert np.allclose(np.asarray(t1.hist.emb), np.asarray(t2.hist.emb))

        # architecture mismatch is a clear error, not a silent skip
        cfg64 = GCNConfig(num_nodes=data.num_nodes, in_channels=in_c,
                          hidden_channels=64, out_channels=out_c, num_layers=2,
                          dropout=0.0, drop_input=False)
        t3 = Trainer(GCN(cfg64), data, tcfg)
        with pytest.raises(ValueError, match="different architecture"):
            cm.maybe_restore(t3)


@pytest.mark.full
class TestStallRecovery:
    def test_supervisor_kills_and_restarts_stalled_child(self, tmp_path):
        """A child wedged in a silent transport hang (no exception, no
        heartbeat — the tcp_recvmsg failure mode observed on the remote-chip
        link) is killed by the supervisor's stall watchdog and restarted
        from the latest checkpoint to completion."""
        import json
        import subprocess
        import sys

        ck = str(tmp_path / "ck")
        env = dict(os.environ, INCAGG_PLATFORM="cpu",
                   INCAGG_FAULT_INJECT="hang_epoch=1")
        p = subprocess.run(
            [sys.executable, os.path.join(REPO, "main.py"),
             "--model", os.path.join(REPO, "conf/model/gcn.yaml"),
             "--dataset", "sbm-small",
             "--checkpoint-dir", ck, "--supervise", "2",
             "--supervise-stall-s", "6",
             "epochs=3", "num_parts=4", "batch_size=2", "vr_update=true"],
            capture_output=True, text=True, env=env, cwd=REPO, timeout=900,
        )
        out = p.stdout + p.stderr
        assert p.returncode == 0, out
        assert os.path.exists(os.path.join(ck, ".fault_injected")), out
        assert "no heartbeat" in out, out
        assert "Epoch 0002" in out, out
        metas = sorted(f for f in os.listdir(ck) if f.endswith(".meta.json"))
        with open(os.path.join(ck, metas[-1])) as f:
            assert json.load(f)["epoch"] == 2
        # the supervisor wrote/monitored the heartbeat file
        assert os.path.exists(os.path.join(ck, ".heartbeat")), out

    def test_startup_grace_spares_slow_first_compile(self, tmp_path):
        """Before a child's FIRST heartbeat the stall window is widened to
        a startup grace (imports/partition/jit compile emit no beats): a
        healthy run under a stall window shorter than its compile time
        must complete without a single kill (this was a loaded-host flake
        before the grace existed)."""
        import subprocess
        import sys

        ck = str(tmp_path / "ck")
        env = dict(os.environ, INCAGG_PLATFORM="cpu")
        p = subprocess.run(
            [sys.executable, os.path.join(REPO, "main.py"),
             "--model", os.path.join(REPO, "conf/model/gcn.yaml"),
             "--dataset", "sbm-small",
             "--checkpoint-dir", ck, "--supervise", "1",
             "--supervise-stall-s", "2",
             "epochs=1", "num_parts=4", "batch_size=2", "vr_update=true"],
            capture_output=True, text=True, env=env, cwd=REPO, timeout=900,
        )
        out = p.stdout + p.stderr
        assert p.returncode == 0, out
        assert "no heartbeat" not in out, out
