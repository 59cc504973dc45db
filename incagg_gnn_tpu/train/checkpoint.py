"""Checkpoint / resume.

The reference has **no** checkpointing (SURVEY §5.4 — even
``model.state_dict()`` would miss the caches since ``History.emb`` is a plain
attribute).  Here a checkpoint captures the complete training state: params,
optimizer state, BN state, BOTH history stacks, RNG key and epoch counter.
Checkpoints are written at the epoch boundary right after the periodic
refresh, where the caches are freshly consistent — so resume needs no
mid-epoch replay.

Format: one ``.npz`` per checkpoint (flattened pytree leaves) + a JSON
treedef sidecar; atomic rename on save.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import jax
import numpy as np


def _flatten(tree):
    leaves, treedef = jax.tree.flatten(tree)
    return [np.asarray(l) for l in leaves], str(treedef)


def save_pytree(path: str, tree, meta: Optional[dict] = None):
    leaves, treedef = _flatten(tree)
    tmp = path + ".tmp"
    np.savez(tmp, **{f"leaf_{i}": l for i, l in enumerate(leaves)})
    os.replace(tmp + ".npz" if not tmp.endswith(".npz") else tmp, path)
    with open(path + ".meta.json", "w") as f:
        json.dump({"treedef": treedef, "num_leaves": len(leaves),
                   **(meta or {})}, f)


def load_pytree(path: str, like):
    """Restore leaves into the structure of ``like`` (shapes must match)."""
    z = np.load(path)
    leaves = [z[f"leaf_{i}"] for i in range(len(z.files))]
    ref_leaves, treedef = jax.tree.flatten(like)
    assert len(leaves) == len(ref_leaves), (len(leaves), len(ref_leaves))
    import jax.numpy as jnp

    out = []
    for got, ref in zip(leaves, ref_leaves):
        assert got.shape == tuple(ref.shape), (got.shape, ref.shape)
        out.append(jnp.asarray(got, dtype=ref.dtype))
    return jax.tree.unflatten(treedef, out)


class CheckpointManager:
    """Saves/restores a Trainer's full state under a directory."""

    def __init__(self, directory: str, keep: int = 2):
        self.dir = directory
        self.keep = keep
        os.makedirs(directory, exist_ok=True)

    def _state_tree(self, trainer):
        return {
            "params": trainer.params,
            "opt_state": trainer.opt_state,
            "state": trainer.state,
            "hist_emb": trainer.hist.emb,
            "hist_emb_ag": trainer.hist.emb_ag,
            "rng": trainer.rng,
        }

    def save(self, trainer, epoch: int):
        path = os.path.join(self.dir, f"ckpt_{epoch:06d}.npz")
        save_pytree(path, self._state_tree(trainer), meta={"epoch": epoch})
        self._gc()

    def latest(self) -> Optional[str]:
        cks = sorted(
            f for f in os.listdir(self.dir)
            if f.startswith("ckpt_") and f.endswith(".npz")
        )
        return os.path.join(self.dir, cks[-1]) if cks else None

    def maybe_restore(self, trainer) -> bool:
        path = self.latest()
        if path is None:
            return False
        restored = load_pytree(path, self._state_tree(trainer))
        trainer.params = restored["params"]
        trainer.opt_state = restored["opt_state"]
        trainer.state = restored["state"]
        from incagg_gnn_tpu.history import HistoryState

        trainer.hist = HistoryState(restored["hist_emb"], restored["hist_emb_ag"])
        trainer.rng = restored["rng"]
        with open(path + ".meta.json") as f:
            trainer.epoch = json.load(f)["epoch"] + 1
        return True

    def _gc(self):
        cks = sorted(
            f for f in os.listdir(self.dir)
            if f.startswith("ckpt_") and f.endswith(".npz")
        )
        for f in cks[: -self.keep]:
            os.remove(os.path.join(self.dir, f))
            meta = os.path.join(self.dir, f + ".meta.json")
            if os.path.exists(meta):
                os.remove(meta)
