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


def _to_savable(leaf):
    a = np.asarray(leaf)
    # ml_dtypes (bfloat16 etc.) round-trips through npz only if the loader
    # has the dtype registered; store as f32 (lossless for bf16) instead and
    # let load_pytree cast back to the reference dtype
    if a.dtype.kind == "V" or a.dtype.name == "bfloat16":
        a = a.astype(np.float32)
    return a


def _flatten(tree):
    leaves, treedef = jax.tree.flatten(tree)
    return [_to_savable(l) for l in leaves], str(treedef)


def save_pytree(path: str, tree, meta: Optional[dict] = None):
    leaves, treedef = _flatten(tree)
    tmp = path + ".tmp"
    np.savez(tmp, **{f"leaf_{i}": l for i, l in enumerate(leaves)})
    os.replace(tmp + ".npz" if not tmp.endswith(".npz") else tmp, path)
    # meta write must be atomic too: the supervisor's progress check and
    # maybe_restore both read the newest meta, possibly right after a crash
    mtmp = path + ".meta.json.tmp"
    with open(mtmp, "w") as f:
        json.dump({"treedef": treedef, "num_leaves": len(leaves),
                   **(meta or {})}, f)
    os.replace(mtmp, path + ".meta.json")


def load_pytree(path: str, like):
    """Restore leaves into the structure of ``like`` (shapes must match)."""
    z = np.load(path)
    leaves = [z[f"leaf_{i}"] for i in range(len(z.files))]
    ref_leaves, treedef = jax.tree.flatten(like)
    assert len(leaves) == len(ref_leaves), (len(leaves), len(ref_leaves))
    import jax.numpy as jnp

    out = []
    for i, (got, ref) in enumerate(zip(leaves, ref_leaves)):
        if got.shape != tuple(ref.shape):
            raise ValueError(
                f"checkpoint leaf {i} has shape {got.shape} but the trainer "
                f"expects {tuple(ref.shape)} — was the checkpoint saved with "
                f"a different architecture/config?"
            )
        if isinstance(ref, np.ndarray):
            # host-resident leaf (e.g. spill tables): stay on the host
            out.append(got.astype(ref.dtype, copy=False))
        else:
            out.append(jnp.asarray(got, dtype=ref.dtype))
    return jax.tree.unflatten(treedef, out)


class CheckpointManager:
    """Saves/restores a trainer's full state under a directory.

    Works with every trainer variant through the two-method protocol
    ``checkpoint_state() -> pytree`` / ``restore_checkpoint(pytree)``:
    the single-chip :class:`~incagg_gnn_tpu.train.trainer.Trainer`, the
    host-offload :class:`~incagg_gnn_tpu.train.spill_trainer.SpillVRTrainer`
    (host DRAM tables are saved/restored in place), and the multi-chip
    :class:`~incagg_gnn_tpu.parallel.spatial.ShardedVRTrainer` (sharded
    arrays are gathered on save and re-sharded onto the mesh on restore).
    """

    def __init__(self, directory: str, keep: int = 2):
        self.dir = directory
        self.keep = keep
        os.makedirs(directory, exist_ok=True)

    def save(self, trainer, epoch: int, extra: Optional[dict] = None):
        """``extra``: JSON-serializable scalars stored in the meta sidecar
        (e.g. best val/test so a supervised restart reports final metrics
        over the WHOLE run, not just post-crash epochs)."""
        path = os.path.join(self.dir, f"ckpt_{epoch:06d}.npz")
        save_pytree(path, trainer.checkpoint_state(),
                    meta={"epoch": epoch, **(extra or {})})
        self._gc()

    def latest(self) -> Optional[str]:
        cks = sorted(
            f for f in os.listdir(self.dir)
            if f.startswith("ckpt_") and f.endswith(".npz")
            and ".hist-" not in f
        )
        return os.path.join(self.dir, cks[-1]) if cks else None

    def maybe_restore(self, trainer) -> bool:
        """Restore the newest readable checkpoint.

        A corrupt file (truncated write, partial copy) is skipped with a
        warning and the next-newest is tried — the ``keep``>1 retention
        exists exactly for this.  A *shape* mismatch is not corruption, it
        is a config mismatch, and older checkpoints would mismatch the same
        way — that error propagates.
        """
        cks = sorted(
            (f for f in os.listdir(self.dir)
             if f.startswith("ckpt_") and f.endswith(".npz")
             and ".hist-" not in f),
            reverse=True,
        )
        for name in cks:
            path = os.path.join(self.dir, name)
            try:
                restored = load_pytree(path, trainer.checkpoint_state())
                with open(path + ".meta.json") as f:
                    meta = json.load(f)
                epoch = meta["epoch"]
            except ValueError:
                raise  # architecture/config mismatch — see load_pytree
            except Exception as e:  # truncated zip, missing meta, bad keys
                import warnings

                warnings.warn(
                    f"skipping unreadable checkpoint {path}: "
                    f"{type(e).__name__}: {e}"
                )
                continue
            trainer.restore_checkpoint(restored)
            trainer.epoch = epoch + 1
            trainer.restored_meta = meta  # extra scalars (e.g. best acc)
            return True
        return False

    def _gc(self):
        import re

        names = os.listdir(self.dir)
        stems = sorted({m.group(1) for f in names
                        if (m := re.match(r"(ckpt_\d+)\.", f))})
        for stem in stems[: -self.keep]:
            for f in names:
                if f.startswith(stem + "."):
                    try:
                        os.remove(os.path.join(self.dir, f))
                    except FileNotFoundError:
                        pass  # another process's _gc won the race


class ShardedCheckpointManager(CheckpointManager):
    """Per-process sharded saves for multi-host :class:`ShardedVRTrainer`
    runs (VERDICT r1 #6).

    The base manager gathers BOTH full history stacks to one host on every
    save — fine at 1 host, but at N hosts that is an O(num_nodes) DCN
    gather the training step itself never performs.  Here each process
    writes only the device shards it addresses (``sh.data`` is already
    host-local; nothing crosses the network) and process 0 additionally
    writes the small replicated leaves.  Restore is the reverse: each
    process reads the row ranges covering its addressable devices and
    reassembles with ``jax.make_array_from_single_device_arrays``.

    File layout per checkpoint epoch E:
      ``ckpt_E.npz`` (+ ``.meta.json``) — replicated leaves (params,
      optimizer, BN state, RNG), written by process 0 only
      ``ckpt_E.hist-pXXX.npz`` — process XXX's history shards (one
      per-layer table per entry), one entry
      per (stack, row_start)
    """

    def save(self, trainer, epoch: int, extra: Optional[dict] = None):
        import jax

        pidx = jax.process_index()
        base = os.path.join(self.dir, f"ckpt_{epoch:06d}")
        arrs = {}
        for name, arr in trainer.hist_arrays().items():
            seen = set()
            for sh in arr.addressable_shards:
                start = sh.index[0].start or 0
                if start in seen:  # dim replicated across devices
                    continue
                seen.add(start)
                arrs[f"{name}:{start}"] = _to_savable(sh.data)
        spath = base + f".hist-p{pidx:03d}.npz"
        np.savez(spath + ".tmp", **arrs)
        os.replace(spath + ".tmp.npz", spath)
        if pidx == 0:
            save_pytree(base + ".npz", trainer.replicated_checkpoint_state(),
                        meta={"epoch": epoch, "sharded_hist": True,
                              **(extra or {})})
        self._gc()

    def maybe_restore(self, trainer) -> bool:
        import glob

        import jax

        cks = sorted(
            (f for f in os.listdir(self.dir)
             if f.startswith("ckpt_") and f.endswith(".npz")
             and ".hist-" not in f),
            reverse=True,
        )
        for name in cks:
            path = os.path.join(self.dir, name)
            try:
                restored = load_pytree(
                    path, trainer.replicated_checkpoint_state())
                with open(path + ".meta.json") as f:
                    meta = json.load(f)
                shard_files = sorted(glob.glob(path[:-4] + ".hist-p*.npz"))
                if not shard_files:
                    raise FileNotFoundError("no .hist-p*.npz shard files")
                # lazy zips: only the members this process needs are read
                zs = [np.load(f) for f in shard_files]
                index = {}
                for z in zs:
                    for key in z.files:
                        nm, start = key.rsplit(":", 1)
                        index[(nm, int(start))] = (z, key)
                hist = {}
                for nm, arr in trainer.hist_arrays().items():
                    imap = arr.sharding.addressable_devices_indices_map(
                        arr.shape)
                    pieces = []
                    for dev, idx in imap.items():
                        start = idx[0].start or 0
                        want = tuple(
                            len(range(*sl.indices(dim)))
                            for sl, dim in zip(idx, arr.shape))
                        z, key = index[(nm, start)]
                        data = np.asarray(z[key])
                        if data.shape != want:
                            raise ValueError(
                                f"checkpoint shard {key} has shape "
                                f"{data.shape} but the mesh expects {want} "
                                f"— saved under a different layout/config?")
                        pieces.append(jax.device_put(
                            data.astype(arr.dtype), dev))
                    hist[nm] = jax.make_array_from_single_device_arrays(
                        arr.shape, arr.sharding, pieces)
            except ValueError:
                raise  # layout/config mismatch — same policy as load_pytree
            except Exception as e:  # truncated zip, missing shards/meta
                import warnings

                warnings.warn(
                    f"skipping unreadable checkpoint {path}: "
                    f"{type(e).__name__}: {e}"
                )
                continue
            trainer.restore_replicated(restored)
            trainer.set_hist_arrays(hist)
            trainer.epoch = meta["epoch"] + 1
            trainer.restored_meta = meta
            return True
        return False
