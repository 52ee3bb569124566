"""Checkpoint / restore.

Parity: the reference datanode writes `checkpoint_<ts>/{index.bin,
leveldb_data/, deleted_ids.json, wal_pos.txt}` every 2,000 puts and at exit,
and on startup restores the latest checkpoint then replays the WAL tail past
the recorded timestamp (src/datanode/handler.py:156-219).

Here a checkpoint is `checkpoint_<ts>/` containing:
    config.json     — DBConfig used at save time (validated on restore)
    docstore.msgpack— key -> (shard, slot, metadata, ts)
    shard_<i>.npz   — per-shard mirror image (vectors[:used], valid[:used])
    wal_pos.txt     — max WAL timestamp covered by this checkpoint
    MANIFEST.json   — shard count/dim + completeness marker (written last,
                      so a torn checkpoint is never restored)

Retention keeps the newest `max_checkpoints` (the reference keeps all).
"""

from __future__ import annotations

import glob
import json
import os
import shutil
from typing import List, Optional, Tuple

import numpy as np

from tpuvdb.core import errors
from tpuvdb.core.config import DBConfig
from tpuvdb.index.layout import ShardMirror
from tpuvdb.store.kv import DocStore


def _fsync_path(p: str) -> None:
    fd = os.open(p, os.O_RDONLY)
    try:
        os.fsync(fd)
    finally:
        os.close(fd)


def _fsync_tree(d: str) -> None:
    """fsync every file in d, then d itself — a checkpoint is only durable
    once ALL of its files (npz shards, MANIFEST) and the directory entry
    have hit disk; the engine truncates the covering WAL immediately after,
    so a torn-but-manifest-complete checkpoint would otherwise lose data."""
    for name in os.listdir(d):
        _fsync_path(os.path.join(d, name))
    _fsync_path(d)


class CheckpointManager:
    def __init__(self, ckpt_dir: str, max_checkpoints: int = 3):
        self.ckpt_dir = ckpt_dir
        self.max_checkpoints = max_checkpoints
        os.makedirs(ckpt_dir, exist_ok=True)

    def _paths(self) -> List[str]:
        return sorted(glob.glob(os.path.join(self.ckpt_dir, "checkpoint_*")))

    def latest(self) -> Optional[str]:
        for path in reversed(self._paths()):
            if os.path.exists(os.path.join(path, "MANIFEST.json")):
                return path
        return None

    def save_snapshot(
        self,
        config: DBConfig,
        doc_rows: List[tuple],          # (key, shard, slot, metadata, ts)
        shard_snaps: List[dict],        # {vectors, valid, next_slot, deleted}
        wal_pos: int,
        dim: int,
        ivf_warm=None,  # (centroids, trained_live, mut_at_train, mut_now)
    ) -> str:
        """Write a checkpoint from pre-copied state: callers snapshot under
        their lock (a fast memory copy) and call this with the lock
        RELEASED, so serving never stalls on disk writes."""
        import time as _t

        ts = int(_t.time() * 1000)
        path = os.path.join(self.ckpt_dir, f"checkpoint_{ts}")
        tmp = path + ".tmp"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        os.makedirs(tmp)
        with open(os.path.join(tmp, "config.json"), "w") as f:
            f.write(config.to_json())
        import msgpack

        blob = msgpack.packb({"docs": doc_rows}, use_bin_type=True)
        dtmp = os.path.join(tmp, "docstore.msgpack")
        with open(dtmp, "wb") as f:
            f.write(blob)
            f.flush()
            os.fsync(f.fileno())
        for i, s in enumerate(shard_snaps):
            np.savez(os.path.join(tmp, f"shard_{i}.npz"),
                     vectors=s["vectors"], valid=s["valid"],
                     next_slot=np.int64(s["next_slot"]),
                     deleted=np.int64(s["deleted"]))
        with open(os.path.join(tmp, "wal_pos.txt"), "w") as f:
            f.write(str(int(wal_pos)))
        if ivf_warm is not None:
            # trained coarse-quantizer centroids + the live-row count at
            # TRAINING time: a restarted IVF engine rebuilds by ASSIGNMENT
            # against these (seconds) instead of a full k-means training
            # run (minutes at 1M rows), unless the corpus has drifted too
            # far from the training snapshot (engine checks the ratio)
            cents, trained_live, mut_at_train, mut_now = ivf_warm
            np.savez(os.path.join(tmp, "ivf_warm.npz"),
                     centroids=np.asarray(cents, np.float32),
                     trained_live=np.int64(trained_live),
                     mut_at_train=np.int64(mut_at_train),
                     mut_at_ckpt=np.int64(mut_now))
        with open(os.path.join(tmp, "MANIFEST.json"), "w") as f:
            json.dump({"num_shards": len(shard_snaps), "dim": dim,
                       "docs": len(doc_rows), "timestamp": ts}, f)
        _fsync_tree(tmp)
        os.replace(tmp, path)
        _fsync_path(self.ckpt_dir)
        self._gc()
        return path

    def _gc(self):
        paths = [p for p in self._paths() if os.path.exists(os.path.join(p, "MANIFEST.json"))]
        for p in paths[: -self.max_checkpoints]:
            shutil.rmtree(p, ignore_errors=True)
        # also clear torn temp dirs
        for p in glob.glob(os.path.join(self.ckpt_dir, "*.tmp")):
            shutil.rmtree(p, ignore_errors=True)

    def load_latest(
        self, config: DBConfig
    ) -> Optional[Tuple[DocStore, List[ShardMirror], int]]:
        """Restore (docstore, mirrors, wal_pos) from the newest complete
        checkpoint, or None if there is none."""
        path = self.latest()
        if path is None:
            return None
        with open(os.path.join(path, "MANIFEST.json")) as f:
            manifest = json.load(f)
        if manifest["dim"] != config.vector_dim:
            raise errors.CheckpointError(
                f"checkpoint dim {manifest['dim']} != configured {config.vector_dim}"
            )
        docstore = DocStore.load(os.path.join(path, "docstore.msgpack"),
                                 backend=config.docstore_backend)
        mirrors = []
        for i in range(manifest["num_shards"]):
            z = np.load(os.path.join(path, f"shard_{i}.npz"))
            n = int(z["next_slot"])
            m = ShardMirror(
                dim=config.vector_dim,
                capacity=config.shard_capacity,
                init_cap=max(n, 1024),
                block=128,
            )
            if n:
                m.vectors[:n] = z["vectors"]
                m.valid[:n] = z["valid"]
            m.next_slot = n
            m.deleted = int(z["deleted"])
            mirrors.append(m)
        with open(os.path.join(path, "wal_pos.txt")) as f:
            wal_pos = int(f.read().strip())
        return docstore, mirrors, wal_pos

    def load_ivf_warm(self):
        """(centroids, trained_live, mut_at_train, mut_at_ckpt) of the
        newest checkpoint, or None (older checkpoints / flat engines)."""
        path = self.latest()
        if path is None:
            return None
        p = os.path.join(path, "ivf_warm.npz")
        if not os.path.exists(p):
            return None
        try:
            z = np.load(p)
            # pre-churn-counter checkpoints lack the mutation keys:
            # fall back to a zeroed baseline (the counter restarts at 0,
            # churn measures only the replayed tail) instead of silently
            # discarding a perfectly good warm start
            mt = int(z["mut_at_train"]) if "mut_at_train" in z else 0
            mc = int(z["mut_at_ckpt"]) if "mut_at_ckpt" in z else 0
            return z["centroids"], int(z["trained_live"]), mt, mc
        except Exception:
            return None  # torn/corrupt extras never block recovery
