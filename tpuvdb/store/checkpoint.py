"""Checkpoint / restore.

Parity: the reference datanode writes `checkpoint_<ts>/{index.bin,
leveldb_data/, deleted_ids.json, wal_pos.txt}` every 2,000 puts and at exit,
and on startup restores the latest checkpoint then replays the WAL tail past
the recorded timestamp (src/datanode/handler.py:156-219).

Here a checkpoint is `checkpoint_<ts>/` containing:
    config.json      — DBConfig used at save time (validated on restore)
    docstore.msgpack — key -> (shard, slot, metadata, ts)   [python backend]
    docstore.kv      — the native KV's C++ binary snapshot  [native backend]
    shard_<i>.npz    — per-shard mirror metadata (+ inline rows for RAM
                       mirrors: raw-dtype vectors, scales, sqnorms)
    shard_<i>.vec/.scale/.sq — HARDLINKS of an mmap mirror's vector files
                       (zero-copy: slot rows are append-only + immutable,
                       so linking the live file and recording next_slot is
                       a crash-consistent snapshot; no GB-scale npz copy)
    wal_pos.txt      — max WAL LSN covered by this checkpoint
    MANIFEST.json    — shard count/dim/format + completeness marker
                       (written last, so a torn checkpoint never restores)

Format 2 (round 3) adds mirror dtype/backing metadata; format-1 checkpoints
(f32 `vectors` + `valid` npz) still restore.

Retention keeps the newest `max_checkpoints` (the reference keeps all).
"""

from __future__ import annotations

import glob
import json
import os
import shutil
from typing import Callable, List, Optional, Tuple

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

    # ---------------------------------------------------------------- writing

    def begin(self) -> str:
        """Create and return the staging directory for the next checkpoint.
        Callers may write extra payloads into it (e.g. the native docstore
        dump) before finish(); torn staging dirs are GC'd, never restored."""
        import time as _t

        ts = int(_t.time() * 1000)
        path = os.path.join(self.ckpt_dir, f"checkpoint_{ts}")
        tmp = path + ".tmp"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        os.makedirs(tmp)
        return tmp

    def finish(
        self,
        tmp: str,
        config: DBConfig,
        doc_rows: Optional[List[tuple]],  # None = docstore.kv already in tmp
        shard_snaps: List[dict],          # ShardMirror.checkpoint_snapshot()
        wal_pos: int,
        dim: int,
        ivf_warm=None,  # (centroids, trained_live, mut_at_train, mut_now)
    ) -> str:
        """Write and commit the checkpoint from snapshot descriptors:
        callers capture them under their lock (views + small copies) and
        call this with the lock RELEASED, so serving never stalls on disk
        writes. mmap-backed shards hardlink their vector files; RAM shards
        inline their raw rows in the npz."""
        with open(os.path.join(tmp, "config.json"), "w") as f:
            f.write(config.to_json())
        if doc_rows is not None:
            import msgpack

            blob = msgpack.packb({"docs": doc_rows}, use_bin_type=True)
            with open(os.path.join(tmp, "docstore.msgpack"), "wb") as f:
                f.write(blob)
                f.flush()
                os.fsync(f.fileno())
        for i, s in enumerate(shard_snaps):
            meta = {
                "fmt": 2,
                "dtype": s["dtype"],
                "n": np.int64(s["n"]),
                "deleted": np.int64(s["deleted"]),
                "valid": s["valid"],
            }
            linked = None
            if s["mmap_paths"] is not None:
                s["store_ref"].flush_files()  # msync before linking
                linked = {}
                for part, src in s["mmap_paths"].items():
                    dst = os.path.join(tmp, f"shard_{i}.{part}")
                    try:
                        os.link(src, dst)
                    except FileNotFoundError:
                        # A concurrent compaction unlinked the live path
                        # after the snapshot was taken. The snapshot's
                        # row views stay valid (store_ref pins the mmap),
                        # so fall back to inlining the rows below.
                        linked = None
                        break
                    except OSError:
                        try:
                            shutil.copyfile(src, dst)  # cross-device link
                        except FileNotFoundError:
                            linked = None
                            break
                    linked[part] = os.path.basename(dst)
                if linked is None:
                    for part in s["mmap_paths"]:
                        try:
                            os.unlink(os.path.join(tmp, f"shard_{i}.{part}"))
                        except OSError:
                            pass
            if linked is not None:
                np.savez(os.path.join(tmp, f"shard_{i}.npz"),
                         linked=json.dumps(linked),
                         file_rows=np.int64(s["store_ref"].valid.shape[0]),
                         **meta)
            else:
                extra = {"vectors": s["vec"], "sqnorms": s["sq"]}
                if s["scale"] is not None:
                    extra["scales"] = s["scale"]
                np.savez(os.path.join(tmp, f"shard_{i}.npz"),
                         **extra, **meta)
        with open(os.path.join(tmp, "wal_pos.txt"), "w") as f:
            f.write(str(int(wal_pos)))
        if ivf_warm is not None:
            # trained coarse-quantizer centroids + the live-row count at
            # TRAINING time: a restarted IVF engine rebuilds by ASSIGNMENT
            # against these (seconds) instead of a full k-means training
            # run (minutes at 1M rows), unless the corpus has drifted too
            # far from the training snapshot (engine checks the ratio)
            cents, trained_live, mut_at_train, mut_now = ivf_warm[:4]
            extra = {}
            # 5-element warm state carries trained PQ codebooks (IVF-PQ
            # engines skip codebook retraining on restart, like centroids);
            # a 6th element carries the OPQ rotation that pairs with them
            if len(ivf_warm) > 4 and ivf_warm[4] is not None:
                extra["pq_codebooks"] = np.asarray(ivf_warm[4], np.float32)
            if len(ivf_warm) > 5 and ivf_warm[5] is not None:
                extra["pq_rotation"] = np.asarray(ivf_warm[5], np.float32)
            # 7th element: the adaptive-rescore calibration that pairs
            # with the codebooks (kernels/pq.calibrate_pq_err)
            if len(ivf_warm) > 6 and ivf_warm[6]:
                extra["pq_err"] = np.float64(ivf_warm[6])
            np.savez(os.path.join(tmp, "ivf_warm.npz"),
                     centroids=np.asarray(cents, np.float32),
                     trained_live=np.int64(trained_live),
                     mut_at_train=np.int64(mut_at_train),
                     mut_at_ckpt=np.int64(mut_now), **extra)
        with open(os.path.join(tmp, "MANIFEST.json"), "w") as f:
            json.dump({"num_shards": len(shard_snaps), "dim": dim,
                       "format": 2,
                       "docstore": ("kv" if doc_rows is None
                                    else "msgpack"),
                       "timestamp": int(os.path.basename(tmp)
                                        .split("_")[1].split(".")[0])}, f)
        _fsync_tree(tmp)
        path = tmp[: -len(".tmp")]
        os.replace(tmp, path)
        _fsync_path(self.ckpt_dir)
        self._gc()
        return path

    # kept for API compatibility with round-2 callers/tests
    def save_snapshot(self, config, doc_rows, shard_snaps, wal_pos, dim,
                      ivf_warm=None) -> str:
        tmp = self.begin()
        return self.finish(tmp, config, doc_rows, shard_snaps, wal_pos,
                           dim, ivf_warm=ivf_warm)

    def _gc(self):
        paths = [p for p in self._paths() if os.path.exists(os.path.join(p, "MANIFEST.json"))]
        for p in paths[: -self.max_checkpoints]:
            shutil.rmtree(p, ignore_errors=True)
        # also clear torn temp dirs
        for p in glob.glob(os.path.join(self.ckpt_dir, "*.tmp")):
            shutil.rmtree(p, ignore_errors=True)

    # ---------------------------------------------------------------- loading

    def load_latest(
        self,
        config: DBConfig,
        mirror_factory: Optional[Callable[[int], ShardMirror]] = None,
    ) -> Optional[Tuple[DocStore, List[ShardMirror], int]]:
        """Restore (docstore, mirrors, wal_pos) from the newest complete
        checkpoint, or None if there is none. mirror_factory builds the
        engine's configured mirror type per shard (RAM/mmap, f32/int8);
        the default builds plain RAM f32 mirrors from config."""
        path = self.latest()
        if path is None:
            return None
        with open(os.path.join(path, "MANIFEST.json")) as f:
            manifest = json.load(f)
        if manifest["dim"] != config.vector_dim:
            raise errors.CheckpointError(
                f"checkpoint dim {manifest['dim']} != configured {config.vector_dim}"
            )
        kv_path = os.path.join(path, "docstore.kv")
        if manifest.get("docstore") == "kv" or os.path.exists(kv_path):
            docstore = DocStore.load_native_file(
                kv_path, backend=config.docstore_backend)
        else:
            docstore = DocStore.load(os.path.join(path, "docstore.msgpack"),
                                     backend=config.docstore_backend)
        if mirror_factory is None:
            def mirror_factory(i, _cfg=config):
                return ShardMirror(dim=_cfg.vector_dim,
                                   capacity=_cfg.shard_capacity,
                                   init_cap=_cfg.mirror_init_cap, block=128,
                                   dtype=_cfg.mirror_dtype)
        mirrors = []
        for i in range(manifest["num_shards"]):
            m = mirror_factory(i)
            self._restore_shard(path, i, m)
            mirrors.append(m)
        with open(os.path.join(path, "wal_pos.txt")) as f:
            wal_pos = int(f.read().strip())
        return docstore, mirrors, wal_pos

    def _restore_shard(self, path: str, i: int, m: ShardMirror) -> None:
        z = np.load(os.path.join(path, f"shard_{i}.npz"), allow_pickle=False)
        if "fmt" not in z:  # format-1 checkpoint: f32 rows inline
            n = int(z["next_slot"])
            m.load_f32(z["vectors"], z["valid"], n, int(z["deleted"]))
            return
        n = int(z["n"])
        deleted = int(z["deleted"])
        valid = z["valid"]
        dtype = str(z["dtype"])
        same_dtype = dtype == m.dtype
        if "linked" in z:
            linked = json.loads(str(z["linked"]))
            srcs = {part: os.path.join(path, name)
                    for part, name in linked.items()}
            file_rows = int(z["file_rows"])
            if (same_dtype and m.mmap_backed
                    and m.valid.shape[0] == file_rows):
                # fast path: hardlink the checkpoint's files straight in —
                # restore is O(1) in corpus size
                m.adopt_checkpoint_files(srcs, n, deleted, valid)
                return
            # geometry/dtype/backing mismatch: read the raw files
            qdtype = np.int8 if dtype == "int8" else np.float32
            vec = np.memmap(srcs["vec"], dtype=qdtype, mode="r",
                            shape=(file_rows, m.dim))[:n]
            sq = np.memmap(srcs["sq"], dtype=np.float32, mode="r",
                           shape=(file_rows,))[:n]
            scale = (np.memmap(srcs["scale"], dtype=np.float32, mode="r",
                               shape=(file_rows,))[:n]
                     if "scale" in srcs else None)
        else:
            vec = z["vectors"]
            sq = z["sqnorms"]
            scale = z["scales"] if "scales" in z else None
        if same_dtype:
            m.load_raw(vec, scale, sq, valid, n, deleted)
        elif dtype == "int8":  # int8 checkpoint -> f32 mirror: dequantize
            f32 = (np.asarray(vec, np.float32)
                   * np.asarray(scale, np.float32)[:, None]) if n else vec
            m.load_f32(f32, valid, n, deleted)
        else:  # f32 checkpoint -> int8 mirror: vectorized quantize
            m.load_f32(np.asarray(vec, np.float32), valid, n, deleted)

    def load_ivf_packed(self):
        """np.load mapping of the newest checkpoint's packed IVF device
        state (ivf_packed.npz), or None. Written by IVF-PQ engines with
        ivf_checkpoint_packed on (engine.save_checkpoint writes it into
        the tmp dir alongside docstore.kv); restart uploads it instead of
        re-running assign+encode over every mirror row."""
        path = self.latest()
        if path is None:
            return None
        p = os.path.join(path, "ivf_packed.npz")
        if not os.path.exists(p):
            return None
        try:
            # eager load into plain arrays: an open NpzFile would pin a
            # zip handle into the checkpoint dir for the engine's lifetime
            # (incl. past retention prunes); the dict is dropped by the
            # first rebuild either way
            with np.load(p) as z:
                return {k: z[k] for k in z.files}
        except Exception:
            return None  # torn/corrupt extras never block recovery

    def load_ivf_warm(self):
        """(centroids, trained_live, mut_at_train, mut_at_ckpt,
        pq_codebooks|None, pq_rotation|None, pq_err) of the newest
        checkpoint, or None (older checkpoints / flat engines)."""
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
            cb = z["pq_codebooks"] if "pq_codebooks" in z else None
            rot = z["pq_rotation"] if "pq_rotation" in z else None
            err = float(z["pq_err"]) if "pq_err" in z else 0.0
            return (z["centroids"], int(z["trained_live"]), mt, mc, cb,
                    rot, err)
        except Exception:
            return None  # torn/corrupt extras never block recovery
