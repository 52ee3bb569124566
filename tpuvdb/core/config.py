"""Configuration for tpuvdb.

The reference uses flat star-imported constant modules (Config/__init__.py:5-17,
Config/{storage,rpc,zk}_config.py). Here config is one typed dataclass with the
same defaults where they carry semantics (VECTOR_DIM=512, SHARD_COUNT=4,
REPLICA_COUNT=2 — Config/storage_config.py:1-4; WAL rotation 10 MB / 7 days —
src/utils/wal_manager.py:22-23; checkpoint every 2k puts, compaction every 200k —
src/datanode/handler.py:313-317), plus TPU-native knobs (dtype, block sizes,
mesh shape) the reference has no analog for.

Env-var overrides use the prefix TPUVDB_, e.g. TPUVDB_VECTOR_DIM=128.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional, Tuple


def _env(name: str, default, cast):
    v = os.environ.get(f"TPUVDB_{name}")
    if v is None:
        return default
    if cast is bool:
        return v.lower() in ("1", "true", "yes", "on")
    return cast(v)


@dataclasses.dataclass
class DBConfig:
    # -- storage semantics (reference parity) --
    vector_dim: int = 512          # Config/storage_config.py:2
    shard_count: int = 4           # Config/storage_config.py:3
    replica_count: int = 2         # Config/storage_config.py:4 (hollow in ref; real here)
    # federated writes: total acks required before a put/delete returns
    # (1 = master only, matching the reference's declared-but-hollow
    # replication; >=2 waits for replica acks -> bounded durability window)
    write_acks: int = 1
    # every shard-map rebuild opens the broadcast-on-miss window (routes
    # moved, data didn't); the coordinator auto-runs a debounced
    # background sync_all to close it — without this, one offline/online
    # flap would leave every miss fanning out to all nodes forever.
    # 0 disables (operator-driven sync_all only, used by routing tests).
    rebalance_debounce_s: float = 3.0
    default_top_k: int = 5         # src/vector_db.thrift:25

    # -- durability --
    # False = bulk-load mode: mutations skip the WAL entirely (durability
    # comes from explicit checkpoints). Use for initial mass ingest — at
    # 8M x 768 the per-put f32 WAL payload alone is ~24 GB of log churn —
    # then flip back on for serving.
    wal_enabled: bool = True
    wal_max_bytes: int = 10 * 1024 * 1024   # src/utils/wal_manager.py:22
    wal_retention_days: int = 7             # src/utils/wal_manager.py:23
    wal_fsync: bool = True                  # fixed vs. ref (no fsync, clobbering rename)
    checkpoint_every_puts: int = 2000       # src/datanode/handler.py:316
    compact_every_puts: int = 200_000       # src/datanode/handler.py:313
    max_checkpoints: int = 3

    # -- TPU index layout --
    shard_capacity: int = 1 << 20  # slots per shard (ref: hnswlib max_elements=1M)
    mirror_init_cap: int = 16384   # initial physical rows/shard; size to the
                                   # expected corpus to avoid growth rebuilds
                                   # (each growth re-uploads + recompiles)
    block_size: int = 8192         # corpus rows per scan chunk (HBM->VMEM tile)
    query_block: int = 128         # query batch tile (MXU sublane-friendly)
    storage_dtype: str = "float32" # "float32" | "bfloat16" | "int8"
    # int8 storage: overfetch rescore_overfetch*k device candidates, then
    # re-rank them by EXACT f32 distance against the host mirrors. Int8
    # score noise (~2|q|*scale*sqrt(d/12)) swamps within-cluster margins on
    # tight shells; the rescore restores exact ordering over the candidate
    # set. 16 (fetch 160 at k=10) is cheap and covers SIFT-like margins;
    # adversarially tight shells (sigma ~0.15 around far centers) need
    # ~256 (fetch ~2.5k, the "overfetch-4k" regime) for recall ~1.0 —
    # still <1% extra HBM traffic vs the 1M-row scan. 0 disables.
    rescore_overfetch: int = 16
    # "exact"  — host re-rank against the f32 mirrors (recall ceiling 1.0;
    #            costs a host gather of rescore_overfetch*k rows per query).
    # "device" — fused on-device re-rank over DEQUANTIZED int8 rows (one
    #            XLA program, no host round-trip; recall ceiling = corpus
    #            quantization, ~0.97 on adversarial shells; measured 518k
    #            QPS vs ~5k for the host path at batch 256 on v5e).
    #            Flat indexes, single-device or mesh (each shard rescores
    #            before the collective merge); IVF keeps "exact".
    # "none"   — serve raw int8 scan scores.
    rescore_mode: str = "exact"
    flush_batch: int = 1024        # staged inserts per device flush
    # group-commit coalescing of CONCURRENT search_batch calls: while one
    # device call is in flight, arriving batches queue; the next caller
    # to take a per-(k, overfetch) leader slot stacks every queued batch
    # into ONE device call and splits the results (engine/coalesce.py).
    # DEFAULT OFF, set by measurement (BENCH_NOTES r5 "serving coalesce
    # A/B": at 1M x 128 / 8 streams, coalescing was a wash at b32
    # (2508 vs 2431 pipelined QPS) and -9% at b512 (27.2k vs 29.9k) —
    # the 8-stream load forms groups of 1, so stacking buys nothing and
    # the pow2 pad + slicing costs a little. Turn ON for many-stream
    # SMALL-batch serving over a high-dispatch-cost transport (e.g. b32
    # PQ probes through a ~25 ms-tick relay), which is the regime the
    # mechanism was built for.
    search_coalesce: bool = False
    search_coalesce_max: int = 4096  # max stacked queries per group
    # concurrent stacked device calls per group key: overlap vs stacking
    # (coalesce.py module doc; 1 = the r4 serialize-all-groups behavior)
    search_coalesce_inflight: int = 4
    search_mode: str = "approx"    # "approx" = hardware PartialReduce top-k
                                   # (recall@10 ~0.98, ~25x faster on TPU);
                                   # "exact" = bitwise-exact top-k merge
    recall_target: float = 0.95    # approx_max_k knob (BASELINE: recall>=0.95)

    # -- index selection --
    index_type: str = "flat"       # "flat" (approx_max_k scan) | "ivf"
    docstore_backend: str = "auto"    # "python" dict | "native" C++ KV
                                      # (LevelDB-role store for 100M keys) |
                                      # "auto" = native when the .so builds,
                                      # python otherwise

    # -- host mirror storage (capacity mode) --
    # "float32" keeps the classic exact f32 host mirror (4 bytes/dim).
    # "int8" stores quantized rows + per-row scale/sqnorm (1 byte/dim):
    # the host-RSS analog of storage_dtype=int8 — required to OPERATE at
    # the kernel-proven 8M x 768 scale (a f32 mirror alone is 24.5 GB
    # there). get()/rescore dequantize; pair with storage_dtype="int8".
    mirror_dtype: str = "float32"
    # "ram" = numpy arrays; "mmap" = disk-backed vector files under
    # data_dir (native VectorFile, np.memmap fallback) so host RSS stays
    # O(touched pages) and checkpoints hardlink instead of copying — the
    # disk-backed role LevelDB plays in the reference
    # (src/datanode/handler.py:50). "auto" = mmap when data_dir is set.
    mirror_backend: str = "ram"

    # -- IVF --
    ivf_nlist: int = 1024
    ivf_nprobe: int = 32
    ivf_kmeans_iters: int = 12
    ivf_train_sample: int = 262_144
    ivf_delta_max: int = 16384     # fresh inserts before re-clustering
    # >0: IVF-PQ — cells store M-byte product-quantization codes instead
    # of rows (d/M x below int8; the 30-100M rows/chip capacity tier).
    # Must divide vector_dim. ADC distances rank reconstructions, so pair
    # with rescore_overfetch (exact host re-rank restores true ordering).
    ivf_pq_subq: int = 0
    # OPQ: learn an orthogonal rotation of the residual space alongside
    # the PQ codebooks (Ge et al.) — better recall per code byte on
    # correlated embeddings (CLIP-like) at the cost of one extra (d, d)
    # GEMM per query batch. Requires ivf_pq_subq > 0.
    ivf_opq: bool = False
    # 8 (default) or 4: the fast-scan tier packs TWO 4-bit codes per
    # stored byte (2*subq half-width subspaces, 16-entry codebooks) —
    # same bytes/row, ~8x less ADC compute (the probe's bottleneck),
    # slightly coarser codes (the exact re-rank recovers ordering).
    ivf_pq_bits: int = 8
    # PQ needs a DEEPER exact re-rank window than int8: per-row int8
    # error is ~1e-3 relative, but ADC distance error at M=96/768-d is
    # comparable to the gap between the 10th and 100th neighbor on tight
    # clusters. Measured on the 8M x 768 capacity corpus (diag_pq_recall,
    # nprobe 64): recall@10 0.72 at overfetch 10, 0.93 at 40, 0.99 at
    # 100. PQ searches use max(this, rescore_overfetch); candidates stay
    # ~64*k rows/query of host gather — microseconds against the probe.
    ivf_pq_rescore_overfetch: int = 64
    # Adaptive exact-rescore window: the probe's candidate list is
    # ADC-ordered and ADC scores the RECONSTRUCTION exactly, so with a
    # calibrated reconstruction-error quantile E (pq.calibrate_pq_err,
    # stored on the index and in checkpoints) the true distance obeys
    # d >= (sqrt(d_adc) - E)^2. The host re-rank exacts the first 4k
    # candidates, then only those whose bound undercuts the running kth
    # exact distance — typically a small fraction of the 64k-wide fixed
    # window, which is the serving-path difference between a ~0.5 MB and
    # a ~50 KB random host gather per query at 768-d. False-skip mass is
    # the calibration tail (1e-3 quantile); disable to force the full
    # fixed window.
    ivf_pq_adaptive_rescore: bool = True
    # Checkpoint the packed IVF-PQ device state (code cells + slot maps)
    # so restart is ONE HBM upload + an append of the replayed WAL tail,
    # instead of re-running assign+encode over every mirror row (778 s at
    # 8M x 768 — BENCH_NOTES "Restart re-encodes the world"). PQ-only:
    # PQ codes are M bytes/row (0.78 GiB at capacity) where int8/f32 cell
    # tables are ~D bytes/row (5.7+ GiB) — the checkpoint fetch+write and
    # the restart upload scale the same way, and the int8 tier's restart
    # pays only an assignment pass, not an encode.
    ivf_checkpoint_packed: bool = True

    # -- mesh --
    mesh_shape: Optional[Tuple[int, ...]] = None  # None = all local devices on one axis
    mesh_axis: str = "shards"

    # -- serving --
    http_host: str = "127.0.0.1"
    http_port: int = 8000          # clip/backend.py:60
    rpc_port: int = 8081           # coordinator port, Config/rpc_config.py:2
    rpc_timeout_s: float = 20.0    # Config/rpc_config.py:5
    health_check_interval_s: float = 5.0  # src/utils/zk_manager.py:78

    # -- paths --
    # None = in-memory (no WAL/checkpoints). The engine honors this when no
    # explicit data_dir ctor arg is given; previously this field was dead
    # and DBConfig(data_dir=...) silently produced a non-durable engine.
    data_dir: Optional[str] = None

    def __post_init__(self):
        # env overrides
        for f in dataclasses.fields(self):
            if f.name in ("mesh_shape",):
                continue
            cur = getattr(self, f.name)
            cast = type(f.default) if f.default is not None else str
            if isinstance(cur, bool):
                cast = bool
            setattr(self, f.name, _env(f.name.upper(), cur, cast))
        if self.block_size % 128 != 0:
            raise ValueError("block_size must be a multiple of 128 (TPU lane width)")
        # enum-ish fields: a typo'd value ("Device", "fused") would
        # otherwise silently degrade to a fallback path with no error
        _valid = {
            "rescore_mode": ("exact", "device", "none"),
            "search_mode": ("approx", "exact", "pallas"),
            "index_type": ("flat", "ivf"),
            "storage_dtype": ("float32", "bfloat16", "int8"),
            "docstore_backend": ("python", "native", "auto"),
            "mirror_dtype": ("float32", "int8"),
            "mirror_backend": ("ram", "mmap", "auto"),
        }
        for field_name, allowed in _valid.items():
            v = getattr(self, field_name)
            if v not in allowed:
                raise ValueError(
                    f"{field_name}={v!r} invalid; must be one of {allowed}")
        if self.ivf_pq_rescore_overfetch < 0:
            raise ValueError("ivf_pq_rescore_overfetch must be >= 0 "
                             "(0 = fall back to rescore_overfetch)")
        if self.ivf_pq_subq < 0 or (
                self.ivf_pq_subq and self.vector_dim % self.ivf_pq_subq):
            raise ValueError(
                f"ivf_pq_subq={self.ivf_pq_subq} must be >= 0 and divide "
                f"vector_dim={self.vector_dim}")
        if self.ivf_pq_subq and self.storage_dtype == "int8":
            raise ValueError(
                "ivf_pq_subq and storage_dtype='int8' are exclusive: PQ "
                "cells already compress below int8 (host mirrors may still "
                "be int8 via mirror_dtype)")
        if self.ivf_opq and not self.ivf_pq_subq:
            raise ValueError(
                "ivf_opq=True requires ivf_pq_subq > 0 (OPQ rotates the "
                "PQ residual space; there is nothing to rotate without PQ)")
        if self.ivf_pq_bits not in (8, 4):
            raise ValueError(
                f"ivf_pq_bits={self.ivf_pq_bits} must be 8 or 4")
        if (self.ivf_pq_subq and self.ivf_pq_bits == 4
                and self.vector_dim % (2 * self.ivf_pq_subq)):
            raise ValueError(
                f"ivf_pq_bits=4 needs 2*ivf_pq_subq={2 * self.ivf_pq_subq} "
                f"subspaces to divide vector_dim={self.vector_dim}")

    # -- serialization (stored inside checkpoints so restores validate shape) --
    def to_json(self) -> str:
        d = dataclasses.asdict(self)
        d["mesh_shape"] = list(self.mesh_shape) if self.mesh_shape else None
        return json.dumps(d, indent=2, sort_keys=True)

    @classmethod
    def from_json(cls, s: str) -> "DBConfig":
        d = json.loads(s)
        if d.get("mesh_shape"):
            d["mesh_shape"] = tuple(d["mesh_shape"])
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})

    def jnp_dtype(self):
        import jax.numpy as jnp

        return {
            "float32": jnp.float32,
            "bfloat16": jnp.bfloat16,
            "int8": jnp.int8,
        }[self.storage_dtype]
