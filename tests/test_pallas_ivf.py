"""Pallas IVF probe kernel (interpret mode) vs oracle on clustered data."""

import numpy as np
import pytest

import jax.numpy as jnp

from tpuvdb.index.ivf import IVFIndex
from tpuvdb.kernels.distance import numpy_oracle
from tpuvdb.kernels.pallas_ivf import pallas_ivf_search


@pytest.mark.parametrize("force_compact", [False, True])
def test_pallas_ivf_matches_oracle(rng, force_compact):
    # clustered corpus -> IVF layout via IVFIndex.build, probe via pallas;
    # both hybrid prefetch branches (expanded / compact) face the oracle
    centers = rng.standard_normal((16, 32)) * 5
    data = np.concatenate([
        centers[i] + 0.3 * rng.standard_normal((128, 32)) for i in range(16)
    ]).astype(np.float32)
    valid = np.ones(len(data), bool)
    idx = IVFIndex.build(data, valid, nlist=16, nprobe=16, kmeans_iters=8)
    assert idx.stats().spill_rows == 0  # this test covers the main region

    q = data[rng.choice(len(data), 16, replace=False)] + \
        0.05 * rng.standard_normal((16, 32)).astype(np.float32)
    _, oidx = numpy_oracle(q, data, valid, 10)

    def run(nprobe):
        dist, gid = pallas_ivf_search(
            jnp.asarray(q), idx.centroids, idx.grouped, idx.grouped_sq,
            idx.grouped_valid, cell_pad=idx.cell_pad, k=10, nprobe=nprobe,
            query_tile=8, n_buckets=128, interpret=True,
            cell_offsets=idx.cell_offsets, force_compact=force_compact,
        )
        gid = np.asarray(gid)
        rows = np.where(gid >= 0, idx.row_ids[np.clip(gid, 0, None)], -1)
        rec = np.mean([
            len(set(rows[i][rows[i] >= 0]) & set(oidx[i])) / 10
            for i in range(16)
        ])
        return np.asarray(dist), rows, rec

    # pruned probe: decent recall; full probe: near-exhaustive
    _, _, rec8 = run(8)
    assert rec8 >= 0.75, rec8
    dist, rows, rec16 = run(16)
    assert rec16 >= 0.95, rec16
    for i in range(4):
        for j in range(10):
            if rows[i, j] >= 0:
                true = float(np.sum((q[i] - data[rows[i, j]]) ** 2))
                assert abs(true - dist[i, j]) < 1e-2


@pytest.mark.parametrize("force_compact", [False, True])
def test_pallas_ivf_wide_fetch_beyond_128(rng, force_compact):
    """Review finding (round 2): the packed path's 128-slot chunks capped
    distinct candidates at 128/query; segment rotation must serve k > 128
    (the int8 rescore fetch / staged-delete padding regime) with real,
    deduped candidates — on BOTH hybrid prefetch branches."""
    centers = rng.standard_normal((8, 16)) * 5
    data = np.concatenate([
        centers[i] + 0.3 * rng.standard_normal((128, 16)) for i in range(8)
    ]).astype(np.float32)
    valid = np.ones(len(data), bool)
    idx = IVFIndex.build(data, valid, nlist=8, nprobe=8, kmeans_iters=8)

    k = 200
    q = data[:4] + 0.05 * rng.standard_normal((4, 16)).astype(np.float32)
    dist, gid = pallas_ivf_search(
        jnp.asarray(q), idx.centroids, idx.grouped, idx.grouped_sq,
        idx.grouped_valid, cell_pad=idx.cell_pad, k=k, nprobe=8,
        query_tile=4, interpret=True, cell_offsets=idx.cell_offsets,
        spill=idx.spill, spill_sq=idx.spill_sq, spill_valid=idx.spill_valid,
        force_compact=force_compact,
    )
    gid, dist = np.asarray(gid), np.asarray(dist)
    for i in range(4):
        live = gid[i][gid[i] >= 0]
        assert len(live) > 128, f"only {len(live)} candidates (old cap)"
        assert len(set(live.tolist())) == len(live), "duplicate candidates"
        # full-probe top-k matches the oracle head
        _, oidx = numpy_oracle(q[i:i+1], data, valid, 64)
        rows = np.where(gid[i] >= 0, idx.row_ids[np.clip(gid[i], 0, None)], -1)
        rec = len(set(rows[:64][rows[:64] >= 0]) & set(oidx[0])) / 64
        assert rec >= 0.95, rec


@pytest.mark.parametrize("force_compact,cps,approx", [
    (False, 32, False),   # wide chunks-per-step, expanded prefetch
    (True, 16, False),    # wide cps on the compact branch
    (False, None, True),  # approx_max_k coarse pick
    (False, 32, True),    # both b1 levers together
])
def test_pallas_ivf_b1_levers_match_oracle(rng, force_compact, cps, approx):
    """The small-batch latency levers (cps_override, coarse_approx) must
    preserve scan exactness; recall bound matches the base oracle test
    (approx_max_k may perturb WHICH cells are probed, nprobe=16 of 16
    cells keeps the probe exhaustive so recall is identical here)."""
    centers = rng.standard_normal((16, 32)) * 5
    data = np.concatenate([
        centers[i] + 0.3 * rng.standard_normal((128, 32)) for i in range(16)
    ]).astype(np.float32)
    valid = np.ones(len(data), bool)
    idx = IVFIndex.build(data, valid, nlist=16, nprobe=16, kmeans_iters=8)
    q = data[rng.choice(len(data), 16, replace=False)] + \
        0.05 * rng.standard_normal((16, 32)).astype(np.float32)
    _, oidx = numpy_oracle(q, data, valid, 10)
    dist, gid = pallas_ivf_search(
        jnp.asarray(q), idx.centroids, idx.grouped, idx.grouped_sq,
        idx.grouped_valid, cell_pad=idx.cell_pad, k=10, nprobe=16,
        query_tile=8, n_buckets=128, interpret=True,
        cell_offsets=idx.cell_offsets, force_compact=force_compact,
        cps_override=cps, coarse_approx=approx,
    )
    gid, dist = np.asarray(gid), np.asarray(dist)
    rows = np.where(gid >= 0, idx.row_ids[np.clip(gid, 0, None)], -1)
    rec = np.mean([
        len(set(rows[i][rows[i] >= 0]) & set(oidx[i])) / 10
        for i in range(16)
    ])
    assert rec >= 0.95, rec
    for i in range(4):
        for j in range(10):
            if rows[i, j] >= 0:
                true = float(np.sum((q[i] - data[rows[i, j]]) ** 2))
                assert abs(true - dist[i, j]) < 1e-2


def test_pallas_ivf_masks_deleted(rng):
    data = rng.standard_normal((512, 16)).astype(np.float32)
    valid = np.ones(512, bool)
    idx = IVFIndex.build(data, valid, nlist=4, nprobe=4, kmeans_iters=5)
    idx.invalidate_rows(np.array([7]))
    q = data[7:8]
    dist, gid = pallas_ivf_search(
        jnp.asarray(q), idx.centroids, idx.grouped, idx.grouped_sq,
        idx.grouped_valid, cell_pad=idx.cell_pad, k=1, nprobe=4,
        query_tile=1, n_buckets=128, interpret=True,
            cell_offsets=idx.cell_offsets,
    )
    gid = int(np.asarray(gid)[0, 0])
    assert gid < 0 or idx.row_ids[gid] != 7


def test_pallas_ivf_empty_query_batch_raises(rng):
    """An empty query batch must raise a clear ValueError, not the cryptic
    ZeroDivisionError the tile reshape produced during tracing."""
    data = rng.standard_normal((512, 16)).astype(np.float32)
    valid = np.ones(512, bool)
    idx = IVFIndex.build(data, valid, nlist=4, nprobe=4, kmeans_iters=3)
    with pytest.raises(ValueError, match="empty query batch"):
        pallas_ivf_search(
            jnp.zeros((0, 16), jnp.float32), idx.centroids, idx.grouped,
            idx.grouped_sq, idx.grouped_valid, cell_pad=idx.cell_pad,
            k=4, nprobe=4, interpret=True, cell_offsets=idx.cell_offsets,
            spill=idx.spill, spill_sq=idx.spill_sq,
            spill_valid=idx.spill_valid)
