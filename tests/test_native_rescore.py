"""Fused native exact-rescore epilogue vs the numpy formulation.

The serving-path rescore (engine._rescore_exact) re-ranks device
candidates by exact distance from the shard mirrors. The native kernels
(src/tpuvdb_native.cpp rescore_rows_*) must reproduce the numpy
gather+GEMM path bit-closely on both mirror dtypes, including missing
candidates (-1 rows) and multi-shard candidate sets.

Reference role: the exact-refine stage that restores true ordering over
the int8/PQ probe's overfetched candidates (the reference serves
approximate hnswlib order directly, handler.py search).
"""

import types

import numpy as np
import pytest

from tpuvdb import native
from tpuvdb.engine.engine import VectorDBEngine
from tpuvdb.index.layout import ShardMirror

pytestmark = pytest.mark.skipif(
    not native.rescore_available(), reason="native rescore unavailable")


def _mk_mirror(dtype, rng, n, d):
    m = ShardMirror(d, capacity=4 * n, init_cap=4 * n, dtype=dtype)
    m.alloc(n)
    m.write_batch(0, rng.standard_normal((n, d)).astype(np.float32))
    return m


@pytest.mark.parametrize("dtype", ["int8", "float32"])
def test_rescore_into_matches_rows_f32(dtype):
    rng = np.random.default_rng(7)
    n, d, Q, F = 300, 96, 4, 16
    m = _mk_mirror(dtype, rng, n, d)
    q = np.ascontiguousarray(
        rng.standard_normal((Q, d)).astype(np.float32))
    qsq = np.einsum("qd,qd->q", q, q).astype(np.float32)
    slots = rng.integers(0, n, Q * F).astype(np.int64)
    opos = np.arange(Q * F, dtype=np.int64)
    out = np.full(Q * F, np.inf, np.float32)
    m.rescore_into(q, qsq, F, slots, opos, out)

    vecs = m.rows_f32(slots)
    want = (qsq[:, None]
            - 2.0 * np.einsum("qfd,qd->qf", vecs.reshape(Q, F, d), q)
            + np.einsum("nd,nd->n", vecs, vecs).reshape(Q, F))
    np.testing.assert_allclose(out.reshape(Q, F), want, rtol=2e-4,
                               atol=2e-3)


@pytest.mark.parametrize("dtype", ["int8", "float32"])
def test_engine_rescore_exact_native_vs_numpy(dtype, monkeypatch):
    """_rescore_exact's native branch reproduces the numpy branch through
    the full method: multi-shard split, -1 (missing) candidates kept at
    +inf, and the final stable sort order."""
    rng = np.random.default_rng(3)
    n, d, Q, F = 200, 64, 3, 20
    stub = types.SimpleNamespace(
        mirrors=[_mk_mirror(dtype, rng, n, d) for _ in range(2)])
    layout = types.SimpleNamespace(phys_cap=stub.mirrors[0].phys_cap)
    pc = layout.phys_cap
    q = rng.standard_normal((Q, d)).astype(np.float32)
    rows = rng.integers(0, n, (Q, F)).astype(np.int64)
    rows += (rng.integers(0, 2, (Q, F)) * pc)  # scatter across shards
    rows[0, 3] = -1
    rows[2, 0] = -1

    d_nat, r_nat = VectorDBEngine._rescore_exact(stub, q, rows, layout)
    monkeypatch.setattr(native, "rescore_available", lambda: False)
    d_np, r_np = VectorDBEngine._rescore_exact(stub, q, rows, layout)

    np.testing.assert_allclose(d_nat, d_np, rtol=2e-4, atol=2e-3)
    # only genuine near-ties may reorder between the two formulations:
    # a position whose sorted distance is separated from BOTH neighbors
    # by more than the float tolerance must hold the identical row
    # (advisor r4: the old >0.95 mean let a real rank bug on a few rows
    # per batch pass silently)
    tol = 2e-3 + 2e-4 * np.abs(d_np[np.isfinite(d_np)]).max()
    for qi in range(Q):
        dq = d_np[qi]
        gap_lo = np.empty(F, bool)
        gap_hi = np.empty(F, bool)
        gap_lo[0] = True
        gap_lo[1:] = ~np.isclose(dq[1:], dq[:-1], atol=tol, rtol=0)
        gap_hi[-1] = True
        gap_hi[:-1] = gap_lo[1:]
        sep = gap_lo & gap_hi & np.isfinite(dq)
        assert (r_nat[qi][sep] == r_np[qi][sep]).all()
    # every position agrees as a SET within each tie group: sort both
    # row lists and compare (ties permute inside equal-distance runs)
    assert (np.sort(r_nat, axis=1) == np.sort(r_np, axis=1)).all()
    # missing candidates stay +inf and sort last
    assert np.isinf(d_nat[0, -1]) and np.isinf(d_nat[2, -1])


@pytest.mark.parametrize("dtype", ["int8", "float32"])
def test_rescore_bounds_violation_writes_inf(dtype):
    """rescore2_* bounds checks (advisor r4): an out-of-range slot must
    write +inf (not read OOB heap); an out-of-range opos is skipped."""
    rng = np.random.default_rng(11)
    n, d, Q, F = 64, 32, 2, 8
    m = _mk_mirror(dtype, rng, n, d)
    q = np.ascontiguousarray(rng.standard_normal((Q, d)).astype(np.float32))
    qsq = np.einsum("qd,qd->q", q, q).astype(np.float32)
    slots = rng.integers(0, n, Q * F).astype(np.int64)
    slots[0] = m.phys_cap + 10_000_000  # way past the physical rows
    slots[1] = -5
    opos = np.arange(Q * F, dtype=np.int64)
    opos[2] = Q * F + 99  # out-of-range output: skipped, no crash
    out = np.full(Q * F, np.inf, np.float32)
    m.rescore_into(q, qsq, F, slots, opos, out)
    assert np.isinf(out[0]) and np.isinf(out[1]) and np.isinf(out[2])
    assert np.isfinite(out[3:]).all()


def test_rescore_rejects_noncontiguous_inputs():
    """rescore_rows coerces/validates dtype+contiguity (advisor r4): a
    strided or float64 query can't silently feed garbage pointers."""
    rng = np.random.default_rng(4)
    n, d, Q, F = 32, 16, 2, 4
    m = _mk_mirror("float32", rng, n, d)
    q64 = rng.standard_normal((Q, 2 * d))[:, ::2]  # strided float64 view
    qsq = np.einsum("qd,qd->q", q64, q64).astype(np.float32)
    slots = rng.integers(0, n, Q * F).astype(np.int64)
    opos = np.arange(Q * F, dtype=np.int64)
    out = np.full(Q * F, np.inf, np.float32)
    m.rescore_into(np.ascontiguousarray(q64), qsq, F, slots, opos, out)
    want = out.copy()
    out2 = np.full(Q * F, np.inf, np.float32)
    m.rescore_into(q64, qsq, F, slots, opos, out2)  # coerced, same result
    np.testing.assert_allclose(out2, want, rtol=1e-6)
    with pytest.raises(ValueError):
        native.rescore_rows(
            np.ascontiguousarray(q64, np.float32), qsq, F,
            m._vec, None, m._sq, slots, opos,
            np.full(Q * F, np.inf, np.float64))  # wrong out dtype
