"""Product quantization (PQ) — capacity beyond int8.

The int8 path (kernels/quant.py) stores 1 byte/dim: 8M x 768 rows fill
5.7 GiB of v5e HBM. PQ compresses a d-dim row to M bytes (one uint8 code
per d/M-dim subspace, 256-entry codebook each), i.e. d/M x smaller than
int8 — 30M x 768 rows at M=96 are 2.9 GiB of codes, 100M fit a v5p chip.
This is the capacity tier BASELINE config 5 (LAION-100M CLIP 768-d)
points at, beyond the reference's single-node hnswlib ceiling of 1M rows
(max_elements, /root/reference/src/datanode/handler.py:86).

TPU-native design notes (why this is NOT the CPU ADC from FAISS):
  * Codebook training is one batched-Lloyd program: all M subspaces train
    simultaneously (assignment = one einsum on the MXU, update = one
    segment-sum over combined (m, j) segment ids), streamed with lax.scan
    so memory stays O(block).
  * Encoding is the same assignment einsum, blockwise; reconstruction
    norms come free as sums of per-subspace codeword norms (subspaces are
    orthogonal coordinate blocks, so ||x_hat||^2 = sum_m ||c_m||^2).
  * ADC scanning has no gather on the hot path: scores are computed as
    one bf16 GEMM between the per-query LUT, flattened to (Q, M*256),
    and a one-hot expansion of the code block, (B, M*256) — built by an
    iota-compare on the VPU. The MXU contracts over M*256; accumulation
    is f32. This trades d -> M*256 contraction FLOPs for the 256-entry
    table gathers a TPU cannot do efficiently; at serving batch sizes the
    scan stays HBM-bound on the 1-byte/subspace code stream.
  * Exact distances to the RECONSTRUCTION: d(q, x_hat)^2 = ||q||^2
    - 2 q.x_hat + ||x_hat||^2 where q.x_hat = sum_m LUT[m, code_m] is
    exact (up to bf16 GEMM rounding); the only approximation is the
    quantization x -> x_hat itself. Recall is recovered by overfetch +
    exact re-rank from the host mirror (the engine's existing int8
    rescore machinery).

No reference analog: the reference has no quantization at all (f32
hnswlib, src/datanode/handler.py:46); this is a beyond-parity capacity
feature.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tpuvdb.kernels import topk as tk


def _check_dims(d: int, m_subq: int) -> int:
    if m_subq <= 0 or d % m_subq != 0:
        raise ValueError(f"m_subq={m_subq} must divide dim={d}")
    return d // m_subq


# --------------------------------------------------------------------------
# 4-bit nibble packing (fast-scan tier)
#
# Same storage bytes as 8-bit PQ — each byte packs TWO 4-bit codes over
# TWO half-width subspaces (even subspace = low nibble) — but the ADC
# one-hot is 16 wide instead of 256: 8x fewer VPU compares and an 8x
# narrower MXU contraction. The probe is compute-bound on exactly those
# two costs (the code stream is tiny), so 4-bit trades a little
# quantization fidelity (recovered by the exact re-rank) for large scan
# throughput. Codebook shape disambiguates the mode everywhere:
# (M2, 16, d/M2) is 4-bit with M2 = 2 * bytes/row; (M, 256, d/M) is 8-bit.
# --------------------------------------------------------------------------


def pq_n_codes(codebooks) -> int:
    return int(codebooks.shape[1])


def pq_code_bytes(codebooks) -> int:
    """Stored bytes per row for this codebook shape."""
    m2, j = int(codebooks.shape[0]), int(codebooks.shape[1])
    if j == 16:
        if m2 % 2:
            raise ValueError("4-bit codebooks need an even subspace count")
        return m2 // 2
    return m2


def pack_nibbles_np(codes: np.ndarray) -> np.ndarray:
    """(n, 2M) per-subspace 4-bit codes -> (n, M) packed bytes."""
    lo = codes[:, 0::2].astype(np.uint8)
    hi = codes[:, 1::2].astype(np.uint8)
    return (lo | (hi << 4)).astype(np.uint8)


def unpack_nibbles_np(packed: np.ndarray) -> np.ndarray:
    """(n, M) packed bytes -> (n, 2M) per-subspace codes."""
    p = np.asarray(packed, np.uint8)
    out = np.empty(p.shape[:-1] + (2 * p.shape[-1],), np.uint8)
    out[..., 0::2] = p & 15
    out[..., 1::2] = p >> 4
    return out


def _pack_nibbles(codes: jax.Array) -> jax.Array:
    """jnp twin of pack_nibbles_np; codes (..., 2M) int -> (..., M) u8."""
    lo = codes[..., 0::2].astype(jnp.uint8)
    hi = codes[..., 1::2].astype(jnp.uint8)
    return lo | (hi << 4)


def _unpack_nibbles(packed: jax.Array) -> jax.Array:
    """(..., M) u8/i32 -> (..., 2M) i32 in subspace order."""
    p = packed.astype(jnp.int32)
    lo = p & 15
    hi = p >> 4
    return jnp.stack([lo, hi], axis=-1).reshape(p.shape[:-1]
                                                + (2 * p.shape[-1],))


def _maybe_pack(codes: jax.Array, n_codes: int) -> jax.Array:
    return _pack_nibbles(codes) if n_codes == 16 else codes.astype(jnp.uint8)


def _maybe_unpack(codes: jax.Array, n_codes: int) -> jax.Array:
    return _unpack_nibbles(codes) if n_codes == 16 else codes.astype(jnp.int32)


# --------------------------------------------------------------------------
# training: batched Lloyd over all M subspaces in one program
# --------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("block",))
def _pq_assign_block_scores(chunk_sub: jax.Array, codebooks: jax.Array,
                            block: int) -> jax.Array:
    """(B, M) nearest-codeword ids for chunk_sub (B, M, dsub). Generic in
    the codebook width J (256 for 8-bit, 16 for the 4-bit tier)."""
    c_sq = jnp.sum(codebooks * codebooks, axis=-1)  # (M, J)
    scores = (
        2.0
        * jnp.einsum("bms,mjs->bmj", chunk_sub, codebooks,
                     preferred_element_type=jnp.float32)
        - c_sq[None, :, :]
    )
    return jnp.argmax(scores, axis=-1).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("block",))
def _pq_lloyd_step(data_sub: jax.Array, valid: jax.Array,
                   codebooks: jax.Array, block: int):
    """One Lloyd iteration over all subspaces. data_sub: (n, M, dsub),
    n % block == 0. Returns (new_codebooks, mean_shift)."""
    n, m_subq, dsub = data_sub.shape
    n_codes = codebooks.shape[1]
    nseg = m_subq * n_codes
    seg_base = jnp.arange(m_subq, dtype=jnp.int32) * n_codes  # (M,)

    def body(carry, i):
        sums, counts = carry
        chunk = jax.lax.dynamic_slice_in_dim(data_sub, i * block, block)
        v = jax.lax.dynamic_slice_in_dim(valid, i * block, block)
        assign = _pq_assign_block_scores(chunk, codebooks, block)  # (B, M)
        seg = (assign + seg_base[None, :]).reshape(-1)  # (B*M,)
        w = v.astype(jnp.float32)
        flat = (chunk * w[:, None, None]).reshape(-1, dsub)
        sums = sums + jax.ops.segment_sum(flat, seg, num_segments=nseg)
        counts = counts + jax.ops.segment_sum(
            jnp.broadcast_to(w[:, None], (block, m_subq)).reshape(-1),
            seg, num_segments=nseg)
        return (sums, counts), None

    init = (jnp.zeros((nseg, dsub), jnp.float32), jnp.zeros((nseg,), jnp.float32))
    (sums, counts), _ = jax.lax.scan(
        body, init, jnp.arange(n // block, dtype=jnp.int32))
    sums = sums.reshape(m_subq, n_codes, dsub)
    counts = counts.reshape(m_subq, n_codes)
    new = jnp.where(counts[:, :, None] > 0,
                    sums / jnp.maximum(counts, 1.0)[:, :, None], codebooks)
    shift = jnp.mean(jnp.linalg.norm(new - codebooks, axis=-1))
    return new, shift


def train_pq(
    sample: np.ndarray,
    m_subq: int,
    iters: int = 15,
    block: int = 4096,
    seed: int = 0,
    init: Optional[np.ndarray] = None,
    n_codes: int = 256,
) -> np.ndarray:
    """Train per-subspace codebooks on a sample. Returns
    (M, n_codes, dsub) f32 — n_codes 256 for the 8-bit tier, 16 for the
    4-bit fast-scan tier (where m_subq = 2 * bytes/row).

    The sample should be a few hundred rows per codeword (e.g. 100-300k
    rows); training streams in `block`-row chunks so device memory stays
    O(block * M * n_codes). `init` warm-starts Lloyd from existing
    codebooks (the OPQ alternation refines rather than retrains)."""
    sample = np.asarray(sample, np.float32)
    n, d = sample.shape
    dsub = _check_dims(d, m_subq)
    if n == 0:
        raise ValueError("train_pq on empty sample")

    rng = np.random.default_rng(seed)
    if init is not None and init.shape == (m_subq, n_codes, dsub):
        cents = np.asarray(init, np.float32)
    else:
        # init: random sample rows per subspace (independent draws
        # decorrelate the subspace codebooks even when n < n_codes)
        take = rng.integers(0, n, size=(m_subq, n_codes))
        cents = sample.reshape(n, m_subq, dsub)[take,
                                                np.arange(m_subq)[:, None], :]
        # jitter duplicates so Lloyd can separate them
        cents = cents + rng.standard_normal(cents.shape).astype(np.float32) * 1e-5

    pad = (-n) % block
    if pad:
        sample = np.concatenate([sample, np.zeros((pad, d), np.float32)])
    valid = np.zeros(n + pad, bool)
    valid[:n] = True

    data_sub = jnp.asarray(sample.reshape(-1, m_subq, dsub))
    valid_j = jnp.asarray(valid)
    codebooks = jnp.asarray(cents, jnp.float32)
    for _ in range(iters):
        codebooks, shift = _pq_lloyd_step(data_sub, valid_j, codebooks,
                                          block=block)
        if float(shift) < 1e-7:
            break
    return np.asarray(codebooks)


@jax.jit
def _opq_cross_cov(x: jax.Array, y_hat: jax.Array) -> jax.Array:
    """(d, d) cross-covariance X^T Y_hat for the Procrustes step — one
    MXU GEMM over the training sample."""
    return jnp.dot(x.T, y_hat, preferred_element_type=jnp.float32)


def train_opq(
    sample: np.ndarray,
    m_subq: int,
    iters: int = 15,
    opq_iters: int = 8,
    block: int = 4096,
    seed: int = 0,
    n_codes: int = 256,
) -> Tuple[np.ndarray, np.ndarray]:
    """OPQ (optimized PQ): learn an orthogonal rotation R that aligns the
    data with the PQ subspace grid before coding. Returns
    (codebooks (M, n_codes, dsub), rotation (d, d)) — codebooks live in
    the ROTATED space; encode rows as (x @ R), build query LUTs from
    (q @ R).

    Non-parametric OPQ alternation (Ge et al., CVPR'13 — reimplemented
    from the paper's two-step structure, no reference-code lineage):
      1. fix R: refine codebooks on Y = X @ R (warm-started Lloyd);
      2. fix codebooks: encode Y -> Y_hat, solve the orthogonal
         Procrustes problem min_R ||X R - Y_hat||_F via SVD of
         X^T Y_hat = U S V^T, giving R = U V^T.
    Every GEMM (rotation, assignment, cross-covariance) runs on device;
    only the (d, d) SVD runs host-side (sub-ms at 768-d). Plain PQ is the
    R = I special case, so OPQ can only match or reduce quantization
    error on the training sample; the win on real embeddings comes from
    decorrelating dimensions so per-subspace variance equalizes —
    iid-gaussian data shows ~no gain (already isotropic), CLIP-like
    correlated data shows the recall-per-byte gain.

    No reference analog: the reference has no quantization at all
    (f32 hnswlib, src/datanode/handler.py:46)."""
    x = np.asarray(sample, np.float32)
    n, d = x.shape
    _check_dims(d, m_subq)
    if n == 0:
        raise ValueError("train_opq on empty sample")
    x_j = jnp.asarray(x)
    rot = np.eye(d, dtype=np.float32)
    codebooks = None
    for it in range(max(1, opq_iters)):
        y = np.asarray(jnp.dot(x_j, jnp.asarray(rot),
                               preferred_element_type=jnp.float32))
        # first round trains from scratch; later rounds take few-step
        # refinements from the previous codebooks (standard OPQ schedule)
        codebooks = train_pq(y, m_subq, iters=(iters if it == 0 else 4),
                             block=block, seed=seed, init=codebooks,
                             n_codes=n_codes)
        if it == max(1, opq_iters) - 1:
            break
        codes, _ = encode_pq(y, codebooks)
        y_hat = decode_pq(codes, codebooks)
        cov = np.asarray(_opq_cross_cov(x_j, jnp.asarray(y_hat)))
        u, _, vt = np.linalg.svd(cov)
        rot = (u @ vt).astype(np.float32)
    return np.asarray(codebooks), rot


# --------------------------------------------------------------------------
# encoding
# --------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("block",))
def _encode_scan(data: jax.Array, codebooks: jax.Array, block: int,
                 rotation: Optional[jax.Array] = None):
    n, d = data.shape
    m_subq, n_codes = codebooks.shape[0], codebooks.shape[1]
    c_sq = jnp.sum(codebooks * codebooks, axis=-1)  # (M, J)

    def body(_, i):
        chunk = jax.lax.dynamic_slice_in_dim(data, i * block, block)
        if rotation is not None:  # OPQ: code the rotated row (x @ R)
            chunk = jnp.dot(chunk, rotation,
                            preferred_element_type=jnp.float32)
        chunk = chunk.reshape(block, m_subq, -1)
        assign = _pq_assign_block_scores(chunk, codebooks, block)  # (B, M)
        csq_b = jnp.broadcast_to(c_sq[None], (block,) + c_sq.shape)
        rsq = jnp.sum(jnp.take_along_axis(csq_b, assign[:, :, None],
                                          axis=-1)[..., 0], axis=-1)  # (B,)
        return 0, (_maybe_pack(assign, n_codes), rsq)

    _, (codes, rsq) = jax.lax.scan(
        body, 0, jnp.arange(n // block, dtype=jnp.int32))
    return codes.reshape(n, -1), rsq.reshape(n)


def encode_pq(
    data: np.ndarray,
    codebooks: np.ndarray,
    block: int = 16384,
    rotation: Optional[np.ndarray] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Encode rows -> (codes (n, M) uint8, recon_sq (n,) f32).

    recon_sq is ||x_hat||^2 of the reconstruction (exact: subspaces are
    orthogonal coordinate blocks), the norm the ADC scan ranks against —
    the PQ twin of layout.quantize_block's dequantized-row norms. With an
    OPQ `rotation`, codes quantize (x @ R); recon_sq needs no correction
    (rotations preserve norms, so ||x_hat_rot|| = ||x_hat||)."""
    data = np.asarray(data, np.float32)
    n, d = data.shape
    m_subq = codebooks.shape[0]
    _check_dims(d, m_subq)
    width = pq_code_bytes(codebooks)
    if n == 0:
        return (np.zeros((0, width), np.uint8), np.zeros((0,), np.float32))
    pad = (-n) % block
    if pad:
        data = np.concatenate([data, np.zeros((pad, d), np.float32)])
    rot_j = (jnp.asarray(rotation, jnp.float32)
             if rotation is not None else None)
    codes, rsq = _encode_scan(
        jnp.asarray(data), jnp.asarray(codebooks, jnp.float32),
        block=min(block, len(data)), rotation=rot_j)
    return np.asarray(codes)[:n], np.asarray(rsq)[:n]


@functools.partial(jax.jit, static_argnames=("block",))
def _encode_residual_scan(data: jax.Array, assign: jax.Array,
                          centroids: jax.Array, codebooks: jax.Array,
                          block: int,
                          rotation: Optional[jax.Array] = None):
    """Residual encode for IVF-PQ: codes quantize (x - c_assign), and the
    stored norm is the FULL reconstruction's ||c + r_hat||^2 (so the
    probe's distance d^2 = ||q||^2 - 2 q.c - 2 q.r_hat + norm is exact to
    the reconstruction; 2 q.c comes from the coarse GEMM the probe
    already runs — residual coding changes NOTHING about the query-side
    LUT). With an OPQ `rotation`, codes quantize the ROTATED residual
    (x - c) @ R and the stored norm unrotates the decoded residual first:
    ||c + r_hat_rot @ R^T||^2. Query side pairs via (q @ R) . r_hat_rot
    = q . r_hat. Returns (codes (n, M) u8, recon_sq (n,) f32)."""
    n, d = data.shape
    m_subq, n_codes, dsub = codebooks.shape

    def body(_, i):
        chunk = jax.lax.dynamic_slice_in_dim(data, i * block, block)
        a = jax.lax.dynamic_slice_in_dim(assign, i * block, block)
        cents = jnp.take(centroids, a, axis=0)          # (B, d)
        res = chunk - cents
        if rotation is not None:
            res = jnp.dot(res, rotation, preferred_element_type=jnp.float32)
        res = res.reshape(block, m_subq, dsub)
        codes = _pq_assign_block_scores(res, codebooks, block)  # (B, M)
        onehot = (codes[:, :, None]
                  == jnp.arange(n_codes, dtype=jnp.int32)
                  ).astype(codebooks.dtype)
        r_hat = jnp.einsum("bmj,mjs->bms", onehot, codebooks,
                           preferred_element_type=jnp.float32)
        r_flat = r_hat.reshape(block, d)
        if rotation is not None:  # back to original space for the norm
            r_flat = jnp.dot(r_flat, rotation.T,
                             preferred_element_type=jnp.float32)
        recon = cents + r_flat
        rsq = jnp.sum(recon * recon, axis=-1)
        return 0, (_maybe_pack(codes, n_codes), rsq)

    _, (codes, rsq) = jax.lax.scan(
        body, 0, jnp.arange(n // block, dtype=jnp.int32))
    return codes.reshape(n, -1), rsq.reshape(n)


def encode_pq_residual_chunked(
    vecs: np.ndarray,
    assign: Optional[np.ndarray],
    centroids,
    codebooks,
    chunk: int = 16384,
    rotation: Optional[np.ndarray] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Fixed-chunk residual encode (the append-path twin of
    encode_pq_chunked; one compiled shape serves every batch size).

    assign=None means `centroids` is a PER-ROW (m, d) centroid array
    (mesh appends: each row's centroid comes from a different device's
    table) — the chunked call then passes an identity assignment over
    the chunk's own centroid slice."""
    vecs = np.asarray(vecs, np.float32)
    m, d = vecs.shape
    cb = jnp.asarray(codebooks, jnp.float32)
    rot = (jnp.asarray(rotation, jnp.float32)
           if rotation is not None else None)
    per_row = assign is None
    if not per_row:
        cents = jnp.asarray(centroids, jnp.float32)
    codes = np.empty((m, pq_code_bytes(cb)), np.uint8)
    rsq = np.empty(m, np.float32)
    ident = np.arange(chunk, dtype=np.int32)
    for lo in range(0, m, chunk):
        part = vecs[lo : lo + chunk]
        vp = np.zeros((chunk, d), np.float32)
        vp[: len(part)] = part
        if per_row:
            cp = np.zeros((chunk, d), np.float32)
            cp[: len(part)] = centroids[lo : lo + chunk]
            c, r = _encode_residual_scan(jnp.asarray(vp),
                                         jnp.asarray(ident),
                                         jnp.asarray(cp), cb, block=chunk,
                                         rotation=rot)
        else:
            ap = np.zeros(chunk, np.int32)
            ap[: len(part)] = assign[lo : lo + chunk]
            c, r = _encode_residual_scan(jnp.asarray(vp), jnp.asarray(ap),
                                         cents, cb, block=chunk,
                                         rotation=rot)
        codes[lo : lo + len(part)] = np.asarray(c)[: len(part)]
        rsq[lo : lo + len(part)] = np.asarray(r)[: len(part)]
    return codes, rsq


def encode_pq_chunked(
    vecs: np.ndarray,
    codebooks: np.ndarray,
    chunk: int = 16384,
) -> Tuple[np.ndarray, np.ndarray]:
    """encode_pq in FIXED chunk shapes: one compiled encode program serves
    every batch size (the serving append path runs under the engine lock,
    where a fresh XLA compile is a stall — same rationale as the
    assignment GEMM's fixed chunks in index/ivf.py)."""
    vecs = np.asarray(vecs, np.float32)
    m, d = vecs.shape
    codes = np.empty((m, pq_code_bytes(codebooks)), np.uint8)
    rsq = np.empty(m, np.float32)
    for lo in range(0, m, chunk):
        part = vecs[lo : lo + chunk]
        vp = np.zeros((chunk, d), np.float32)
        vp[: len(part)] = part
        c, r = encode_pq(vp, codebooks, block=chunk)
        codes[lo : lo + len(part)] = c[: len(part)]
        rsq[lo : lo + len(part)] = r[: len(part)]
    return codes, rsq


def calibrate_pq_err(residuals: np.ndarray, codebooks: np.ndarray,
                     rotation: Optional[np.ndarray] = None,
                     quantile: float = 0.999, max_sample: int = 2048,
                     seed: int = 0) -> float:
    """Quantile of the per-row reconstruction error NORM ||r - r_hat||
    over sample residuals — the calibration constant behind the adaptive
    exact-rescore window (engine._rescore_exact).

    Because the ADC probe scores candidates by d_adc = ||q - x_hat||^2
    (exact distance to the reconstruction), the true distance obeys
    d_exact >= (sqrt(d_adc) - ||e||)^2 with e = x - x_hat. A candidate
    whose bound sits above the running kth exact distance cannot enter
    the top-k (up to the quantile's tail mass), so the host re-rank can
    skip it — that is what turns the fixed 64x-k rescore gather into a
    data-dependent one. Pure numpy on a small subsample: no device
    program, no relay compile, ~ms at build time. Rotation preserves
    norms, so the rotated-space error norm IS the original-space one."""
    r = np.asarray(residuals, np.float32)
    if len(r) == 0:
        return 0.0
    if len(r) > max_sample:
        keep = np.random.default_rng(seed).choice(
            len(r), size=max_sample, replace=False)
        r = r[keep]
    cb = np.asarray(codebooks, np.float32)
    if rotation is not None:
        r = r @ np.asarray(rotation, np.float32)
    m, _, dsub = cb.shape
    x = r.reshape(len(r), m, dsub)
    dots = np.einsum("smd,mjd->smj", x, cb)
    csq = np.einsum("mjd,mjd->mj", cb, cb)
    code = np.argmax(2.0 * dots - csq[None], axis=2)     # (S, m)
    r_hat = cb[np.arange(m)[None, :], code]              # (S, m, dsub)
    err = r - r_hat.reshape(len(r), -1)
    nrm = np.sqrt(np.einsum("sd,sd->s", err, err))
    return float(np.quantile(nrm, quantile))


def decode_pq(codes: np.ndarray, codebooks: np.ndarray,
              rotation: Optional[np.ndarray] = None) -> np.ndarray:
    """Reconstruct (n, d) f32 rows from codes — host-side helper for
    rescoring/tests (the hot path never decodes). With an OPQ rotation,
    the decoded rotated-space row unrotates back to original space.
    4-bit codebooks take packed byte codes (pack_nibbles_np layout)."""
    codes = np.asarray(codes)
    if pq_n_codes(codebooks) == 16:
        codes = unpack_nibbles_np(codes)
    n, m_subq = codes.shape
    recon = codebooks[np.arange(m_subq)[None, :], codes.astype(np.int64), :]
    out = recon.reshape(n, -1).astype(np.float32)
    if rotation is not None:
        out = out @ np.asarray(rotation, np.float32).T
    return out


# --------------------------------------------------------------------------
# ADC scan (flat): one-hot MXU GEMM, blockwise streaming top-k
# --------------------------------------------------------------------------


def _pq_lut(queries: jax.Array, codebooks: jax.Array,
            rotation: Optional[jax.Array] = None) -> jax.Array:
    """(Q, M, 256) f32: LUT[q, m, j] = 2 * q_m . codebook[m, j].

    With an OPQ rotation the query rotates first (q @ R, one small GEMM)
    so LUT sums recover 2 q . x_hat in ORIGINAL space — the entire
    query-side cost of OPQ."""
    q = queries.astype(jnp.float32)
    if rotation is not None:
        q = jnp.dot(q, rotation, preferred_element_type=jnp.float32)
    m_subq, _, dsub = codebooks.shape
    q_sub = q.reshape(q.shape[0], m_subq, dsub)
    return 2.0 * jnp.einsum("qms,mjs->qmj", q_sub, codebooks,
                            preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("k", "block"))
def pq_topk(
    queries: jax.Array,     # (Q, d) f32
    codes: jax.Array,       # (N, M) uint8; N % block == 0
    codebooks: jax.Array,   # (M, 256, dsub) f32
    recon_sq: jax.Array,    # (N,) f32 reconstruction norms
    valid: jax.Array,       # (N,) bool
    k: int,
    block: int = 8192,
    rotation: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Streaming ADC top-k over the full code array. Same contract as
    distance.l2sq_topk_blockwise: returns (dist, idx) with dist the
    squared-L2 to the RECONSTRUCTION, ascending; empty slots +inf / -1.
    `rotation` pairs with codes produced by encode_pq(..., rotation=R):
    only the LUT build changes (||q||, recon_sq are rotation-invariant)."""
    n = codes.shape[0]
    m_subq, n_codes = codebooks.shape[0], codebooks.shape[1]
    if n % block != 0:
        raise ValueError(f"codes rows {n} not a multiple of block {block}")
    q_sq = jnp.sum(jnp.square(queries.astype(jnp.float32)), axis=-1,
                   keepdims=True)
    lut = _pq_lut(queries, codebooks, rotation)             # (Q, M, J)
    lut_flat = lut.reshape(lut.shape[0], -1).astype(jnp.bfloat16)
    codes_i32 = codes.astype(jnp.int32)
    jota = jnp.arange(n_codes, dtype=jnp.int32)

    def body(carry, i):
        neg, idx = carry
        start = i * block
        cblk = jax.lax.dynamic_slice_in_dim(codes_i32, start, block)
        cblk = _maybe_unpack(cblk, n_codes)
        rsq = jax.lax.dynamic_slice_in_dim(recon_sq, start, block)
        v = jax.lax.dynamic_slice_in_dim(valid, start, block)
        onehot = (cblk[:, :, None] == jota[None, None, :]).astype(jnp.bfloat16)
        dots = jax.lax.dot_general(
            lut_flat, onehot.reshape(block, m_subq * n_codes),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)             # (Q, B)
        scores = dots - rsq[None, :]
        scores = tk.mask_scores(scores, v[None, :])
        gidx = start + jax.lax.broadcasted_iota(jnp.int32, (1, block), 1)
        neg, idx = tk.merge_topk(neg, idx, scores,
                                 jnp.broadcast_to(gidx, scores.shape), k)
        return (neg, idx), None

    init = tk.empty_topk(queries.shape[0], k)
    (neg, idx), _ = jax.lax.scan(
        body, init, jnp.arange(n // block, dtype=jnp.int32))
    dist = jnp.where(idx >= 0, q_sq - neg, jnp.inf)
    return dist, idx


# --------------------------------------------------------------------------
# gathered-candidate ADC (the IVF probe epilogue)
# --------------------------------------------------------------------------


def adc_scores_gathered(
    lut: jax.Array,        # (Q, M, 256) f32 from _pq_lut
    codes_g: jax.Array,    # (Q, R, M) uint8 gathered candidate codes
) -> jax.Array:
    """(Q, R) dot scores 2 q.x_hat for per-query gathered candidates.

    Per-element J-entry table lookups: expressed as take_along_axis so
    XLA lowers one gather per query over the (J, M) transposed LUT —
    candidate code rows were already fetched at row granularity (cheap
    DMA); this step is VPU/gather work proportional to Q*R*M elements.
    """
    if lut.shape[2] == 16:  # 4-bit tier: packed byte codes
        codes_g = _unpack_nibbles(codes_g)
    lut_t = jnp.swapaxes(lut, 1, 2)  # (Q, J, M)

    def per_q(lut_q, codes_q):
        # out[r, m] = lut_q[codes_q[r, m], m]
        return jnp.take_along_axis(lut_q, codes_q.astype(jnp.int32), axis=0)

    vals = jax.vmap(per_q)(lut_t, codes_g)  # (Q, R, M)
    return jnp.sum(vals, axis=-1)


def adc_scores_grouped(
    lut: jax.Array,        # (Q, M, 256) f32
    codes_g: jax.Array,    # (Q, R, M) uint8
    chunk: int = 2048,
    q_group: int = 8,
) -> jax.Array:
    """(Q, R) ADC scores as REAL MXU GEMMs — the serving-path formulation.

    The take_along_axis variant lowers to per-element gathers (Q*R*M
    table lookups): measured seconds per batch at capacity shapes (16M
    rows, nprobe*cell_pad ~ 78k candidates/query) — it collapsed engine
    serving to 9 QPS. Here queries process in groups of G: the group's
    flattened candidate codes one-hot-expand chunkwise to (C, M*256)
    bf16 and contract against the group's (G, M*256) LUT — a true GEMM
    with a large N dimension. The G x flop overcount (each query scores
    the whole group's candidates, the diagonal block is kept) is the
    price of avoiding gathers; G=8 keeps it far below the gather cost.
    4-bit codebooks: codes stay PACKED through the (cheap) per-chunk
    slice and unpack right before the 16-wide one-hot — 8x fewer VPU
    compares and an 8x narrower contraction than the 8-bit tier."""
    q_n, r_n, byte_w = codes_g.shape
    m_subq, n_codes = lut.shape[1], lut.shape[2]
    g = min(q_group, q_n)
    if q_n % g != 0:  # pad query groups to a common size
        pad = g - q_n % g
        lut = jnp.concatenate([lut, jnp.zeros((pad,) + lut.shape[1:],
                                              lut.dtype)])
        codes_g = jnp.concatenate(
            [codes_g, jnp.zeros((pad,) + codes_g.shape[1:],
                                codes_g.dtype)])
    n_groups = codes_g.shape[0] // g
    flat_r = g * r_n
    if flat_r % chunk != 0:
        chunk = math.gcd(flat_r, chunk) or flat_r
    jota = jnp.arange(n_codes, dtype=jnp.int32)
    lut_g = lut.reshape(n_groups, g, m_subq * n_codes).astype(jnp.bfloat16)
    codes_f = codes_g.reshape(n_groups, flat_r, byte_w).astype(jnp.int32)

    def per_group(lut_1, codes_1):
        def body(_, i):
            cg = jax.lax.dynamic_slice_in_dim(codes_1, i * chunk, chunk)
            cg = _maybe_unpack(cg, n_codes)
            onehot = (cg[:, :, None] == jota).astype(jnp.bfloat16)
            out = jax.lax.dot_general(
                lut_1, onehot.reshape(chunk, m_subq * n_codes),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)      # (g, C)
            return 0, out

        _, blocks = jax.lax.scan(
            body, 0, jnp.arange(flat_r // chunk, dtype=jnp.int32))
        big = jnp.moveaxis(blocks, 0, 1).reshape(g, g, r_n)
        return big[jnp.arange(g), jnp.arange(g)]          # (g, R) diagonal

    out = jax.vmap(per_group)(lut_g, codes_f).reshape(-1, r_n)
    return out[:q_n]


def adc_scores_gathered_onehot(
    lut: jax.Array,        # (Q, M, 256) f32
    codes_g: jax.Array,    # (Q, R, M) uint8
    chunk: int = 2048,
) -> jax.Array:
    """Gather-free variant: per-R-chunk one-hot einsum on the MXU.

    FLOPs are Q*R*M*J (vs Q*R*M adds for the gather variant) but every
    op is an MXU contraction; wins when XLA's gather lowering is the
    bottleneck. Memory: Q*chunk*M*J bf16 transient per step."""
    q_n, r_n = codes_g.shape[:2]
    n_codes = lut.shape[2]
    if r_n % chunk != 0:
        chunk = r_n  # small candidate sets: single step
    jota = jnp.arange(n_codes, dtype=jnp.int32)
    lut_b = lut.astype(jnp.bfloat16)
    codes_i = codes_g.astype(jnp.int32)

    def body(_, i):
        cg = jax.lax.dynamic_slice_in_dim(codes_i, i * chunk, chunk, axis=1)
        cg = _maybe_unpack(cg, n_codes)
        onehot = (cg[..., None] == jota).astype(jnp.bfloat16)  # (Q,C,M,J)
        return 0, jnp.einsum("qcmj,qmj->qc", onehot, lut_b,
                             preferred_element_type=jnp.float32)

    _, out = jax.lax.scan(body, 0,
                          jnp.arange(r_n // chunk, dtype=jnp.int32))
    return jnp.moveaxis(out, 0, 1).reshape(q_n, r_n)


# --------------------------------------------------------------------------
# numpy oracle (tests)
# --------------------------------------------------------------------------


def numpy_adc_oracle(queries, codes, codebooks, recon_sq, valid, k,
                     rotation=None):
    """Exact ADC in float64 numpy: the correctness bar for pq_topk."""
    queries = np.asarray(queries, np.float64)
    n, m_subq = codes.shape
    recon = decode_pq(codes, np.asarray(codebooks),
                      rotation=rotation).astype(np.float64)
    d2 = (
        np.sum(queries**2, axis=1)[:, None]
        - 2.0 * queries @ recon.T
        + np.asarray(recon_sq, np.float64)[None, :]
    )
    d2 = np.where(np.asarray(valid, bool)[None, :], d2, np.inf)
    idx = np.argsort(d2, axis=1, kind="stable")[:, :k]
    dist = np.take_along_axis(d2, idx, axis=1)
    idx = np.where(np.isinf(dist), -1, idx)
    return dist, idx
