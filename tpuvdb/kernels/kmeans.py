"""K-means on TPU — the IVF coarse quantizer trainer.

Replaces the role of hnswlib's graph construction in the reference
(src/datanode/handler.py:75-89) for sublinear search: vectors are assigned
to nlist centroid cells and queries scan only the nprobe nearest cells.

The assignment step is the same GEMM shape as search (block x centroids on
the MXU), streamed over the corpus with `lax.scan` so memory stays
O(block * k); centroid updates are segment-sums. Empty clusters keep their
previous centroid (standard Lloyd fallback).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("block_size",))
def assign_blockwise(
    data: jax.Array,        # (n, d), n % block_size == 0
    centroids: jax.Array,   # (k, d)
    block_size: int = 65536,
) -> jax.Array:
    """Nearest-centroid id per row, streamed."""
    n = data.shape[0]
    c_sq = jnp.sum(centroids * centroids, axis=-1)

    def body(_, i):
        chunk = jax.lax.dynamic_slice_in_dim(data, i * block_size, block_size)
        # argmin ||x - c||^2 == argmax 2 x.c - ||c||^2
        scores = 2.0 * jnp.dot(chunk, centroids.T,
                               preferred_element_type=jnp.float32) - c_sq[None, :]
        return 0, jnp.argmax(scores, axis=-1).astype(jnp.int32)

    _, out = jax.lax.scan(body, 0, jnp.arange(n // block_size, dtype=jnp.int32))
    return out.reshape(n)


@functools.partial(jax.jit, static_argnames=("nlist", "block_size"))
def _kmeans_step(
    data: jax.Array, valid: jax.Array, centroids: jax.Array,
    nlist: int, block_size: int,
) -> Tuple[jax.Array, jax.Array]:
    """One Lloyd iteration. Returns (new_centroids, shift) where shift is
    the mean centroid movement (for convergence monitoring)."""
    n = data.shape[0]
    c_sq = jnp.sum(centroids * centroids, axis=-1)

    def body(carry, i):
        sums, counts = carry
        chunk = jax.lax.dynamic_slice_in_dim(data, i * block_size, block_size)
        v = jax.lax.dynamic_slice_in_dim(valid, i * block_size, block_size)
        scores = 2.0 * jnp.dot(chunk, centroids.T,
                               preferred_element_type=jnp.float32) - c_sq[None, :]
        assign = jnp.argmax(scores, axis=-1)
        w = v.astype(jnp.float32)
        sums = sums + jax.ops.segment_sum(chunk * w[:, None], assign,
                                          num_segments=nlist)
        counts = counts + jax.ops.segment_sum(w, assign, num_segments=nlist)
        return (sums, counts), None

    init = (jnp.zeros((nlist, data.shape[1]), jnp.float32),
            jnp.zeros((nlist,), jnp.float32))
    (sums, counts), _ = jax.lax.scan(body, init,
                                     jnp.arange(n // block_size, dtype=jnp.int32))
    new = jnp.where(counts[:, None] > 0, sums / jnp.maximum(counts, 1)[:, None],
                    centroids)
    shift = jnp.mean(jnp.linalg.norm(new - centroids, axis=-1))
    return new, shift


def kmeans(
    data: np.ndarray,
    valid: np.ndarray,
    nlist: int,
    iters: int = 12,
    block_size: int = 65536,
    seed: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Train nlist centroids; returns (centroids (nlist, d) f32,
    assignments (n,) i32). Rows where valid=False get assignment -1."""
    n, d = data.shape
    pad = (-n) % block_size
    if pad:
        data = np.concatenate([data, np.zeros((pad, d), data.dtype)])
        valid = np.concatenate([valid, np.zeros(pad, bool)])
    data_j = jnp.asarray(data, jnp.float32)
    valid_j = jnp.asarray(valid)

    # init: sample from valid rows
    rng = np.random.default_rng(seed)
    valid_idx = np.flatnonzero(valid)
    if len(valid_idx) == 0:
        raise ValueError("kmeans on empty data")
    take = rng.choice(valid_idx, size=min(nlist, len(valid_idx)), replace=False)
    cents = np.asarray(data[take], np.float32)
    if len(take) < nlist:  # fewer points than lists: tile + jitter
        reps = -(-nlist // len(take))
        cents = np.tile(cents, (reps, 1))[:nlist]
        cents += rng.standard_normal(cents.shape).astype(np.float32) * 1e-4
    centroids = jnp.asarray(cents)

    for _ in range(iters):
        centroids, shift = _kmeans_step(data_j, valid_j, centroids,
                                        nlist=nlist, block_size=block_size)
        if float(shift) < 1e-6:
            break

    assign = np.asarray(assign_blockwise(data_j, centroids, block_size=block_size))
    assign = np.where(valid, assign, -1).astype(np.int32)
    return np.asarray(centroids), assign[: n]
