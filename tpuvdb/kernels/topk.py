"""Top-k primitives shared by the scan kernels and the cross-shard merge.

Convention: internally all top-k state is kept as *negated* squared-L2
scores ("neg-scores", larger = closer) so `jax.lax.top_k` — a max-k — can be
used directly. The public API converts back to ascending squared-L2 at the
boundary. Invalid / masked slots carry -inf neg-score and index -1.

Parity note: the reference's coordinator merge dedups by key then sorts
ascending (src/coordinator/handler.py:200-216); dedup-by-key happens at the
host layer (keys are host-side strings), while this module does the purely
numeric merge on device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# np, NOT jnp: a module-level jnp constant commits a device array at
# import time, initializing the JAX backend before `tpuvdb serve` can
# apply the TPUVDB_PLATFORM override (every demo-cluster node then lands
# on the one TPU instead of CPU)
NEG_INF = np.float32(-np.inf)


def mask_scores(neg_scores: jax.Array, valid: jax.Array) -> jax.Array:
    """Set neg-scores of invalid slots to -inf so top_k never selects them."""
    return jnp.where(valid, neg_scores, NEG_INF)


def merge_topk(
    neg_a: jax.Array,
    idx_a: jax.Array,
    neg_b: jax.Array,
    idx_b: jax.Array,
    k: int,
):
    """Merge two (Q, ka) / (Q, kb) top-k sets into a (Q, k) top-k set.

    Inputs are neg-scores (descending-better). Returns (neg, idx), both
    (Q, k), sorted descending by neg-score (i.e. ascending true distance).
    """
    cat_neg = jnp.concatenate([neg_a, neg_b], axis=-1)
    cat_idx = jnp.concatenate([idx_a, idx_b], axis=-1)
    top_neg, pos = jax.lax.top_k(cat_neg, k)
    top_idx = jnp.take_along_axis(cat_idx, pos, axis=-1)
    return top_neg, top_idx


def empty_topk(q: int, k: int):
    """Initial running top-k state: all -inf / index -1."""
    return (
        jnp.full((q, k), NEG_INF, dtype=jnp.float32),
        jnp.full((q, k), -1, dtype=jnp.int32),
    )


def finalize(neg_scores: jax.Array, idx: jax.Array):
    """Convert internal neg-score state to ascending squared-L2 distances.

    Empty slots (idx == -1) get +inf distance.
    """
    dist = jnp.where(idx >= 0, -neg_scores, jnp.inf)
    return dist, idx
