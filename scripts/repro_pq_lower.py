"""Shape-only repro for the 16M x 768 pallas_pq_search Mosaic lowering
failure ("Shape mismatch in input, indices and output" in
_gather_lowering_rule). Lowering runs client-side, so this needs no data
and no device memory — jit .lower() with ShapeDtypeStructs."""
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tpuvdb.kernels.pallas_pq import pallas_pq_search


def try_lower(q=32, nlist=15102, n_g=17_000_000 // 128 * 128, mb=96,
              n_codes=256, d=768, s=13848, k=640, nprobe=16,
              cell_pad=2048, rot=True):
    S = jax.ShapeDtypeStruct
    args = (
        S((q, d), jnp.float32),            # queries
        S((nlist, d), jnp.float32),        # centroids
        S((n_g, mb), jnp.uint8),           # grouped codes
        S((mb, n_codes, d // mb), jnp.float32),  # codebooks
        S((n_g,), jnp.float32),            # grouped_sq
        S((n_g,), jnp.bool_),              # grouped_valid
        S((s, mb), jnp.uint8),             # spill codes
        S((s,), jnp.int32),                # spill cells
        S((s,), jnp.float32),              # spill sq
        S((s,), jnp.bool_),                # spill valid
        S((nlist,), jnp.int32),            # cell offsets
    )
    kw = dict(cell_pad=cell_pad, k=k, nprobe=nprobe)
    if rot:
        kw["rotation"] = S((d, d), jnp.float32)
    try:
        pallas_pq_search.lower(*args, **kw)
        return "OK"
    except Exception as e:
        return f"{type(e).__name__}: {str(e)[:120]}"


if __name__ == "__main__":
    # 8M-run geometry (known good) vs 16M-run geometry (failed)
    print("8M  geom:", try_lower(nlist=5354, n_g=8_400_000 // 128 * 128,
                                 s=1807))
    print("16M geom:", try_lower())
    # bisect: which parameter flips it?
    print("16M nlist=5354:", try_lower(nlist=5354))
    print("8M  nlist=15102:", try_lower(nlist=15102,
                                        n_g=8_400_000 // 128 * 128, s=1807))
    print("16M s=1807:", try_lower(s=1807))
    print("16M k=10:", try_lower(k=10))
