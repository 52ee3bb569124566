from tpuvdb.kernels.distance import (
    l2sq_topk,
    l2sq_topk_blockwise,
    l2sq_topk_approx_full,
    l2sq_topk_approx_blockwise,
    l2sq_full,
)
from tpuvdb.kernels.topk import merge_topk, mask_scores


def __getattr__(name):
    # lazy: pallas modules import jax.experimental.pallas (TPU-oriented)
    if name == "pallas_l2sq_topk":
        from tpuvdb.kernels import pallas_scan

        return getattr(pallas_scan, name)
    if name == "pallas_ivf_search":
        from tpuvdb.kernels.pallas_ivf import pallas_ivf_search

        return pallas_ivf_search
    if name in ("l2sq_topk_int8_xla", "quantize_rows_np", "quantize_batch"):
        from tpuvdb.kernels import quant

        return getattr(quant, name)
    if name == "kmeans":
        from tpuvdb.kernels.kmeans import kmeans

        return kmeans
    if name in ("train_pq", "train_opq", "encode_pq", "decode_pq",
                "pq_topk"):
        from tpuvdb.kernels import pq

        return getattr(pq, name)
    raise AttributeError(f"module 'tpuvdb.kernels' has no attribute {name!r}")

__all__ = [
    "l2sq_topk",
    "l2sq_topk_blockwise",
    "l2sq_topk_approx_full",
    "l2sq_topk_approx_blockwise",
    "l2sq_full",
    "merge_topk",
    "mask_scores",
]
