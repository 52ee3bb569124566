from tpuvdb.kernels.distance import (
    l2sq_topk,
    l2sq_topk_blockwise,
    l2sq_topk_approx_full,
    l2sq_topk_approx_blockwise,
    l2sq_full,
)
from tpuvdb.kernels.topk import merge_topk, mask_scores

__all__ = [
    "l2sq_topk",
    "l2sq_topk_blockwise",
    "l2sq_topk_approx_full",
    "l2sq_topk_approx_blockwise",
    "l2sq_full",
    "merge_topk",
    "mask_scores",
]
