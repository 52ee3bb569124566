from tpuvdb.kernels.distance import l2sq_topk_blockwise, l2sq_full
from tpuvdb.kernels.topk import merge_topk, mask_scores

__all__ = [
    "l2sq_topk_blockwise",
    "l2sq_full",
    "merge_topk",
    "mask_scores",
]
