from tpuvdb.bench.harness import chained_timer
from tpuvdb.bench.datasets import synthetic_corpus, load_fvecs, load_bvecs
from tpuvdb.bench.recall import recall_at_k, recall_curve

__all__ = [
    "chained_timer",
    "synthetic_corpus",
    "load_fvecs",
    "load_bvecs",
    "recall_at_k",
    "recall_curve",
]
