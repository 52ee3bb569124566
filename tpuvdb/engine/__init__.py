from tpuvdb.engine.engine import VectorDBEngine

__all__ = ["VectorDBEngine"]
