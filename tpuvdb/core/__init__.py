from tpuvdb.core.types import (
    VectorData,
    SearchRequest,
    SearchResult,
    Response,
    SearchHit,
)
from tpuvdb.core.config import DBConfig
from tpuvdb.core import errors

__all__ = [
    "VectorData",
    "SearchRequest",
    "SearchResult",
    "Response",
    "SearchHit",
    "DBConfig",
    "errors",
]
