from tpuvdb.api.service import DBService

__all__ = ["DBService"]
