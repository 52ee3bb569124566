from tpuvdb.store.wal import WriteAheadLog
from tpuvdb.store.kv import DocStore
from tpuvdb.store.checkpoint import CheckpointManager

__all__ = ["WriteAheadLog", "DocStore", "CheckpointManager"]
