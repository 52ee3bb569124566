from tpuvdb.index.layout import ShardMirror, StackedLayout
from tpuvdb.index.exact import DeviceExactIndex

__all__ = ["ShardMirror", "StackedLayout", "DeviceExactIndex"]
