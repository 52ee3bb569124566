"""Host-memory tuning for page-fault-expensive environments.

Some virtualized hosts back guest RAM on demand (ballooning / remote
paging): FIRST-TOUCH of anonymous memory runs at ~100 MB/s while warm
pages are full speed. glibc munmaps large (>128 KB) blocks on free, so a
loop that allocates a fresh multi-hundred-MB numpy array per iteration
re-faults its whole footprint every time — measured 97 s for one
65536 x 768 standard_normal draw on such a host, 1.3 s after this fix.

keep_malloc_warm() raises the mmap threshold and disables trimming so
large equal-sized allocations recycle warm heap pages. Process-global
policy — call it from entry points (bench scripts, serve), not library
import time.
"""

from __future__ import annotations

import ctypes

_M_TRIM_THRESHOLD = -1
_M_MMAP_THRESHOLD = -3


def keep_malloc_warm(threshold: int = 1 << 30) -> bool:
    """Keep blocks under `threshold` bytes on the (reused) heap and never
    trim. Returns True when mallopt was applied, False on non-glibc."""
    try:
        libc = ctypes.CDLL(None)
        ok1 = libc.mallopt(_M_MMAP_THRESHOLD, threshold)
        ok2 = libc.mallopt(_M_TRIM_THRESHOLD, threshold)
        return bool(ok1 and ok2)
    except (OSError, AttributeError):
        return False
