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


def trim_heap() -> bool:
    """Return freed heap pages to the OS (malloc_trim). The complement of
    keep_malloc_warm: a build PHASE reuses warm pages freely, then trims
    at its boundary so anon RSS tracks live data, not the phase's
    transient high-water (the untrimmed heap measured 19-24 GB anon at
    the 8M x 768 PQ build while live state was a fraction of that)."""
    try:
        libc = ctypes.CDLL(None)
        return bool(libc.malloc_trim(0))
    except (OSError, AttributeError):
        return False


def anon_gb() -> float:
    """Anonymous (non-file-backed) RSS in GB; -1 where unsupported."""
    try:
        with open("/proc/self/smaps_rollup") as f:
            for line in f:
                if line.startswith("Anonymous:"):
                    return int(line.split()[1]) / 1024 / 1024
    except OSError:
        pass
    return -1.0


#: phase-boundary (tag, anon_gb) samples, appended by memlog() whether or
#: not TPUVDB_MEMLOG logging is on — capacity benches publish this as the
#: RSS-per-stage table instead of one end-to-end peak number
MEM_STAGES: list = []


def memlog(tag: str) -> None:
    """Phase-boundary memory tracer: records anon RSS per stage (always)
    and logs it when TPUVDB_MEMLOG=1, so capacity-build regressions name
    their phase."""
    import os

    MEM_STAGES.append((tag, round(anon_gb(), 2)))
    if os.environ.get("TPUVDB_MEMLOG"):
        import logging

        logging.getLogger("tpuvdb.memlog").warning(
            "[mem] %-32s anon %6.2f GB", tag, anon_gb())
