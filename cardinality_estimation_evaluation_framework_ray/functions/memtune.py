"""glibc allocator tuning for large vectorized temporaries.

The engine's hot kernels (hash64, segment reductions, register updates) are
straight-line NumPy over per-batch arrays, which allocates and frees a
handful of array-sized temporaries per call.  glibc serves allocations above
its mmap threshold with a fresh ``mmap`` and returns them with ``munmap`` on
free; its dynamic threshold adaptation caps at 32 MB, so temporaries larger
than that NEVER enter the arena and every call re-faults every page.

On hosts where guest memory is lazily faulted through a hypervisor
(microVM ballooning / userfaultfd — including this sandbox), each 4 KB
first-touch fault costs tens of microseconds, which makes >32 MB kernels run
10-45x slower than the same kernels over arena-recycled buffers (measured
here: hash64 over 34M int64 = 26.6 s cold-mmap vs 0.6 s arena-recycled).
Raising the mmap and trim thresholds keeps large temporaries in the arena:
pages fault once per worker process and then recycle.

Trade-off: freed large buffers keep their RSS (bounded by the peak
concurrent temporary footprint of one worker — tens to hundreds of MB at
the engine's default batch sizes).  Set ``GRAFT_NO_MALLOC_TUNE=1`` to
disable.  No-ops safely off glibc.

Called once per process from the package ``__init__`` so Ray workers (which
import the engine when deserializing UDFs) are tuned without any
environment-variable propagation through the raylet.
"""

from __future__ import annotations

import ctypes
import os

_M_TRIM_THRESHOLD = -1
_M_MMAP_THRESHOLD = -3

_done = False


def tune_malloc(threshold: int = 1 << 29) -> bool:
    """Raise glibc's mmap/trim thresholds to ``threshold`` bytes (default
    512 MB).  Returns True if applied, False if skipped or unavailable."""
    global _done
    if _done or os.environ.get("GRAFT_NO_MALLOC_TUNE"):
        return False
    _done = True
    try:
        libc = ctypes.CDLL("libc.so.6")
        ok = (libc.mallopt(_M_MMAP_THRESHOLD, threshold) == 1
              and libc.mallopt(_M_TRIM_THRESHOLD, threshold) == 1)
        return bool(ok)
    except Exception:
        return False
