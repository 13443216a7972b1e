"""glibc malloc tuning for numpy-heavy workers.

On this class of host, freshly mmap'd pages fault in extremely slowly
(~20 MB/s observed), so every large numpy allocation (image batches,
resize outputs, Arrow buffers) pays a page-fault storm — and 32
concurrent Python workers serialize on the kernel doing it, destroying
scaling. Routing large allocations through the (reused) heap instead of
mmap makes steady-state allocations ~300x faster: the pages fault once
and are recycled.

Called by the engine builder (executor side) and the session builder
(driver side + inherited env for spawned workers). No-op on non-glibc
platforms.
"""

from __future__ import annotations

import ctypes
import os

_M_MMAP_THRESHOLD = -3
_M_TRIM_THRESHOLD = -1

_done = False


def tune_malloc() -> bool:
    """Keep large allocations on the reusable heap: raise the mmap
    threshold to 1 GiB and disable trim. Idempotent."""
    global _done
    if _done:
        return True
    try:
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        libc.mallopt(_M_MMAP_THRESHOLD, 1 << 30)
        libc.mallopt(_M_TRIM_THRESHOLD, -1)
        _done = True
        return True
    except Exception:
        return False


_touched = False


def pretouch_arena(mb: int = 128) -> None:
    """Fault a scratch heap arena in once per process and release it for
    reuse. With trim disabled the pages stay with the process, so image
    batches and resize outputs never hit the (pathologically slow)
    fresh-page path again. Idempotent."""
    global _touched
    if _touched:
        return
    tune_malloc()
    import numpy as np

    # Several mid-size blocks rather than one huge one: stays under the
    # raised mmap threshold and matches real allocation sizes.
    blocks = [np.ones(32 << 20, dtype=np.uint8) for _ in range(max(mb // 32, 1))]
    for b in blocks:
        b[::4096] = 1
    del blocks
    _touched = True


def export_malloc_env() -> None:
    """Set the equivalent env vars so child processes (Spark's Python
    workers, subprocess benches) start tuned."""
    os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", str(1 << 30))
    os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", str(1 << 40))
