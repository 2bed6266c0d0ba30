"""Allocator tuning for throughput benchmarks.

glibc serves large allocations (>= the dynamic mmap threshold, typically
128 KB-32 MB) with mmap and munmaps them on free, so every decode of a
multi-megasample capture re-faults ~100 MB of conditioner/channel buffers.
On hosts with a slow page-fault path that dominates wall clock (the
compute itself runs an order of magnitude faster — see CLAUDE.md's
environment notes).  Raising M_MMAP_THRESHOLD keeps those buffers on the
main heap where freed blocks are recycled without refaulting.

Bench-only: with a high threshold the heap high-water mark is retained
for the process lifetime, which is the wrong trade for long-running live
capture — call this from short-lived benchmark processes only.
"""

from __future__ import annotations

import ctypes
import ctypes.util

_M_MMAP_THRESHOLD = -3
_M_TRIM_THRESHOLD = -1
_done = False


def tuned() -> bool:
    """Whether malloc_tune() has been applied in this process (consumers
    like native.binding.alloc_array prefer recyclable heap allocations
    over one-shot mmaps when it has)."""
    return _done


def malloc_tune(mmap_threshold: int = 1 << 28) -> bool:
    """Raise glibc's mmap threshold (idempotent).  Returns True if the
    tuning was applied, False when unavailable (non-glibc platforms)."""
    global _done
    if _done:
        return True
    try:
        name = ctypes.util.find_library("c") or "libc.so.6"
        libc = ctypes.CDLL(name)
        ok = bool(libc.mallopt(_M_MMAP_THRESHOLD, mmap_threshold))
        # the OTHER half of the recycling story: after a large free glibc
        # TRIMS the heap top back to the kernel (default threshold 128 KB),
        # so the next allocation refaults every page.  On this VM class a
        # minor fault costs ~250 us of charged user time (userspace memory
        # backend), which made repeated decodes oscillate 1-12 MS/s with
        # the fault count.  A huge trim threshold keeps the heap mapped.
        ok = bool(libc.mallopt(_M_TRIM_THRESHOLD, mmap_threshold)) and ok
    except (OSError, AttributeError):
        return False
    _done = ok
    return ok
