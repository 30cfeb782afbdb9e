"""Host allocator tuning — the TPU-era analog of the reference's pluggable
memory manager (reference: Source/GB_malloc_memory.c, GB_init.c:107-118).

XLA owns all device memory; what the host side owns is PLAN memory — the
routing engine and builders churn through hundreds of MB of short-lived
numpy temporaries.  Under Firecracker-style VMs, first-touch page faults
can run ~100x slower than resident memory, and glibc by default mmap()s
every large allocation and munmap()s it on free, so alloc-heavy plan
building re-faults the same address space over and over (measured here:
64 MB/s fault-in vs 4.8 GB/s steady-state).  Routing large allocations
through the brk heap and disabling trim makes pages fault once and live
for the process — a measured ~4.5x on plan-build numpy code.
"""

from __future__ import annotations

import ctypes

_done = False


def tune() -> bool:
    """Apply glibc malloc tuning (idempotent).  Returns True if applied."""
    global _done
    if _done:
        return True
    try:
        libc = ctypes.CDLL("libc.so.6")
        # glibc mallopt param codes: M_TRIM_THRESHOLD=-1, M_TOP_PAD=-2,
        # M_MMAP_THRESHOLD=-3.  Threshold at 512 MB: the plan builder's
        # typical temps (tens-to-hundreds of MB) reuse resident heap
        # pages, while GB-scale temps still go through mmap and RETURN on
        # free — an untrimmed heap accumulates every distinct temp size
        # and OOM-killed a GAP-scale plan build at 130 GB RSS.
        libc.mallopt(-3, 512 << 20)  # mid-size allocs via heap, not mmap
        libc.mallopt(-1, 1 << 30)    # never trim the heap back
        libc.mallopt(-2, 64 << 20)   # grow the heap in big steps
        _done = True
        return True
    except Exception:
        return False
