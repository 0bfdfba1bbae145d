"""Host allocator tuning for large-array graph preprocessing.

The host-side pipeline (graph building, padded batching, multi-chip
re-layout) allocates and frees hundreds of MB of numpy arrays per batch.
glibc serves allocations above ``M_MMAP_THRESHOLD`` (128 kB default) with
fresh ``mmap`` regions and unmaps them on free, so every batch pays the
kernel's page-fault cost for the same memory again and again. On
virtualized hosts the fault path can be 10-30x slower than a warm-page
copy (measured ~150 MB/s vs ~4 GB/s on the dev machine), which made the
100k-atom shard prep take ~50 s of pure page faulting.

``tune_host_allocator()`` raises the mmap and trim thresholds via
``mallopt`` so large buffers are served from the (persistent, warm) heap.
Called once at package import; opt out with ``CHGNET_TPU_NO_MALLOC_TUNE=1``.
Trade-off: peak RSS is retained between batches instead of returned to the
OS — the standard choice for throughput-oriented numeric services.
"""

from __future__ import annotations

import ctypes
import os
import sys

_M_TRIM_THRESHOLD = -1
_M_MMAP_THRESHOLD = -3

_applied = False


def tune_host_allocator(threshold_bytes: int = 0x7FFFFFFF) -> bool:
    """Serve large allocations from the heap instead of fresh mmaps.

    Returns True if the tuning was applied (glibc only; silently a no-op
    elsewhere or when ``CHGNET_TPU_NO_MALLOC_TUNE=1``).
    """
    global _applied
    if _applied or os.environ.get("CHGNET_TPU_NO_MALLOC_TUNE") == "1":
        return _applied
    if not sys.platform.startswith("linux"):
        return False
    try:
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        ok1 = libc.mallopt(_M_MMAP_THRESHOLD, threshold_bytes)
        ok2 = libc.mallopt(_M_TRIM_THRESHOLD, threshold_bytes)
        _applied = bool(ok1) and bool(ok2)
    except OSError:  # pragma: no cover - non-glibc linux
        return False
    return _applied
