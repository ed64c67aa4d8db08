"""Hugepage-backed allocation for large host buffers.

This environment (Firecracker guest, THP=madvise) demand-pages anonymous
memory at ~370 us per 4 KiB page on first touch — ~78 s to touch 850 MB.
``MAP_POPULATE`` pre-faults the whole region in one syscall instead
(measured ~3 GB/s: 512 MB in 0.16 s). glibc returns >32 MiB allocations
straight to the OS on free, so every large numpy buffer pays the fault cost
again; this module routes big allocations through an anonymous populated
``mmap`` (plus ``MADV_HUGEPAGE`` for TLB friendliness) so the cost mostly
disappears.

No reference analog (the reference never allocates at this scale in one
process); this is host-runtime glue for the TPU pipeline's GiB-scale
decode/readback buffers.
"""

from __future__ import annotations

import mmap
from typing import Tuple, Union

import numpy as np

# below this, normal heap allocation is fine (glibc reuses it)
BIG_THRESHOLD = 8 << 20


def big_empty(shape: Union[int, Tuple[int, ...]], dtype=np.uint8) -> np.ndarray:
    """np.empty for large buffers, backed by a MADV_HUGEPAGE anonymous map.

    The mmap object stays referenced via the array base; the memory unmaps
    when the array is garbage-collected (as with normal numpy buffers).
    """
    if isinstance(shape, int):
        shape = (shape,)
    nbytes = int(np.prod(shape, dtype=np.int64)) * np.dtype(dtype).itemsize
    if nbytes < BIG_THRESHOLD:
        return np.empty(shape, dtype=dtype)
    flags = mmap.MAP_PRIVATE | mmap.MAP_ANONYMOUS
    flags |= getattr(mmap, "MAP_POPULATE", 0x8000)
    try:
        m = mmap.mmap(-1, nbytes, flags=flags)
        try:
            m.madvise(mmap.MADV_HUGEPAGE)
        except (AttributeError, OSError):
            pass
        return np.frombuffer(m, dtype=dtype).reshape(shape)
    except (ValueError, OSError):
        return np.empty(shape, dtype=dtype)


def big_zeros(shape, dtype=np.uint8) -> np.ndarray:
    """Zero-filled variant (anonymous mmap pages are already zero)."""
    arr = big_empty(shape, dtype)
    if arr.base is None:  # fell back to np.empty
        arr[...] = 0
    return arr
