"""O_DIRECT file I/O for GiB-scale `.kin` planes.

In this environment the disk itself is fast (~1.5 GB/s writes, ~2.5 GB/s
reads) but **page-cache page allocation is pathologically slow** (~13 MB/s
for fresh buffered writes, ~140 MB/s for fresh buffered reads — the guest
obtains new physical pages lazily and slowly, the same fault cost
``utils.bigmem`` dodges for anonymous memory). ``O_DIRECT`` transfers bypass
the page cache entirely, moving bytes straight between our pooled
(pre-faulted) arenas and the device:

    buffered write 1 GiB ≈ 150 s   →   O_DIRECT ≈ 0.7 s
    buffered read  1 GiB ≈ 7 s     →   O_DIRECT ≈ 0.4 s

Alignment rules (Linux): file offset, transfer length, and user buffer
address must all be multiples of the logical block size. We require the
conservative 4096. Both classes keep a buffered fd as fallback and split any
request into an aligned head (direct) + unaligned tail (buffered), so they
accept arbitrary requests while taking the fast path for the bulk.

The reference has no analog (its outputs go through plain buffered writes,
tools.py:333-342 sparse preallocation); this is host-runtime glue for the
TPU pipeline's 4^K-byte outputs and merge-time streaming reads.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

ALIGN = 4096
O_DIRECT = getattr(os, "O_DIRECT", 0)


def _pwrite_loop(fd: int, view: memoryview, offset: int) -> None:
    pos = offset
    while len(view):
        n = os.pwrite(fd, view, pos)
        view = view[n:]
        pos += n


def _pread_loop(fd: int, view: memoryview, offset: int) -> int:
    pos = offset
    total = 0
    while len(view):
        n = os.preadv(fd, [view], pos)
        if n == 0:
            break
        view = view[n:]
        pos += n
        total += n
    return total


def _split_aligned(arr: np.ndarray, offset: int) -> int:
    """Largest prefix length of ``arr`` eligible for O_DIRECT at ``offset``
    (0 when the buffer address or the offset is itself unaligned)."""
    if offset % ALIGN or arr.ctypes.data % ALIGN:
        return 0
    return arr.nbytes - (arr.nbytes % ALIGN)


class DirectWriter:
    """Positional writer with an O_DIRECT fast path.

    Creates/truncates ``path`` to ``size`` bytes up front; ``pwrite`` routes
    aligned spans through O_DIRECT and everything else through the buffered
    fd. Safe for concurrent ``pwrite`` calls on disjoint regions.
    """

    def __init__(self, path: str, size: Optional[int] = None, mode: int = 0o644):
        self.fd = os.open(path, os.O_RDWR | os.O_CREAT | os.O_TRUNC, mode)
        if size:
            os.ftruncate(self.fd, size)
        self.dfd: Optional[int] = None
        # retired direct fd after an O_DIRECT failure: NOT closed until
        # close() — closing mid-run would let the kernel recycle the fd
        # number under a concurrent pwrite on another thread (the chase
        # sink runs a 2-thread writer pool on one DirectWriter)
        self._retired_dfd: Optional[int] = None
        if O_DIRECT and not os.environ.get("PYKMER_TPU_NO_DIRECT"):
            try:
                self.dfd = os.open(path, os.O_WRONLY | O_DIRECT)
            except OSError:
                self.dfd = None

    def pwrite(self, arr: np.ndarray, offset: int) -> None:
        arr = np.ascontiguousarray(arr).view(np.uint8).reshape(-1)
        dfd = self.dfd  # snapshot: another thread may retire it mid-call
        head = _split_aligned(arr, offset) if dfd is not None else 0
        if head:
            try:
                _pwrite_loop(dfd, memoryview(arr[:head]), offset)
            except OSError:
                # device rejected direct I/O (e.g. unusual block size):
                # disable the fast path and redo buffered
                self._retired_dfd = dfd
                self.dfd = None
                head = 0
        if arr.nbytes - head:
            _pwrite_loop(self.fd, memoryview(arr[head:]), offset + head)

    def close(self) -> None:
        for attr in ("dfd", "_retired_dfd"):
            v = getattr(self, attr)
            if v is not None:
                os.close(v)
                setattr(self, attr, None)
        if self.fd is not None:
            os.close(self.fd)
            self.fd = None

    def __enter__(self) -> "DirectWriter":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


class DirectReader:
    """Positional reader with an O_DIRECT fast path into caller buffers.

    ``pread_into`` fills a (preferably pool-aligned) uint8 array and returns
    the byte count read (short only at EOF). Thread-safe for concurrent
    positional reads.
    """

    def __init__(self, path: str):
        self.fd = os.open(path, os.O_RDONLY)
        self.size = os.fstat(self.fd).st_size
        self.dfd: Optional[int] = None
        if O_DIRECT and not os.environ.get("PYKMER_TPU_NO_DIRECT"):
            try:
                self.dfd = os.open(path, os.O_RDONLY | O_DIRECT)
            except OSError:
                self.dfd = None

    def pread_into(self, arr: np.ndarray, offset: int) -> int:
        arr = arr.view(np.uint8).reshape(-1)
        assert arr.flags.c_contiguous
        want = min(arr.nbytes, max(self.size - offset, 0))
        if want <= 0:
            return 0
        head = 0
        if self.dfd is not None:
            head = _split_aligned(arr[:want], offset)
            if head:
                try:
                    got = _pread_loop(self.dfd, memoryview(arr[:head]), offset)
                except OSError:
                    os.close(self.dfd)
                    self.dfd = None
                    head = 0
                else:
                    if got < head:  # EOF inside the head
                        return got
        tail = want - head
        if tail:
            got = _pread_loop(self.fd, memoryview(arr[head:want]), offset + head)
            return head + got
        return head

    def close(self) -> None:
        if self.dfd is not None:
            os.close(self.dfd)
            self.dfd = None
        if self.fd is not None:
            os.close(self.fd)
            self.fd = None

    def __enter__(self) -> "DirectReader":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


READ_THREADS = 4
READ_CHUNK = 64 << 20


def pread_into_mt(
    reader: DirectReader,
    arr: np.ndarray,
    offset: int = 0,
    threads: int = READ_THREADS,
    chunk: int = READ_CHUNK,
) -> int:
    """Parallel positional read into ``arr`` (returns bytes read).

    Concurrent O_DIRECT reads of disjoint 64 MiB ranges run ~4× faster than
    one serial stream on this device (~3.2 GB/s vs 0.75)."""
    arr = arr.view(np.uint8).reshape(-1)
    want = min(arr.nbytes, max(reader.size - offset, 0))
    if want <= chunk or threads <= 1:
        return reader.pread_into(arr[:want], offset)
    bounds = list(range(0, want, chunk)) + [want]

    def work(i: int) -> int:
        lo, hi = bounds[i], bounds[i + 1]
        return reader.pread_into(arr[lo:hi], offset + lo)

    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(threads) as ex:
        return sum(ex.map(work, range(len(bounds) - 1)))


def read_file_into(path: str, arr: np.ndarray, offset: int = 0) -> int:
    """One-shot parallel direct read of ``path`` into ``arr``."""
    with DirectReader(path) as r:
        return pread_into_mt(r, arr, offset)
