"""O_DIRECT file I/O roundtrips (io.direct).

Covers the alignment split logic: aligned bulk + unaligned tail, unaligned
buffers/offsets (pure buffered fallback), EOF-short reads, and concurrent
disjoint-region writes — the shapes the indexer/merge paths produce.
"""

import os

import numpy as np
import pytest

from pykmer_tpu.io.direct import ALIGN, DirectReader, DirectWriter, read_file_into
from pykmer_tpu.utils.bigmem import big_empty


def _payload(n, seed=0):
    return np.random.default_rng(seed).integers(0, 256, size=n, dtype=np.uint8)


@pytest.mark.parametrize("n", [0, 1, ALIGN - 1, ALIGN, ALIGN + 7, 3 * ALIGN + 513])
def test_write_read_roundtrip(tmp_path, n):
    path = str(tmp_path / f"f{n}.bin")
    data = _payload(n)
    with DirectWriter(path, size=n) as w:
        w.pwrite(data, 0)
    assert os.path.getsize(path) == n
    with open(path, "rb") as fh:
        assert fh.read() == data.tobytes()
    back = np.zeros(max(n, 1), dtype=np.uint8)
    assert read_file_into(path, back[:n] if n else back[:0]) == n
    assert np.array_equal(back[:n], data)


def test_aligned_bulk_path_used(tmp_path):
    """A pool-backed buffer with aligned size must take the O_DIRECT fd
    (when the filesystem supports it) and still produce identical bytes."""
    n = 32 << 20
    path = str(tmp_path / "big.bin")
    data = big_empty(n)
    data[...] = np.arange(n, dtype=np.uint64).view(np.uint8)[:n]
    w = DirectWriter(path, size=n)
    took_direct = w.dfd is not None and data.ctypes.data % ALIGN == 0
    w.pwrite(data, 0)
    w.close()
    back = big_empty(n)
    with DirectReader(path) as r:
        assert r.pread_into(back, 0) == n
    assert np.array_equal(back, data)
    assert took_direct or os.environ.get("PYKMER_TPU_NO_DIRECT")


def test_disjoint_region_writes(tmp_path):
    n = 8 * ALIGN
    path = str(tmp_path / "regions.bin")
    data = _payload(n, seed=1)
    with DirectWriter(path, size=n) as w:
        # mirror-style pattern: forward region + its mirror, out of order
        w.pwrite(data[4 * ALIGN :], 4 * ALIGN)
        w.pwrite(data[: 4 * ALIGN], 0)
    with open(path, "rb") as fh:
        assert fh.read() == data.tobytes()


def test_unaligned_offset_falls_back(tmp_path):
    path = str(tmp_path / "off.bin")
    data = _payload(2 * ALIGN, seed=2)
    with DirectWriter(path, size=2 * ALIGN + 100) as w:
        w.pwrite(data, 100)
    with open(path, "rb") as fh:
        raw = fh.read()
    assert raw[:100] == b"\0" * 100
    assert raw[100:] == data.tobytes()


def test_read_short_at_eof(tmp_path):
    path = str(tmp_path / "short.bin")
    data = _payload(ALIGN + 10, seed=3)
    with open(path, "wb") as fh:
        fh.write(data.tobytes())
    buf = big_empty(4 * ALIGN)
    with DirectReader(path) as r:
        got = r.pread_into(buf, 0)
    assert got == ALIGN + 10
    assert np.array_equal(buf[:got], data)
    # read starting past EOF
    with DirectReader(path) as r:
        assert r.pread_into(buf, ALIGN + 10) == 0
