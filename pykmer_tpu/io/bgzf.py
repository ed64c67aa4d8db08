"""BGZF (block-gzip) codec + GZI random-access index.

The reference relies on the external htslib ``bgzip`` binary to produce
`.kin.bgz` + `.kin.bgz.gzi` (README.md:26-28, 263-268) and reads them back
through plain ``gzip`` (tools.py:294-302 — BGZF is a valid stream of
concatenated gzip members). This module implements the codec natively so the
framework is self-contained and interoperable with htslib files:

- blocks of <= 65280 uncompressed bytes, each a gzip member with the BC extra
  subfield carrying BSIZE (SAMv1 spec §4.1);
- the standard 28-byte EOF marker block;
- `.gzi`: uint64 count then (compressed_offset, uncompressed_offset) uint64
  pairs for every block except the first (htslib bgzf_index_dump layout,
  consumed by reference gzireader.py:21-37).

A C++ fast path (io/native) accelerates compression; this pure-Python zlib
implementation is the always-available fallback and the format reference.
"""

from __future__ import annotations

import os
import struct
import zlib
from typing import BinaryIO, Iterator, List, Optional, Tuple

BGZF_BLOCK_SIZE = 65280  # uncompressed payload per block (htslib)
BGZF_EOF = bytes.fromhex(
    "1f8b08040000000000ff0600424302001b0003000000000000000000"
)
_HEADER = struct.Struct("<4BI2BH2BHH")  # gzip hdr, XLEN, SI1 SI2, SLEN, BSIZE
_FOOTER = struct.Struct("<2I")


def _compress_block(payload: bytes, level: int) -> bytes:
    co = zlib.compressobj(level, zlib.DEFLATED, -15)
    deflated = co.compress(payload) + co.flush()
    bsize = _HEADER.size + len(deflated) + _FOOTER.size
    if bsize > 65536:
        raise ValueError("BGZF block overflow (incompressible payload)")
    header = _HEADER.pack(
        0x1F, 0x8B, 0x08, 0x04,  # magic, deflate, FEXTRA
        0,                        # MTIME
        0, 0xFF,                  # XFL, OS=unknown
        6,                        # XLEN
        0x42, 0x43,               # 'B','C'
        2,                        # SLEN
        bsize - 1,                # BSIZE
    )
    footer = _FOOTER.pack(zlib.crc32(payload), len(payload) & 0xFFFFFFFF)
    return header + deflated + footer


def compress_file(
    src_path: str,
    dst_path: Optional[str] = None,
    level: int = 6,
    write_index: bool = True,
    block_size: int = BGZF_BLOCK_SIZE,
) -> Tuple[str, Optional[str]]:
    """bgzip-equivalent: src → src.bgz (+ .gzi when ``write_index``)."""
    if dst_path is None:
        dst_path = src_path + ".bgz"
    offsets: List[Tuple[int, int]] = []  # (compressed, uncompressed) per block
    cofs = uofs = 0
    # fast path: whole-file parallel compression in C++ (mmap'd input)
    if block_size <= BGZF_BLOCK_SIZE and os.path.getsize(src_path) > 0:
        try:
            from .native import bgzf_compress_buffer_native
            import numpy as np

            src_map = np.memmap(src_path, dtype=np.uint8, mode="r")
            result = bgzf_compress_buffer_native(
                src_map, level=level, block_size=block_size
            )
        except ImportError:
            result = None
        if result is not None:
            compressed, csizes = result
            with open(dst_path, "wb") as dst:
                compressed.tofile(dst)
                dst.write(BGZF_EOF)
            n = int(src_map.shape[0])
            for i in range(csizes.shape[0]):
                offsets.append((cofs, uofs))
                cofs += int(csizes[i])
                uofs += min(block_size, n - uofs)
            gzi_path = None
            if write_index:
                gzi_path = dst_path + ".gzi"
                write_gzi(gzi_path, offsets)
            return dst_path, gzi_path
    try:
        from .native import bgzf_compress_native

        native = bgzf_compress_native
    except ImportError:
        native = None
    with open(src_path, "rb") as src, open(dst_path, "wb") as dst:
        while True:
            payload = src.read(block_size)
            if not payload:
                break
            offsets.append((cofs, uofs))
            block = (
                native(payload, level) if native is not None
                else _compress_block(payload, level)
            )
            dst.write(block)
            cofs += len(block)
            uofs += len(payload)
        dst.write(BGZF_EOF)
    gzi_path = None
    if write_index:
        gzi_path = dst_path + ".gzi"
        write_gzi(gzi_path, offsets)
    return dst_path, gzi_path


def write_gzi(path: str, offsets: List[Tuple[int, int]]) -> None:
    """htslib layout: entry count then pairs for every block but the first."""
    entries = offsets[1:]
    with open(path, "wb") as fh:
        fh.write(struct.pack("<Q", len(entries)))
        for cofs, uofs in entries:
            fh.write(struct.pack("<QQ", cofs, uofs))


def read_gzi(path: str) -> List[Tuple[int, int]]:
    with open(path, "rb") as fh:
        (count,) = struct.unpack("<Q", fh.read(8))
        return [struct.unpack("<QQ", fh.read(16)) for _ in range(count)]


def iter_blocks(fh: BinaryIO) -> Iterator[bytes]:
    """Decode a BGZF stream block by block (also accepts plain gzip members)."""
    while True:
        header = fh.read(12)
        if len(header) == 0:
            return
        if len(header) < 12:
            raise IOError("truncated BGZF header")
        magic1, magic2, method, flags = header[0], header[1], header[2], header[3]
        if (magic1, magic2) != (0x1F, 0x8B):
            raise IOError("not a gzip/BGZF stream")
        (xlen,) = struct.unpack_from("<H", header, 10)
        if not flags & 4:
            raise IOError("gzip member without FEXTRA: not BGZF")
        extra = fh.read(xlen)
        bsize = None
        pos = 0
        while pos + 4 <= len(extra):
            si1, si2, slen = extra[pos], extra[pos + 1], struct.unpack_from("<H", extra, pos + 2)[0]
            if (si1, si2) == (0x42, 0x43) and slen == 2:
                bsize = struct.unpack_from("<H", extra, pos + 4)[0] + 1
            pos += 4 + slen
        if bsize is None:
            raise IOError("missing BC subfield: not BGZF")
        cdata_len = bsize - 12 - xlen - 8
        cdata = fh.read(cdata_len)
        crc, isize = struct.unpack("<2I", fh.read(8))
        payload = zlib.decompress(cdata, -15)
        if len(payload) != isize or zlib.crc32(payload) != crc:
            raise IOError("BGZF block checksum mismatch")
        if payload:
            yield payload


def decompress_file(path: str) -> bytes:
    with open(path, "rb") as fh:
        return b"".join(iter_blocks(fh))


def read_block_at(path: str, compressed_offset: int) -> bytes:
    """Random access: decode the single block starting at ``compressed_offset``
    (offsets come from the `.gzi` index)."""
    with open(path, "rb") as fh:
        fh.seek(compressed_offset)
        for payload in iter_blocks(fh):
            return payload
    return b""


class BgzfBlockIndex:
    """Per-block (compressed_offset, uncompressed_offset) map of a BGZF file.

    Loaded from the `.gzi` sidecar when present (the reference's reason for
    carrying it — gzireader.py:21-37); otherwise built by a one-pass header
    scan: each block header carries its compressed size (BSIZE), so the scan
    reads 26 bytes per 64 KB block. Offsets are numpy arrays with end
    sentinels, so ``searchsorted`` maps any uncompressed range to its block
    run in O(log n)."""

    def __init__(self, path: str):
        import numpy as np

        self.path = path
        size = os.path.getsize(path)
        gzi = path + ".gzi"
        with open(path, "rb") as fh:
            c = u = None
            if os.path.exists(gzi):
                try:
                    c, u = self._from_gzi(fh, gzi, size)
                except (IOError, OSError, struct.error):
                    # stale sidecar (e.g. the .bgz was regenerated without
                    # refreshing the .gzi): silently trusting it would yield
                    # wrong block extents and zlib errors mid-read — rebuild
                    # the map from the block headers instead
                    c = u = None
            if c is None:
                c, u = self._scan(fh, size)
        self.c_offs = np.asarray(c, dtype=np.int64)
        self.u_offs = np.asarray(u, dtype=np.int64)

    def _from_gzi(self, fh, gzi: str, size: int):
        pairs = read_gzi(gzi)
        c = [0] + [p[0] for p in pairs]
        u = [0] + [p[1] for p in pairs]
        # sidecar consistency: offsets strictly increasing, every compressed
        # offset inside the file and pointing at a BGZF block header
        for i in range(1, len(c)):
            if c[i] <= c[i - 1] or u[i] <= u[i - 1]:
                raise IOError(f"{gzi}: non-monotonic offsets")
        for coff in (c[-1], c[1] if len(c) > 1 else None):
            if coff is None:
                continue
            if coff + 18 > size:
                raise IOError(f"{gzi}: offset {coff} beyond file size {size}")
            fh.seek(coff)
            if fh.read(4) != b"\x1f\x8b\x08\x04":
                raise IOError(f"{gzi}: offset {coff} is not a BGZF header")
        # end sentinels: strip the 28-byte EOF marker if present;
        # the last block's ISIZE sits in its final 4 bytes
        c_end = size
        fh.seek(max(size - len(BGZF_EOF), 0))
        if fh.read(len(BGZF_EOF)) == BGZF_EOF:
            c_end = size - len(BGZF_EOF)
        if c_end <= 0:  # empty file (EOF marker only)
            if len(c) > 1:
                raise IOError(f"{gzi}: entries for an empty file")
            return [0, 0], [0, 0]
        if c[-1] >= c_end:
            raise IOError(f"{gzi}: last offset {c[-1]} at/after EOF marker")
        fh.seek(c_end - 4)
        (last_isize,) = struct.unpack("<I", fh.read(4))
        c.append(c_end)
        u.append(u[-1] + last_isize)
        return c, u

    def _scan(self, fh, size: int):
        c, u = [], []
        cofs = uofs = 0
        while cofs < size:
            fh.seek(cofs)
            header = fh.read(18)
            if len(header) < 18:
                raise IOError("truncated BGZF header")
            if header[:4] != b"\x1f\x8b\x08\x04":
                raise IOError("not a BGZF stream")
            (xlen,) = struct.unpack_from("<H", header, 10)
            # htslib always writes BC first in EXTRA; fall back to a
            # full subfield walk if it is not
            if header[12:16] == b"BC\x02\x00":
                (bsize,) = struct.unpack_from("<H", header, 16)
                bsize += 1
            else:
                extra = header[12:18] + fh.read(xlen - 6)
                bsize = None
                pos = 0
                while pos + 4 <= len(extra):
                    si, slen = extra[pos:pos + 2], struct.unpack_from(
                        "<H", extra, pos + 2)[0]
                    if si == b"BC" and slen == 2:
                        bsize = struct.unpack_from(
                            "<H", extra, pos + 4)[0] + 1
                    pos += 4 + slen
                if bsize is None:
                    raise IOError("missing BC subfield: not BGZF")
            fh.seek(cofs + bsize - 4)
            (isize,) = struct.unpack("<I", fh.read(4))
            if isize:
                c.append(cofs)
                u.append(uofs)
            uofs += isize
            cofs += bsize
        c.append(cofs)
        u.append(uofs)
        return c, u

    @property
    def uncompressed_size(self) -> int:
        return int(self.u_offs[-1])


class BgzfRangeReader:
    """Index-guided random access into a BGZF file with parallel inflate.

    ``read_into(out, uoff)`` fills ``out`` with the uncompressed bytes at
    [uoff, uoff + len(out)), inflating the covering blocks concurrently on
    ``pool`` (zlib releases the GIL, so block inflates scale across cores —
    the merge engine's N-stream readers previously decoded each `.bgz` as
    one serial gzip stream, VERDICT r2 #5)."""

    def __init__(self, path: str, pool=None):
        self.index = BgzfBlockIndex(path)
        self.fh = open(path, "rb")
        self.pool = pool
        import threading

        self._lock = threading.Lock()  # pread emulation over one fd

    def _pread(self, off: int, n: int) -> bytes:
        try:
            return os.pread(self.fh.fileno(), n, off)
        except (AttributeError, OSError):
            with self._lock:
                self.fh.seek(off)
                return self.fh.read(n)

    def _inflate(self, b: int) -> bytes:
        c0, c1 = int(self.index.c_offs[b]), int(self.index.c_offs[b + 1])
        raw = self._pread(c0, c1 - c0)
        (xlen,) = struct.unpack_from("<H", raw, 10)
        return zlib.decompress(raw[12 + xlen:-8], -15)

    def read_into(self, out, uoff: int = 0) -> int:
        """Fill ``out`` (writable buffer) from uncompressed offset ``uoff``;
        returns bytes filled (short only at EOF)."""
        import numpy as np

        mv = memoryview(out).cast("B")
        want = len(mv)
        u = self.index.u_offs
        total = self.index.uncompressed_size
        end = min(uoff + want, total)
        if end <= uoff:
            return 0
        b0 = int(np.searchsorted(u, uoff, side="right")) - 1
        b1 = int(np.searchsorted(u, end, side="left"))

        def place(b: int) -> None:
            payload = self._inflate(b)
            lo = max(int(u[b]), uoff)
            hi = min(int(u[b]) + len(payload), end)
            mv[lo - uoff:hi - uoff] = payload[lo - int(u[b]):hi - int(u[b])]

        blocks = range(b0, b1)
        if self.pool is not None and b1 - b0 > 1:
            list(self.pool.map(place, blocks))
        else:
            for b in blocks:
                place(b)
        return end - uoff

    def close(self) -> None:
        self.fh.close()


def bgzip_kin(kin_path: str, level: int = 6, keep: bool = True) -> Tuple[str, str]:
    """Replicate the reference's post-indexing `bgzip -i` step: produce
    `.kin.bgz` + `.kin.bgz.gzi` next to the `.kin`."""
    bgz, gzi = compress_file(kin_path, write_index=True, level=level)
    if not keep:
        os.remove(kin_path)
    return bgz, gzi
