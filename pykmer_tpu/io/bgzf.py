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


def bgzip_kin(kin_path: str, level: int = 6, keep: bool = True) -> Tuple[str, str]:
    """Replicate the reference's post-indexing `bgzip -i` step: produce
    `.kin.bgz` + `.kin.bgz.gzi` next to the `.kin`."""
    bgz, gzi = compress_file(kin_path, write_index=True, level=level)
    if not keep:
        os.remove(kin_path)
    return bgz, gzi
