"""BGZF codec + GZI index + native library parity."""

import gzip
import os
import struct
import subprocess
import sys

import numpy as np
import pytest

from pykmer_tpu.io import bgzf
from reference_runner import REFERENCE_DIR


def _run_reference_gzireader(gzi_path: str):
    """Execute the reference's gzireader.py on a `.gzi` and parse its printed
    (compressed_offset, uncompressed_offset) entries + entry count."""
    proc = subprocess.run(
        [sys.executable, os.path.join(REFERENCE_DIR, "gzireader.py"), gzi_path],
        capture_output=True, text=True, check=True,
    )
    entries = []
    count = None
    for line in proc.stdout.splitlines():
        toks = line.replace(",", "").split()
        if line.startswith("pos:"):
            assert toks[2] == "compressed_offset" and toks[4] == "uncompressed_offset"
            entries.append((int(toks[3]), int(toks[5])))
        elif line.startswith("number_entries"):
            count = int(toks[-1])
    assert count == len(entries)
    return entries


def _scan_block_offsets(bgz_path: str):
    """Independent block map from the raw BGZF headers: per block,
    (compressed_offset, uncompressed_offset) of its START."""
    size = os.path.getsize(bgz_path)
    blocks = []
    cofs = uofs = 0
    with open(bgz_path, "rb") as fh:
        while cofs < size:
            fh.seek(cofs)
            header = fh.read(18)
            assert header[:4] == b"\x1f\x8b\x08\x04"
            assert header[12:16] == b"BC\x02\x00"
            (bsize,) = struct.unpack_from("<H", header, 16)
            bsize += 1
            fh.seek(cofs + bsize - 4)
            (isize,) = struct.unpack("<I", fh.read(4))
            blocks.append((cofs, uofs, isize))
            uofs += isize
            cofs += bsize
    return blocks


@pytest.mark.parametrize("payload", ["random", "compressible"])
def test_gzi_matches_executed_reference(tmp_path, rng, payload):
    """The reference's gzireader.py, executed on our `.gzi`, prints exactly
    our writer's entries — and every entry matches the true block starts
    from an independent header scan (block-for-block interop proof;
    reference gzireader.py:21-37). Random payload exercises the
    incompressible case (deflate expands; blocks stay < 64 KiB)."""
    n = 5 * bgzf.BGZF_BLOCK_SIZE + 12345
    if payload == "random":
        data = rng.integers(0, 256, size=n).astype(np.uint8).tobytes()
    else:
        data = (b"ACGTACGT" * (n // 8 + 1))[:n]
    src = tmp_path / "payload.bin"
    src.write_bytes(data)
    bgz, gzi = bgzf.compress_file(str(src))

    ref_entries = _run_reference_gzireader(gzi)
    assert ref_entries == bgzf.read_gzi(gzi)

    # htslib GZI layout: one entry per block AFTER the first
    blocks = _scan_block_offsets(bgz)
    data_blocks = [b for b in blocks if b[2] > 0]
    assert len(ref_entries) == len(data_blocks) - 1
    for (c, u), (bc, bu, _) in zip(ref_entries, data_blocks[1:]):
        assert (c, u) == (bc, bu)
    # and the payload itself round-trips
    assert bgzf.decompress_file(bgz) == data


def test_gzi_reference_many_blocks(tmp_path, rng):
    """> 2^16 blocks: block count exceeds any 16-bit field, offsets keep
    climbing past uint16/uint32-of-blocks edges; reference tool still prints
    our index verbatim."""
    n_blocks = (1 << 16) + 7
    block = 64  # tiny blocks so the file stays ~4 MB
    data = rng.integers(0, 256, size=n_blocks * block).astype(np.uint8).tobytes()
    src = tmp_path / "many.bin"
    src.write_bytes(data)
    bgz, gzi = bgzf.compress_file(str(src), block_size=block)
    ref_entries = _run_reference_gzireader(gzi)
    assert len(ref_entries) == n_blocks - 1
    assert ref_entries == bgzf.read_gzi(gzi)
    assert ref_entries[-1][1] == (n_blocks - 1) * block
    # spot-check random access off a far entry through our reader
    c_off, u_off = ref_entries[1 << 16]
    assert bgzf.read_block_at(bgz, c_off) == data[u_off : u_off + block]


def test_bgzf_roundtrip(tmp_path, rng):
    data = rng.integers(0, 256, size=200_000).astype(np.uint8).tobytes()
    src = tmp_path / "x.bin"
    src.write_bytes(data)
    bgz, gzi = bgzf.compress_file(str(src))
    assert bgz.endswith(".bgz") and gzi.endswith(".gzi")
    assert bgzf.decompress_file(bgz) == data
    # readable by plain gzip (the reference reads .bgz this way,
    # tools.py:294-302)
    with gzip.open(bgz, "rb") as fh:
        assert fh.read() == data


def test_bgzf_eof_marker(tmp_path):
    src = tmp_path / "y.bin"
    src.write_bytes(b"hello world")
    bgz, _ = bgzf.compress_file(str(src))
    raw = open(bgz, "rb").read()
    assert raw.endswith(bgzf.BGZF_EOF)


def test_gzi_layout(tmp_path, rng):
    # 3 blocks => 2 gzi entries (htslib skips the first block)
    data = rng.integers(0, 256, size=3 * bgzf.BGZF_BLOCK_SIZE).astype(np.uint8)
    src = tmp_path / "z.bin"
    src.write_bytes(data.tobytes())
    bgz, gzi = bgzf.compress_file(str(src))
    entries = bgzf.read_gzi(gzi)
    assert len(entries) == 2
    assert entries[0][1] == bgzf.BGZF_BLOCK_SIZE
    assert entries[1][1] == 2 * bgzf.BGZF_BLOCK_SIZE
    with open(gzi, "rb") as fh:
        (count,) = struct.unpack("<Q", fh.read(8))
        assert count == 2
    # random access via the index
    block1 = bgzf.read_block_at(bgz, entries[0][0])
    assert block1 == data.tobytes()[bgzf.BGZF_BLOCK_SIZE : 2 * bgzf.BGZF_BLOCK_SIZE]


@pytest.mark.parametrize("with_gzi", [True, False])
def test_range_reader_matches_decompress(tmp_path, rng, with_gzi):
    """GZI-guided (or header-scan) random access must reproduce any
    uncompressed range exactly, block boundaries included."""
    from concurrent.futures import ThreadPoolExecutor

    n = 3 * bgzf.BGZF_BLOCK_SIZE + 12345
    data = rng.integers(0, 256, size=n).astype(np.uint8).tobytes()
    src = tmp_path / "r.bin"
    src.write_bytes(data)
    bgz, gzi = bgzf.compress_file(str(src))
    if not with_gzi:
        os.remove(gzi)
    idx = bgzf.BgzfBlockIndex(bgz)
    assert idx.uncompressed_size == n
    assert idx.c_offs.shape[0] == idx.u_offs.shape[0] == 5  # 4 blocks + end
    with ThreadPoolExecutor(3) as pool:
        r = bgzf.BgzfRangeReader(bgz, pool=pool)
        for uoff, size in [
            (0, n), (0, 1), (n - 1, 1), (12345, 200_000),
            (bgzf.BGZF_BLOCK_SIZE - 1, 2), (bgzf.BGZF_BLOCK_SIZE, 10),
            (2 * bgzf.BGZF_BLOCK_SIZE + 7, bgzf.BGZF_BLOCK_SIZE),
            (n - 5, 100),  # past EOF -> short read
        ]:
            out = bytearray(size)
            got = r.read_into(out, uoff)
            assert got == min(size, n - uoff)
            assert bytes(out[:got]) == data[uoff:uoff + got]
        r.close()


def test_range_reader_empty_file(tmp_path):
    src = tmp_path / "e.bin"
    src.write_bytes(b"")
    bgz, _ = bgzf.compress_file(str(src))
    idx = bgzf.BgzfBlockIndex(bgz)
    assert idx.uncompressed_size == 0
    r = bgzf.BgzfRangeReader(bgz)
    out = bytearray(8)
    assert r.read_into(out, 0) == 0
    r.close()


def test_gzi_print(tmp_path, rng, capsys):
    from pykmer_tpu.io.gzi import print_index

    data = rng.integers(0, 256, size=2 * bgzf.BGZF_BLOCK_SIZE).astype(np.uint8)
    src = tmp_path / "w.bin"
    src.write_bytes(data.tobytes())
    bgz, gzi = bgzf.compress_file(str(src))
    print_index(gzi)
    out = capsys.readouterr().out
    assert "number_entries" in out and "compressed_offset" in out


def test_bgzip_kin_roundtrip(tmp_path, rng):
    from pykmer_tpu.formats import kin as kinfmt

    dense = rng.integers(0, 256, size=4**5).astype(np.uint8)
    kin = tmp_path / "g.fa.05.kin"
    kinfmt.write_kin_array(str(kin), dense)
    bgz, gzi = bgzf.bgzip_kin(str(kin))
    arr = kinfmt.read_kin_array(str(tmp_path / "g.fa"), 5)
    assert np.array_equal(arr, dense)
    # resolve prefers .bgz
    assert kinfmt.resolve_kin_path(str(tmp_path / "g.fa"), 5).endswith(".bgz")


def test_native_parity(tmp_path, rng):
    native = pytest.importorskip("pykmer_tpu.io.native")
    # bgzf block == python block, byte-for-byte (same zlib level/strategy)
    payload = rng.integers(0, 100, size=50_000).astype(np.uint8).tobytes()
    assert native.bgzf_compress_native(payload, 6) == bgzf._compress_block(payload, 6)

    # native gzip/bgzf decompress
    data = rng.integers(0, 256, size=150_000).astype(np.uint8).tobytes()
    src = tmp_path / "n.bin"
    src.write_bytes(data)
    bgz, _ = bgzf.compress_file(str(src))
    assert bytes(native.gzip_decompress_native(bgz)) == data
    gz = tmp_path / "n.gz"
    with gzip.open(gz, "wb") as fh:
        fh.write(data)
    assert bytes(native.gzip_decompress_native(str(gz))) == data

    # native fasta decode vs python paths on the tricky cases
    from pykmer_tpu.io.fasta import decode_fasta_bytes
    from test_fasta import CASES

    for text in CASES:
        result = native.fasta_decode_native(text.encode())
        assert result is not None
        codes, starts, names = result
        expected = decode_fasta_bytes(text.encode())
        assert names == [r.name for r in expected]
        for r, rec in enumerate(expected):
            got = codes[starts[r] : starts[r + 1]]
            assert np.array_equal(got, rec.codes), text


def test_native_joined_decode_parity(tmp_path, rng):
    """C++ joined decode == python decode+concat on tricky inputs."""
    native = pytest.importorskip("pykmer_tpu.io.native")
    from pykmer_tpu.io.fasta import decode_fasta_bytes
    from pykmer_tpu.index.indexer import _concat_records
    from test_fasta import CASES
    from conftest import make_random_fasta
    import os

    texts = list(CASES)
    path = os.path.join(str(tmp_path), "rj.fa")
    make_random_fasta(path, rng, n_records=5, lengths=(300, 4, 90, 1000, 55))
    texts.append(open(path).read())
    for kmer_len in (3, 7):
        for text in texts:
            data = text.encode()
            got = native.fasta_decode_joined_native(data, kmer_len)
            assert got is not None
            want = _concat_records(decode_fasta_bytes(data), kmer_len)
            assert np.array_equal(got[0], want[0]), text
            assert got[1] == [tuple(c) for c in want[1]] or got[1] == want[1], text
            assert got[2] == want[2], text


def test_native_joined_decode_mt_inplace(rng):
    """The multithreaded decode (>=1 MiB triggers the in-place staged
    compaction path) matches the single-thread decode byte-for-byte."""
    native = pytest.importorskip("pykmer_tpu.io.native")

    # ~2.5 MiB, many records of uneven sizes so thread ranges land at odd
    # boundaries; Ns + lowercase + blank lines exercise the strip logic
    alphabet = np.frombuffer(b"ACGTacgtN", dtype=np.uint8)
    parts = []
    sizes = [1, 3, 17, 50_000, 120_003, 7, 999_999, 64, 300_000, 1_000_000]
    for i, n in enumerate(sizes):
        parts.append(f">rec-{i} d\n".encode())
        seq = alphabet[rng.integers(0, len(alphabet), size=n)].tobytes()
        for j in range(0, n, 61):
            parts.append(seq[j : j + 61] + b"\n")
        if i % 3 == 0:
            parts.append(b"\n")  # blank line between records
    data = b"".join(parts)
    assert len(data) > (1 << 20)

    for kmer_len in (3, 15):
        mt = native.fasta_decode_joined_native(data, kmer_len, threads=8)
        st = native.fasta_decode_joined_native(data, kmer_len, threads=1)
        assert mt is not None and st is not None
        assert np.array_equal(mt[0], st[0])
        assert mt[1] == st[1]
        assert mt[2] == st[2]


def test_stale_gzi_sidecar_falls_back(tmp_path, rng):
    """A .gzi left behind after the .bgz was regenerated (offsets now wrong)
    must not poison reads: BgzfBlockIndex detects the mismatch and rebuilds
    the map from the block headers (ADVICE r3 #2)."""
    n = 3 * bgzf.BGZF_BLOCK_SIZE + 500
    data1 = rng.integers(0, 256, size=n).astype(np.uint8).tobytes()
    src = tmp_path / "p.bin"
    src.write_bytes(data1)
    bgz, gzi = bgzf.compress_file(str(src))
    # regenerate the .bgz with different (compressible -> shorter) content
    data2 = (b"AC" * (n // 2 + 1))[:n]
    src.write_bytes(data2)
    bgzf.compress_file(str(src), bgz, write_index=False)
    assert os.path.exists(gzi)  # stale sidecar still present
    idx = bgzf.BgzfBlockIndex(bgz)
    assert idx.uncompressed_size == n
    reader = bgzf.BgzfRangeReader(bgz)
    try:
        out = np.empty(n, dtype=np.uint8)
        got = reader.read_into(out, 0)
        assert got == n and out.tobytes() == data2
    finally:
        reader.close()
    # garbage sidecar bytes (short/invalid) also fall back rather than crash
    with open(gzi, "wb") as fh:
        fh.write(b"\x07\x00")
    idx2 = bgzf.BgzfBlockIndex(bgz)
    assert idx2.uncompressed_size == n
