"""BGZF codec + GZI index + native library parity."""

import gzip
import os
import struct

import numpy as np
import pytest

from pykmer_tpu.io import bgzf


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
