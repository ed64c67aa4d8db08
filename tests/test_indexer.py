"""End-to-end indexer: byte parity with oracle and with the executed reference."""

import json
import os

import numpy as np
import pytest

from pykmer_tpu import testgen
from pykmer_tpu.config import IndexConfig
from pykmer_tpu.formats import kin as kinfmt
from pykmer_tpu.index import create_fasta_index, read_fasta_index
from pykmer_tpu.oracle import oracle_write_index
from conftest import make_random_fasta


def _file_bytes(path):
    with open(path, "rb") as fh:
        return fh.read()


@pytest.mark.parametrize("kmer_len", [3, 5, 7])
def test_indexer_matches_oracle_enumeration(tmp_path, kmer_len):
    prefix = str(tmp_path / "ex")
    fasta = testgen.create_test_fasta(prefix, kmer_len)

    # small chunks to exercise the streaming/halo path
    cfg = IndexConfig(kmer_len=kmer_len, chunk_windows=1000)
    header = create_fasta_index(fasta, "s", fasta, kmer_len, config=cfg, verbose=False)
    root = header.index_file_root
    ours_kin = _file_bytes(root)
    with open(header.metadata_file) as fh:
        ours_meta = json.load(fh)
    os.rename(root, root + ".ours")
    os.remove(header.metadata_file)

    oracle_write_index(fasta, fasta, kmer_len)
    assert _file_bytes(root) == ours_kin
    with open(header.metadata_file) as fh:
        oracle_meta = json.load(fh)
    volatile = {"creation_time_start", "creation_time_end", "creation_duration",
                "output_file_ctime", "checksum_script"}
    for key in oracle_meta:
        if key not in volatile:
            assert ours_meta[key] == oracle_meta[key], f"mismatch in {key}"


def test_indexer_matches_oracle_random(tmp_path, rng):
    fasta = make_random_fasta(str(tmp_path / "r.fa"), rng, n_records=6,
                              lengths=(400, 33, 4, 900, 120, 77))
    kmer_len = 5
    cfg = IndexConfig(kmer_len=kmer_len, chunk_windows=64)
    header = create_fasta_index(fasta, "s", fasta, kmer_len, config=cfg, verbose=False)
    root = header.index_file_root
    ours_kin = _file_bytes(root)
    ours_meta = json.load(open(header.metadata_file))
    os.rename(root, root + ".ours")
    os.remove(header.metadata_file)

    oracle_write_index(fasta, fasta, kmer_len)
    assert _file_bytes(root) == ours_kin
    oracle_meta = json.load(open(header.metadata_file))
    assert ours_meta["num_kmers"] == oracle_meta["num_kmers"]
    assert ours_meta["chromosomes"] == oracle_meta["chromosomes"]
    assert ours_meta["hist"] == oracle_meta["hist"]
    assert ours_meta["vals_sum"] == oracle_meta["vals_sum"]


def test_indexer_host_strategy_matches_device(tmp_path, rng):
    fasta = make_random_fasta(str(tmp_path / "h.fa"), rng, n_records=3,
                              lengths=(300, 200, 100))
    kmer_len = 5
    cfg_d = IndexConfig(kmer_len=kmer_len, chunk_windows=128, accumulate="device")
    header = create_fasta_index(fasta, "s", fasta, kmer_len, config=cfg_d, verbose=False)
    kin_device = _file_bytes(header.index_file_root)
    os.remove(header.index_file_root)
    os.remove(header.metadata_file)

    cfg_h = IndexConfig(kmer_len=kmer_len, chunk_windows=128, accumulate="host")
    header = create_fasta_index(fasta, "s", fasta, kmer_len, config=cfg_h, verbose=False)
    assert _file_bytes(header.index_file_root) == kin_device


def test_indexer_matches_reference_random(tmp_path, rng):
    """Full pipeline vs the executed reference on a messy random FASTA."""
    from reference_runner import VOLATILE_KIN_JSON_KEYS, run_reference_indexer

    fasta = make_random_fasta(str(tmp_path / "g.fa.gz"), rng, n_records=4,
                              lengths=(250, 80, 10, 500), gzip_out=True)
    kmer_len = 7
    run_reference_indexer(fasta, "sample", kmer_len, str(tmp_path))
    root = kinfmt.kin_root_path(fasta, kmer_len)
    meta = kinfmt.metadata_path(fasta, kmer_len)
    ref_kin = _file_bytes(root)
    ref_meta = json.load(open(meta))
    os.rename(root, root + ".ref")
    os.remove(meta)

    create_fasta_index(fasta, "sample", fasta, kmer_len, verbose=False)
    assert _file_bytes(root) == ref_kin, "dense .kin differs from reference"
    our_meta = json.load(open(meta))
    assert set(our_meta) == set(ref_meta)
    for key in ref_meta:
        if key not in VOLATILE_KIN_JSON_KEYS:
            assert our_meta[key] == ref_meta[key], f"mismatch in {key}"


def test_overwrite_guard(tmp_path, rng):
    fasta = make_random_fasta(str(tmp_path / "o.fa"), rng)
    create_fasta_index(fasta, "s", fasta, 3, verbose=False)
    with pytest.raises(FileExistsError):
        create_fasta_index(fasta, "s", fasta, 3, overwrite=False, verbose=False)
    create_fasta_index(fasta, "s", fasta, 3, overwrite=True, verbose=False)


def test_read_fasta_index(tmp_path, rng):
    fasta = make_random_fasta(str(tmp_path / "v.fa"), rng)
    create_fasta_index(fasta, "s", fasta, 3, verbose=False)
    header = read_fasta_index(fasta, input_file=fasta, kmer_len=3, verbose=False)
    assert header.num_kmers > 0


def test_indexer_all_valid_chunks_match_oracle(tmp_path, rng):
    """A clean single-record genome (no Ns) with multi-chunk framing routes
    interior chunks through the mask-free all-valid device step — the output
    must stay byte-identical to the oracle (which knows nothing of chunks)."""
    from pykmer_tpu.ops.encode import mask_all_valid, pack_base_stream

    fasta = make_random_fasta(str(tmp_path / "clean.fa"), rng, n_records=1,
                              lengths=(5000,), with_n=False)
    kmer_len = 5
    # chunk_windows=1000 -> 5 chunks; all but the padded tail are all-valid
    cfg = IndexConfig(kmer_len=kmer_len, chunk_windows=1000)
    header = create_fasta_index(fasta, "s", fasta, kmer_len, config=cfg,
                                verbose=False)
    root = header.index_file_root
    ours_kin = _file_bytes(root)
    ours_meta = json.load(open(header.metadata_file))
    os.rename(root, root + ".ours")
    os.remove(header.metadata_file)

    oracle_write_index(fasta, fasta, kmer_len)
    assert _file_bytes(root) == ours_kin
    oracle_meta = json.load(open(header.metadata_file))
    assert ours_meta["num_kmers"] == oracle_meta["num_kmers"]
    assert ours_meta["hist"] == oracle_meta["hist"]


def test_mask_all_valid_edges():
    from pykmer_tpu.ops.encode import mask_all_valid

    full = np.full(4, 0xFF, dtype=np.uint8)
    assert mask_all_valid(full, 32)
    assert mask_all_valid(full, 29)  # partial tail byte, bits set
    broken = full.copy()
    broken[3] = 0xEF  # bit 28 clear
    assert not mask_all_valid(broken, 32)
    assert not mask_all_valid(broken, 29)
    assert mask_all_valid(broken, 28)  # clear bit is beyond span
    tail = np.array([0xFF, 0x0F], dtype=np.uint8)
    assert mask_all_valid(tail, 12)
    assert not mask_all_valid(tail, 13)


def test_segment_record_bounds(tmp_path, rng):
    from pykmer_tpu.index import indexer as idx

    fasta = make_random_fasta(str(tmp_path / "seg.fa"), rng, n_records=40,
                              lengths=(500, 133, 67))
    buf = np.fromfile(fasta, dtype=np.uint8)
    bounds = idx._segment_record_bounds(buf, target=1500)
    assert len(bounds) > 3
    assert bounds[0][0] == 0 and bounds[-1][1] == buf.shape[0]
    for (lo, hi), (lo2, _) in zip(bounds, bounds[1:]):
        assert hi == lo2  # contiguous cover
    for lo, _ in bounds[1:]:
        assert buf[lo] == ord(">") and buf[lo - 1] == ord("\n")


def test_pipelined_multisegment_matches_oracle(tmp_path, rng, monkeypatch):
    """Force the decode/dispatch pipeline into many small segments: output
    must stay byte-identical to the oracle (which decodes in one pass)."""
    from pykmer_tpu.index import indexer as idx

    try:
        import pykmer_tpu.io.native  # noqa: F401
    except ImportError:
        pytest.skip("native decode unavailable")

    fasta = make_random_fasta(str(tmp_path / "pipe.fa"), rng, n_records=40,
                              lengths=(500, 133, 67))
    orig = idx._iter_pipelined_chunks
    monkeypatch.setattr(
        idx, "_iter_pipelined_chunks",
        lambda data, k, cfg, sink: orig(data, k, cfg, sink,
                                        target_segment=1500),
    )
    kmer_len = 7
    cfg = IndexConfig(kmer_len=kmer_len, chunk_windows=1000)
    header = create_fasta_index(fasta, "s", fasta, kmer_len, config=cfg,
                                verbose=False)
    root = header.index_file_root
    ours_kin = _file_bytes(root)
    with open(header.metadata_file) as fh:
        ours_meta = json.load(fh)
    os.rename(root, root + ".ours")
    os.remove(header.metadata_file)

    oracle_write_index(fasta, fasta, kmer_len)
    assert _file_bytes(root) == ours_kin
    with open(header.metadata_file) as fh:
        oracle_meta = json.load(fh)
    assert ours_meta["num_kmers"] == oracle_meta["num_kmers"]
    assert ours_meta["hist"] == oracle_meta["hist"]
    assert ours_meta["chromosomes"] == oracle_meta["chromosomes"]

def test_streaming_input_segments_match_offline(tmp_path, rng):
    """Segment bounds discovered while chasing a (tiny-extent) background
    reader == the offline whole-buffer split."""
    from pykmer_tpu.index import indexer as idx

    fasta = make_random_fasta(str(tmp_path / "chase.fa"), rng, n_records=60,
                              lengths=(700, 133, 67))
    buf = np.fromfile(fasta, dtype=np.uint8)
    want = idx._segment_record_bounds(buf, target=2000)
    stream = idx._StreamingInput(fasta, extent=512)
    got = list(idx._iter_segments_streaming(stream, target=2000))
    assert got == want
    assert np.array_equal(stream.buf, buf)
    assert len(stream.input_checksum()) == 64


def test_streaming_segments_partial_fill_rescan(tmp_path, rng, monkeypatch):
    """Force the partial-fill rescan branch: a tiny wait slack + odd-sized
    read extents mean the scanner repeatedly reaches the fill point without
    finding a boundary (records are longer than the slack) and must rescan
    from ``avail - 1`` — including fill points that land INSIDE a ``\\n>``
    pair. The default 8 MB slack never exercises this on small files."""
    from pykmer_tpu.index import indexer as idx

    # long records => multi-KB gaps between boundaries, far above the slack
    fasta = make_random_fasta(str(tmp_path / "rescan.fa"), rng, n_records=8,
                              lengths=(2500, 400, 0))
    buf = np.fromfile(fasta, dtype=np.uint8)
    want = idx._segment_record_bounds(buf, target=1000)

    scans = {"n": 0}
    real_find = idx._find_record_start

    def counting_find(b, lo, hi):
        scans["n"] += 1
        return real_find(b, lo, hi)

    monkeypatch.setattr(idx, "_find_record_start", counting_find)

    # throttle the reader so the scanner reliably reaches the fill point
    # between extents (under full-suite load the reader can otherwise outrun
    # the scanner entirely and the rescan branch is never taken)
    import time as _time

    from pykmer_tpu.io import direct as _direct

    real_pread = _direct.pread_into_mt

    def slow_pread(rd, dst, pos, **kw):
        _time.sleep(0.0002)
        return real_pread(rd, dst, pos, **kw)

    monkeypatch.setattr(_direct, "pread_into_mt", slow_pread)
    # extent=7 (odd) guarantees some fill points split a "\n>" pair
    stream = idx._StreamingInput(fasta, extent=7)
    got = list(idx._iter_segments_streaming(stream, target=1000,
                                            wait_slack=1))
    assert got == want
    assert np.array_equal(stream.buf, buf)
    # every segment beyond the first needed many partial-window rescans
    assert scans["n"] > 4 * len(want)


def test_streaming_index_matches_gzip_path(tmp_path, rng):
    """Plain-file indexing (streaming reader path) is byte-identical to
    indexing the gzipped copy of the same content (whole-read path)."""
    import gzip as _gzip

    from pykmer_tpu.index import indexer as idx

    try:
        import pykmer_tpu.io.native  # noqa: F401
    except ImportError:
        pytest.skip("native decode unavailable")

    fasta = make_random_fasta(str(tmp_path / "sp.fa"), rng, n_records=30,
                              lengths=(900, 133, 67))
    with open(fasta, "rb") as fh:
        raw = fh.read()
    gz = str(tmp_path / "sp2.fa.gz")
    with _gzip.open(gz, "wb") as fh:
        fh.write(raw)

    kmer_len = 7
    cfg = IndexConfig(kmer_len=kmer_len, chunk_windows=1000)
    h1 = create_fasta_index(fasta, "s", fasta, kmer_len, config=cfg,
                            verbose=False)
    h2 = create_fasta_index(gz, "s", gz, kmer_len, config=cfg, verbose=False)
    assert _file_bytes(h1.index_file_root) == _file_bytes(h2.index_file_root)
    with open(h1.metadata_file) as fh:
        m1 = json.load(fh)
    with open(h2.metadata_file) as fh:
        m2 = json.load(fh)
    for key in ("num_kmers", "hist", "vals_sum", "vals_count",
                "output_file_cheksum"):
        assert m1[key] == m2[key], key
    # the plain path's input checksum must be the real file sha256
    import hashlib

    assert m1["input_file_cheksum"] == hashlib.sha256(raw).hexdigest()
