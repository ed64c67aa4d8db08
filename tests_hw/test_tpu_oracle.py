"""Oracle parity of the COMPILED (Mosaic) device pipeline on real TPU.

The CPU suite runs the Pallas kernels interpret-mode only; these tests push
a random genome through the real TPU backend — compiled tile-sweep kernel,
packed readback, multi-sub-plane tail — and demand byte-equality with the
NumPy gold implementation (pykmer_tpu/oracle/gold.py).
"""

import json
import os

import numpy as np

from pykmer_tpu.config import IndexConfig
from pykmer_tpu.index import create_fasta_index
from pykmer_tpu.oracle import oracle_canonical_codes, oracle_count_stream

BASE_LUT = np.frombuffer(b"ACGTN", dtype=np.uint8)


def _write_fasta(path, rng, n_bp, with_repeats=True):
    """Random genome with Ns and (optionally) saturating repeat bursts;
    returns the concatenated base-code sequence with record separators=4."""
    kmer_len = 11
    chunks = []
    with open(path, "wb") as fh:
        for r in range(3):
            seq = rng.integers(0, 5, size=n_bp // 3).astype(np.uint8)
            seq[seq == 4] = rng.integers(0, 4)  # mostly ACGT
            seq[:: max(997, 1)] = 4  # sparse Ns
            if with_repeats:
                motif = np.tile(
                    rng.integers(0, 4, size=kmer_len).astype(np.uint8), 400
                )
                seq = np.concatenate([seq, motif])
            fh.write(f">rec{r}\n".encode())
            fh.write(BASE_LUT[seq].tobytes())
            fh.write(b"\n")
            chunks.append(seq)
            chunks.append(np.array([4], dtype=np.uint8))  # separator
    return np.concatenate(chunks[:-1])


def _oracle_kin(seq, kmer_len):
    codes = oracle_canonical_codes(seq, kmer_len)
    return oracle_count_stream([codes], kmer_len), codes.shape[0]


def test_compiled_pallas_k11_oracle_parity(rng, tmp_path):
    """K=11 through the compiled Pallas tile sweep (auto on TPU) must be
    byte-identical to the gold NumPy implementation — incl. saturation."""
    k = 11
    fa = str(tmp_path / "hw.fa")
    seq = _write_fasta(fa, rng, 1_500_000)
    want, want_nk = _oracle_kin(seq, k)
    assert int(want.max()) == 255, "fixture must exercise saturation"

    h = create_fasta_index(
        fa, "hw", fa, k,
        config=IndexConfig(kmer_len=k, accumulate="device", kernel="pallas"),
        verbose=False,
    )
    got = np.fromfile(h.index_file_root, dtype=np.uint8)
    assert h.num_kmers == want_nk
    assert np.array_equal(got, want)


def test_compiled_multiplane_and_packed_readback(rng, tmp_path, monkeypatch):
    """The K>=17-shaped tail compiled on real TPU: tuple-of-sub-planes sweep
    (accumulate_sorted_planes) + 3-bit packed readback with escapes."""
    k = 11
    fa = str(tmp_path / "hwmp.fa")
    seq = _write_fasta(fa, rng, 800_000)
    want, want_nk = _oracle_kin(seq, k)

    # fold 2^21 cells -> 4 sub-planes
    monkeypatch.setenv("PYKMER_TPU_MAX_SWEEP_CELLS", str(1 << 19))
    h = create_fasta_index(
        fa, "hw", fa, k,
        config=IndexConfig(kmer_len=k, accumulate="device", readback="3bit"),
        verbose=False,
    )
    got = np.fromfile(h.index_file_root, dtype=np.uint8)
    assert h.num_kmers == want_nk
    assert np.array_equal(got, want)
    meta = json.load(open(h.metadata_file))
    assert meta["vals_max"] == int(want.max())
