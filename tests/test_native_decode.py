"""SIMD decode paths vs the scalar reference semantics.

The native layer's MT decode uses an AVX2 classify + fused valid-run pass
and an AVX2/BMI2 bit-pack (native/pykmer_native.cpp decode_span_avx2 /
pack_span_avx2); these tests pin them against the serial per-byte path
(reference indexer.py:45-99, 130-160 semantics) at adversarial alignments:
lines of 31/32/33 bytes, valid runs of exactly K spanning line boundaries,
N runs splitting mid-AVX-block, and record boundaries at odd offsets.
"""

import numpy as np
import pytest

native = pytest.importorskip("pykmer_tpu.io.native")


def unpack_planes(bases: np.ndarray, mask: np.ndarray, n_codes: int):
    """Expand the 2-bit base plane + validity bitmap back to a code stream."""
    b = np.unpackbits(bases[: (n_codes + 3) // 4], bitorder="little")
    b = (b.reshape(-1, 2) * np.array([1, 2], np.uint8)).sum(1).astype(np.uint8)
    v = np.unpackbits(mask[: (n_codes + 7) // 8], bitorder="little")
    codes = np.where(v[:n_codes].astype(bool), b[:n_codes], 4).astype(np.uint8)
    return codes, v


def case_texts():
    texts = []
    # valid run of exactly K crossing a line boundary (K=15: 8 + 7)
    texts.append(">x\nNNACGTACGT\nACGTANNNNN\n")
    # run of K-1 (must NOT count) vs K (must) around N breaks
    texts.append(">a\n" + "ACGTACGTACGTAC" + "N" + "ACGTACGTACGTACG" + "\n")
    # 31/32/33-byte lines straddle the AVX2 32-byte stride
    for width in (31, 32, 33, 63, 64, 65):
        seq = ("ACGTN" * 40)[:width]
        texts.append(f">w{width}\n{seq}\n{seq}\n")
    # all-N record, empty record, lowercase, CRLF
    texts.append(">n\n" + "N" * 100 + "\n>e\n>l\nacgtacgtacgtacgt\r\n")
    # N at every position mod 32 (run-break inside each AVX lane position)
    base = list("ACGT" * 24)
    for p in range(0, 96, 7):
        s = base.copy()
        s[p] = "N"
        texts.append(">m%d\n%s\n" % (p, "".join(s)))
    return texts


@pytest.mark.parametrize("kmer_len", [3, 15])
def test_joined_decode_simd_vs_serial_cases(kmer_len):
    for text in case_texts():
        data = text.encode()
        # pad with filler records so the MT path actually splits threads
        recs = [data] + [b">f%d\n%s\n" % (i, b"ACGTN" * 60) for i in range(50)]
        blob = b"".join(recs)
        st = native.fasta_decode_joined_native(blob, kmer_len, threads=1)
        mt = native.fasta_decode_joined_native(blob, kmer_len, threads=4)
        assert np.array_equal(mt[0], st[0]), text
        assert mt[1] == st[1], text  # chromosomes ⇒ has_valid parity
        assert mt[2] == st[2], text


@pytest.mark.parametrize("kmer_len", [3, 15])
def test_packed_decode_plane_parity(kmer_len, rng):
    """bases/mask planes == bit-packed joined codes stream, MT, odd sizes."""
    if not getattr(native, "_HAVE_PACKED_DECODE", False):
        pytest.skip("stale .so without packed decode")
    alphabet = np.frombuffer(b"ACGTacgtN", dtype=np.uint8)
    parts = []
    sizes = [1, 31, 32, 33, 17_000, 120_003, 7, 64, 400_001]
    for i, n in enumerate(sizes):
        parts.append(f">rec-{i}\n".encode())
        seq = alphabet[rng.integers(0, len(alphabet), size=n)].tobytes()
        for j in range(0, n, 73):
            parts.append(seq[j : j + 73] + b"\n")
    data = b"".join(parts)

    want_codes, want_chroms, want_bp = native.fasta_decode_joined_native(
        data, kmer_len, threads=1
    )
    got = native.fasta_decode_joined_packed_native(data, kmer_len, threads=4)
    assert got is not None
    bases, mask, n_codes, chroms, bp = got
    assert n_codes == want_codes.shape[0]
    assert chroms == want_chroms
    assert bp == want_bp
    codes, _ = unpack_planes(bases, mask, n_codes)
    assert np.array_equal(codes, np.asarray(want_codes))
    # framing tail past the stream must be invalid (mask 0) and base 0
    total8 = (n_codes + 7) & ~7
    assert not mask[total8 // 8 :].any()
    assert not bases[total8 // 4 :].any()
    # pad cells inside the last partial byte must be invalid too
    vbits = np.unpackbits(mask[: total8 // 8], bitorder="little")
    assert not vbits[n_codes:].any()


def test_count_byte_matches_numpy(rng):
    for n in (0, 1, 31, 32, 33, 8191, 1 << 20, (1 << 20) + 7):
        buf = rng.integers(0, 256, size=n).astype(np.uint8)
        for v in (ord(">"), 0, 255):
            want = int((buf == v).sum())
            assert native._count_byte(np.ascontiguousarray(buf), v) == want
