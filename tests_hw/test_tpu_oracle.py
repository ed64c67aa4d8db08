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


def test_compiled_k15_full_plane_oracle(rng, tmp_path):
    """K=15 at the PRODUCTION plane shape (2^29-cell folded plane, the
    headline-benchmark geometry) through the compiled int8 tile sweep +
    packed readback — byte-identical to the gold implementation. Small
    input (fast), full-size plane (the compiled shapes that matter)."""
    k = 15
    fa = str(tmp_path / "hw15.fa")
    seq = _write_fasta(fa, rng, 3_000_000)
    want, want_nk = _oracle_kin(seq, k)
    assert int(want.max()) == 255, "fixture must exercise saturation"

    h = create_fasta_index(
        fa, "hw15", fa, k,
        config=IndexConfig(kmer_len=k, accumulate="device"),
        verbose=False,
    )
    got = np.fromfile(h.index_file_root, dtype=np.uint8)
    assert h.num_kmers == want_nk
    assert np.array_equal(got, want)
    meta = json.load(open(h.metadata_file))
    assert meta["vals_max"] == 255


def _two_small_kins(rng, tmp_path, k=11):
    paths = []
    for tag in ("ma", "mb"):
        fa = str(tmp_path / f"{tag}.fa")
        _write_fasta(fa, rng, 400_000)
        h = create_fasta_index(
            fa, tag, fa, k, config=IndexConfig(kmer_len=k), verbose=False)
        paths.append(h.index_file_root)
    return paths


def test_merge_on_tpu_matches_stream_oracle(rng, tmp_path):
    """The device merge engine (validity planes + V.V^T int8 MXU matmul)
    on real TPU must reproduce the reference-shaped streamed pair counts
    (tools.py:439-493 semantics)."""
    from pykmer_tpu.merge import merge
    from pykmer_tpu.merge.merger import pair_counts_stream

    k = 11
    a, b = _two_small_kins(rng, tmp_path, k)
    out = str(tmp_path / "hwmerge")
    _, matrix = merge(out, [a, b], verbose=False)
    want = pair_counts_stream(a, b, 4**k)
    assert tuple(int(v) for v in matrix[0, 1]) == want
    assert tuple(int(v) for v in matrix[1, 0]) == (want[1], want[0], want[2])


def test_sharded_merge_step_hw(rng, tmp_path):
    """parallel/compare's shard_map merge step compiled on the real chip
    (1-device mesh — the machinery, not the scaling) vs numpy."""
    import jax
    from jax.sharding import Mesh

    from pykmer_tpu.parallel.compare import make_sharded_merge_step
    from pykmer_tpu.parallel.mesh import SHARD_AXIS

    n, cells = 3, 1 << 15
    mesh = Mesh(np.array(jax.devices()[:1]), (SHARD_AXIS,))
    step = make_sharded_merge_step(mesh, n)
    import jax.numpy as jnp

    acc = jax.device_put(jnp.zeros((n, n), dtype=jnp.int64),
                         step.acc_sharding)
    dense = rng.integers(0, 8, size=(n, cells)).astype(np.uint8)
    bits = np.packbits((dense >= 1) & (dense <= 255), axis=1)
    acc = step(acc, bits)
    v = ((dense >= 1) & (dense <= 255)).astype(np.int64)
    assert np.array_equal(np.asarray(acc), v @ v.T)


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


def test_sparse_readback_hw(rng, tmp_path, monkeypatch):
    """Sparse token-stream readback on the REAL backend: the device
    compaction (value-in-key unstable sort, side/escape compaction) must be
    bit-exact against the host oracle — lowering differences between XLA:CPU
    and the TPU backend cannot be caught by tests/ (r3 precedent: a kernel
    that was bit-exact in interpret mode miscompiled on hardware)."""
    import hashlib

    import jax.numpy as jnp

    from pykmer_tpu.ops.readback import (
        count_all_escapes,
        stream_dense_to_out,
        stream_sparse_planes_pieces,
        unfold_canonical,
    )

    monkeypatch.setenv("PYKMER_TPU_SPARSE_SEG", str(1 << 18))
    k = 11
    fold = 4**k // 2  # 2M cells, 8 segments
    folded = np.zeros(fold, dtype=np.uint8)
    nz = rng.random(fold) < 0.06
    vals = rng.choice([1, 1, 1, 1, 2, 3, 9, 255], size=fold).astype(np.uint8)
    folded[nz] = vals[nz]
    folded[1000:9000] = 0  # long gaps
    dense = jnp.asarray(folded.reshape(-1, 128))

    exp = unfold_canonical(folded, k)
    out = np.empty(4**k, dtype=np.uint8)
    counts, hex_ = stream_dense_to_out(dense, k, out, mode="sparse",
                                       hash_out=True)
    assert np.array_equal(counts, np.bincount(folded, minlength=256))
    assert np.array_equal(out, exp)
    assert hex_ == hashlib.sha256(exp).hexdigest()

    # arena-free pieces path on hardware (two planes through one file)
    monkeypatch.setenv("PYKMER_TPU_SPARSE_MIN", "1")
    half = fold // 2
    planes = [
        jnp.asarray(folded[:half].reshape(-1, 128)),
        jnp.asarray(folded[half:].reshape(-1, 128)),
    ]
    escapes = [count_all_escapes(p) for p in planes]
    path = str(tmp_path / "hw_pieces.bin")
    fd = os.open(path, os.O_CREAT | os.O_RDWR, 0o644)
    try:
        os.ftruncate(fd, 4**k)
        res = stream_sparse_planes_pieces(planes, k, fd, path, escapes,
                                          hash_out=True)
    finally:
        os.close(fd)
    assert res is not None
    counts2, hex2 = res
    assert np.array_equal(counts2, np.bincount(folded, minlength=256))
    assert hex2 == hashlib.sha256(exp).hexdigest()
    assert np.array_equal(np.fromfile(path, dtype=np.uint8), exp)


def test_production_step_programs_compile(rng):
    """Every production per-chunk step program COMPILES on the real TPU
    toolchain at shipping shapes (K=15 and K=17, masked + all-valid).

    Regression guard for a real near-miss: an innocuous-looking change to
    the K>=17 program (reducing the bool of an int64 compare straight to
    int32) crashed the TPU compiler subprocess — CPU tests, the virtual
    8-device dryrun, and interpret-mode Pallas all stayed green, so only a
    real-toolchain compile could have caught it before the benchmark run.
    Compiles are cached, so steady state costs seconds."""
    import jax.numpy as jnp

    from pykmer_tpu.config import IndexConfig, resolve_chunk_windows
    from pykmer_tpu.index.indexer import (
        _make_chunk_sorted_codes,
        _make_sweep_apply,
        _n_planes,
        _sweep_variant,
    )
    from pykmer_tpu.ops.encode import pack_base_stream
    from pykmer_tpu.ops.pallas_hist import dense_plane_shape

    for kmer_len in (15, 17):
        cfg = resolve_chunk_windows(IndexConfig(kmer_len=kmer_len))
        fold = 4**kmer_len // 2
        n_planes = _n_planes(fold)
        variant = _sweep_variant(cfg, fold, kmer_len, n_planes)
        span = cfg.chunk_windows + kmer_len - 1
        seq = rng.integers(0, 4, size=span).astype(np.uint8)
        seq[:: 100_003] = ord("N")  # force a real mask
        bases2, maskbits = pack_base_stream(seq)
        dev_b = jnp.asarray(bases2)

        # fresh counter per call: the step DONATES argument 0
        codes, nk = _make_chunk_sorted_codes(kmer_len, span, masked=True)(
            jnp.zeros((), dtype=jnp.int64), dev_b, jnp.asarray(maskbits)
        )
        assert int(nk) > 0
        codes_av, nk_av = _make_chunk_sorted_codes(
            kmer_len, span, masked=False
        )(jnp.zeros((), dtype=jnp.int64), dev_b)
        assert int(nk_av) == span - kmer_len + 1

        # one sweep dispatch per K proves the B program compiles too; at
        # K=17 the tuple-of-sub-planes variant (donated, readiness signal)
        step_b = _make_sweep_apply(kmer_len, variant, n_planes=n_planes)
        if n_planes == 1:
            dense = jnp.zeros(dense_plane_shape(fold), dtype=jnp.uint8)
            dense = step_b(dense, codes_av)
            assert int(jnp.sum(dense[0, :1].astype(jnp.int32))) >= 0
        else:
            per = fold // n_planes
            planes = tuple(
                jnp.zeros(dense_plane_shape(per), dtype=jnp.uint8)
                for _ in range(n_planes)
            )
            planes, sig = step_b(planes, codes_av)
            assert int(jnp.sum(planes[0][0, :1].astype(jnp.int32))) >= 0
        del codes, codes_av


def test_k19_last_subplane_sweep_hw(rng):
    """The Mosaic-compiled sweep applies int64 K=19 codes to the LAST
    production sub-plane (base 2^37 - 2^30 — offsets far beyond int32).

    K=19 is beyond the reference's envelope (its dense .kin would be
    257 GB, /root/reference/README.md:51-52). The full 137 GB (128 GiB) folded
    plane needs a pod (or the 128-sub-plane streamed sweep), but the
    K=19-specific device mechanism — ops.pallas_hist.localize_sorted
    mapping a globally sorted int64 stream onto an int32-indexed 2^30-cell
    window — runs here at FULL production sub-plane size on the real
    toolchain. Companion: scripts/certify_k19_sharded.py (virtual mesh:
    halo encode parity, int64 sort, full-shape AOT lower, range-spanning
    reduced windows)."""
    import jax.numpy as jnp

    from pykmer_tpu.ops.histogram import sort_codes_fast
    from pykmer_tpu.ops.pallas_hist import (
        MAX_SWEEP_CELLS,
        accumulate_sorted_pallas,
        dense_plane_shape,
        localize_sorted,
    )

    fold = 4**19 // 2  # 2^37
    cells = MAX_SWEEP_CELLS  # 2^30: the production sub-plane budget
    base = fold - cells  # plane 127 of 128
    codes = rng.integers(0, fold, size=1 << 22, dtype=np.int64)
    # saturation: one in-window cell hit 300x (> the 255 ceiling)
    hot = base + 12_345
    codes = np.concatenate([codes, np.full(300, hot, np.int64)])
    sorted_codes = sort_codes_fast(jnp.asarray(codes))
    local = localize_sorted(sorted_codes, base, base + cells)
    assert local.dtype == jnp.int32

    plane = jnp.zeros(dense_plane_shape(cells), dtype=jnp.uint8)
    out = accumulate_sorted_pallas(plane, local).reshape(-1)

    in_w = (codes >= base) & (codes < base + cells)
    uniq, counts = np.unique(codes[in_w] - base, return_counts=True)
    want = np.minimum(counts, 255).astype(np.uint8)
    assert uniq.shape[0] > 10_000  # ~2^22/128 uniform hits
    # compare on-device (a 1 GiB plane readback would ride the tunnel)
    got = np.asarray(out[jnp.asarray(uniq, dtype=jnp.int32)])
    assert np.array_equal(got, want)
    assert int(want.max()) == 255
    # int32-accumulated reduce (an .astype(int64) materialises 8 GiB);
    # total <= in-window codes * 255 << 2^31 so int32 cannot wrap
    total = int(jnp.sum(out, dtype=jnp.int32))
    assert total == int(want.astype(np.int64).sum()), "stray nonzeros"
