"""Sparse (zero-run token) readback: device pack + native decode vs oracle.

The sparse mode ships one byte per nonzero folded cell instead of a
fixed-width plane (ops/readback.py); at K >= 17 coverage (~93% zeros) this
cuts the dominant d2h transfer ~3x and the host-side unfold traffic ~10x.
Correctness surface: token gap coding (incl. > 83 gaps via the side stream),
escape (>= 3) patching through the batched gather, segment boundaries,
canonical unfold targets, exact 256-bin counts, chase-sink write + sha256.
"""

import hashlib
import os

import numpy as np
import pytest

import jax.numpy as jnp

from pykmer_tpu.ops.readback import (
    _pick_mode,
    count_all_escapes,
    stream_dense_planes_to_out,
    stream_dense_to_out,
    unfold_canonical,
)


def _folded_plane(rng, fold, density, long_zero_runs=True):
    folded = np.zeros(fold, dtype=np.uint8)
    nz = rng.random(fold) < density
    vals = rng.choice(
        [1, 1, 1, 1, 1, 2, 2, 3, 7, 15, 100, 255], size=fold
    ).astype(np.uint8)
    folded[nz] = vals[nz]
    if long_zero_runs:
        # force gaps far beyond SPARSE_LONG_GAP, incl. one opening a segment
        folded[: 3000] = 0
        folded[fold // 3 : fold // 3 + 5000] = 0
    return folded


@pytest.mark.parametrize("density", [0.0, 0.08, 0.6])
def test_sparse_matches_oracle(rng, monkeypatch, density):
    """Forced sparse mode reproduces the unfolded plane, counts and hash;
    density 0.6 overflows the token cap and exercises the 2bit fallback."""
    monkeypatch.setenv("PYKMER_TPU_SPARSE_SEG", str(1 << 15))
    k = 9
    fold = 4**k // 2
    folded = _folded_plane(rng, fold, density)
    dense = jnp.asarray(folded.reshape(-1, 128))

    exp = unfold_canonical(folded, k)
    exp_counts = np.bincount(folded, minlength=256).astype(np.int64)

    out = np.empty(4**k, dtype=np.uint8)
    counts, hex_ = stream_dense_to_out(dense, k, out, mode="sparse",
                                       hash_out=True)
    assert np.array_equal(counts, exp_counts)
    assert np.array_equal(out, exp)
    assert hex_ == hashlib.sha256(exp).hexdigest()


def test_sparse_ragged_tail_segment(rng, monkeypatch):
    """Plane size not a multiple of the segment size: the tail segment gets
    its own static shapes and decodes correctly."""
    monkeypatch.setenv("PYKMER_TPU_SPARSE_SEG", str(3 * (1 << 13)))
    k = 9
    fold = 4**k // 2
    folded = _folded_plane(rng, fold, 0.1)
    dense = jnp.asarray(folded.reshape(-1, 128))
    out = np.empty(4**k, dtype=np.uint8)
    counts = stream_dense_to_out(dense, k, out, mode="sparse")
    assert np.array_equal(out, unfold_canonical(folded, k))
    assert np.array_equal(counts, np.bincount(folded, minlength=256))


def test_sparse_multi_plane_with_file(rng, monkeypatch, tmp_path):
    """K >= 17-style tuple of sub-planes through the shared chase sink:
    bytes on disk + sha256 + counts all match the oracle."""
    monkeypatch.setenv("PYKMER_TPU_SPARSE_SEG", str(1 << 14))
    k = 9
    fold = 4**k // 2
    folded = _folded_plane(rng, fold, 0.07)
    half = fold // 2
    planes = [
        jnp.asarray(folded[:half].reshape(-1, 128)),
        jnp.asarray(folded[half:].reshape(-1, 128)),
    ]
    exp = unfold_canonical(folded, k)
    out = np.empty(4**k, dtype=np.uint8)
    path = str(tmp_path / "plane.bin")
    fd = os.open(path, os.O_CREAT | os.O_WRONLY, 0o644)
    try:
        counts, hex_ = stream_dense_planes_to_out(
            planes, k, out, mode="sparse", fd=fd, hash_out=True
        )
    finally:
        os.close(fd)
    assert np.array_equal(out, exp)
    assert np.array_equal(counts, np.bincount(folded, minlength=256))
    assert hex_ == hashlib.sha256(exp).hexdigest()
    on_disk = np.fromfile(path, dtype=np.uint8)
    assert np.array_equal(on_disk, exp)


def test_pick_mode_prices_sparse(monkeypatch):
    """The auto cost model picks sparse exactly when the token stream beats
    the cheapest fixed-width plane (and only where the plane qualifies)."""
    monkeypatch.setenv("PYKMER_TPU_SPARSE_MIN", "1024")
    dense = jnp.zeros((64, 128), dtype=jnp.uint8)  # shape/viability probe
    size = 1 << 30
    # lambda ~0.1: n_nz ~ size/10 -> sparse (size/10 + size/64) < 2bit size/4
    low = (size // 10, 1000, 100, 10)
    assert _pick_mode(dense, size, "auto", escapes=low) == "sparse"
    # dense plane: n_nz ~ 0.8*size -> fixed width wins
    high = (size * 4 // 5, 1000, 100, 10)
    assert _pick_mode(dense, size, "auto", escapes=high) == "2bit"
    # sparse disabled by env
    monkeypatch.setenv("PYKMER_TPU_SPARSE", "0")
    assert _pick_mode(dense, size, "auto", escapes=low) == "2bit"
    monkeypatch.delenv("PYKMER_TPU_SPARSE")
    # pre-r4 3-tuple escapes still resolve (no sparse candidate)
    assert _pick_mode(dense, size, "auto", escapes=low[1:]) == "2bit"


def test_count_all_escapes_includes_nonzeros(rng):
    folded = _folded_plane(rng, 1 << 12, 0.2, long_zero_runs=False)
    dense = jnp.asarray(folded.reshape(-1, 128))
    n1, n3, n7, n15 = (int(v) for v in count_all_escapes(dense))
    assert n1 == int((folded >= 1).sum())
    assert n3 == int((folded >= 3).sum())
    assert n7 == int((folded >= 7).sum())
    assert n15 == int((folded >= 15).sum())


def test_sparse_pieces_matches_oracle(rng, monkeypatch, tmp_path):
    """Arena-free piece readback (stream_sparse_planes_pieces): bytes on
    disk, sha256 and counts all match the oracle — no 4^K host buffer."""
    from pykmer_tpu.ops.readback import stream_sparse_planes_pieces

    monkeypatch.setenv("PYKMER_TPU_SPARSE_SEG", str(1 << 14))
    monkeypatch.setenv("PYKMER_TPU_SPARSE_MIN", "1")
    k = 9
    fold = 4**k // 2
    folded = _folded_plane(rng, fold, 0.05)
    half = fold // 2
    planes = [
        jnp.asarray(folded[:half].reshape(-1, 128)),
        jnp.asarray(folded[half:].reshape(-1, 128)),
    ]
    escapes = [count_all_escapes(p) for p in planes]
    exp = unfold_canonical(folded, k)
    path = str(tmp_path / "pieces.bin")
    fd = os.open(path, os.O_CREAT | os.O_RDWR, 0o644)
    try:
        os.ftruncate(fd, 4**k)
        res = stream_sparse_planes_pieces(
            planes, k, fd, path, escapes, hash_out=True
        )
    finally:
        os.close(fd)
    assert res is not None
    counts, hex_ = res
    assert np.array_equal(counts, np.bincount(folded, minlength=256))
    assert hex_ == hashlib.sha256(exp).hexdigest()
    on_disk = np.fromfile(path, dtype=np.uint8)
    assert np.array_equal(on_disk, exp)


def test_sparse_pieces_overflow_plane_fallback(rng, monkeypatch, tmp_path):
    """One plane's density blows the static caps: that plane materialises
    via the fixed-width fetch + unfold_piece; output still byte-exact."""
    from pykmer_tpu.ops.readback import stream_sparse_planes_pieces

    monkeypatch.setenv("PYKMER_TPU_SPARSE_SEG", str(1 << 14))
    monkeypatch.setenv("PYKMER_TPU_SPARSE_MIN", "1")
    k = 9
    fold = 4**k // 2
    half = fold // 2
    folded = _folded_plane(rng, fold, 0.04, long_zero_runs=False)
    # second plane: one segment far above the 20% cap, while the plane-level
    # escape counts still pass the size//8 gate
    hot = np.zeros(half, dtype=np.uint8)
    hot[: 1 << 13] = rng.choice([1, 2, 9], size=1 << 13).astype(np.uint8)
    folded[half:] = hot
    planes = [
        jnp.asarray(folded[:half].reshape(-1, 128)),
        jnp.asarray(folded[half:].reshape(-1, 128)),
    ]
    escapes = [count_all_escapes(p) for p in planes]
    exp = unfold_canonical(folded, k)
    path = str(tmp_path / "pieces_fb.bin")
    fd = os.open(path, os.O_CREAT | os.O_RDWR, 0o644)
    try:
        os.ftruncate(fd, 4**k)
        res = stream_sparse_planes_pieces(
            planes, k, fd, path, escapes, hash_out=True
        )
    finally:
        os.close(fd)
    assert res is not None
    counts, hex_ = res
    assert np.array_equal(counts, np.bincount(folded, minlength=256))
    on_disk = np.fromfile(path, dtype=np.uint8)
    assert np.array_equal(on_disk, exp)
    assert hex_ == hashlib.sha256(exp).hexdigest()


def test_sparse_pieces_declines_dense(rng, monkeypatch, tmp_path):
    """Globally dense planes return None (caller takes the arena path)."""
    from pykmer_tpu.ops.readback import stream_sparse_planes_pieces

    monkeypatch.setenv("PYKMER_TPU_SPARSE_MIN", "1")
    k = 9
    fold = 4**k // 2
    folded = _folded_plane(rng, fold, 0.7, long_zero_runs=False)
    planes = [jnp.asarray(folded.reshape(-1, 128))]
    escapes = [count_all_escapes(p) for p in planes]
    path = str(tmp_path / "na.bin")
    fd = os.open(path, os.O_CREAT | os.O_RDWR, 0o644)
    try:
        res = stream_sparse_planes_pieces(
            planes, k, fd, path, escapes, hash_out=True
        )
    finally:
        os.close(fd)
    assert res is None
