"""Sharded paths on the 8-device virtual CPU mesh: bit-identical to
single-chip results."""

import numpy as np
import pytest

from pykmer_tpu.oracle import oracle_canonical_codes, oracle_count_stream
from pykmer_tpu.ops.encode import chunk_stream
from pykmer_tpu.ops.readback import unfold_canonical
from pykmer_tpu.parallel import (
    flat_to_interleaved,
    interleaved_to_flat,
    make_halo_encode,
    make_mesh,
    make_sharded_accumulate,
    make_sharded_pair_matrix,
    shard_batch_chunks_packed,
)


def test_interleave_roundtrip(rng):
    flat = rng.integers(0, 256, size=1024).astype(np.uint8)
    shards = flat_to_interleaved(flat, 8)
    assert shards.shape == (8, 128)
    # code c lives at [c % 8, c // 8]
    assert shards[3, 5] == flat[5 * 8 + 3]
    assert np.array_equal(interleaved_to_flat(shards), flat)


@pytest.mark.parametrize("n_data,n_shards", [(1, 8), (2, 4), (1, 2)])
def test_sharded_accumulate_matches_oracle(rng, n_data, n_shards):
    kmer_len = 5
    data_size = 4**kmer_len
    seq = rng.integers(0, 5, size=6000).astype(np.uint8)
    want_codes = oracle_canonical_codes(seq, kmer_len)
    want = oracle_count_stream([want_codes], kmer_len, flush_every=10**9)

    mesh = make_mesh(n_shards=n_shards, n_data=n_data)
    chunk_windows = 256
    init_fn, step_fn = make_sharded_accumulate(mesh, kmer_len, chunk_windows)
    padded, n_chunks = chunk_stream(seq, kmer_len, chunk_windows)
    rows = step_fn.rows
    n_steps = (n_chunks + rows - 1) // rows

    state = init_fn()
    for s in range(n_steps):
        chunks = shard_batch_chunks_packed(padded, kmer_len, chunk_windows, rows, s)
        state = step_fn(state, chunks)
    dense, nk, maxb = state
    assert int(maxb) <= step_fn.capacity, "bucket overflow"
    num = int(nk)
    got = unfold_canonical(interleaved_to_flat(np.asarray(dense)), kmer_len)
    assert num == want_codes.shape[0]
    assert np.array_equal(got, want)


def test_sharded_accumulate_saturation(rng):
    kmer_len = 3
    mesh = make_mesh(n_shards=2, n_data=1)
    # one code repeated 600x: saturates at 255; also tests skewed buckets
    seq = np.zeros(600 + 2, dtype=np.uint8)  # AAAA... -> code 0 x600
    init_fn, step_fn = make_sharded_accumulate(
        mesh, kmer_len, chunk_windows=600, capacity_factor=2.0
    )
    padded, n_chunks = chunk_stream(seq, kmer_len, 600)
    state = init_fn()
    chunks = shard_batch_chunks_packed(padded, kmer_len, 600, step_fn.rows, 0)
    dense, nk, maxb = step_fn(state, chunks)
    assert int(maxb) <= step_fn.capacity
    flat = unfold_canonical(interleaved_to_flat(np.asarray(dense)), kmer_len)
    assert flat[0] == 255
    assert int(nk) == 600


def test_sharded_overflow_detected(rng):
    kmer_len = 5
    mesh = make_mesh(n_shards=8, n_data=1)
    # all codes identical -> one bucket gets everything; tiny capacity factor
    seq = np.zeros(4096 + 4, dtype=np.uint8)
    init_fn, step_fn = make_sharded_accumulate(
        mesh, kmer_len, chunk_windows=4096, capacity_factor=0.5
    )
    padded, _ = chunk_stream(seq, kmer_len, 4096)
    state = init_fn()
    chunks = shard_batch_chunks_packed(padded, kmer_len, 4096, step_fn.rows, 0)
    _, _, maxb = step_fn(state, chunks)
    assert int(maxb) > step_fn.capacity  # surfaced, caller must abort


def test_halo_encode_matches_oracle(rng):
    kmer_len = 7
    n_shards = 8
    shard_len = 64
    seq = rng.integers(0, 5, size=n_shards * shard_len).astype(np.uint8)
    mesh = make_mesh(n_shards=n_shards, n_data=1)
    encode = make_halo_encode(mesh, kmer_len, shard_len)
    got = np.asarray(encode(seq))
    sentinel = 4**kmer_len
    want = oracle_canonical_codes(seq, kmer_len)
    got_valid = got[got < sentinel]
    assert np.array_equal(got_valid, want)
    # windows past the end are sentinels
    assert (got[-(kmer_len - 1):] == sentinel).all()


def test_sharded_pair_matrix(rng):
    mesh = make_mesh(n_shards=8, n_data=1)
    n, cells = 5, 8 * 97
    blocks = rng.integers(0, 8, size=(n, cells)).astype(np.uint8)
    fn = make_sharded_pair_matrix(mesh, n, 97, min_count=1, max_count=5)
    got = np.asarray(fn(blocks))
    v = ((blocks >= 1) & (blocks <= 5)).astype(np.int64)
    want = v @ v.T
    assert np.array_equal(got, want)
