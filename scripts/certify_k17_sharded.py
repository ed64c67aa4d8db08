"""Certify the K=17 SHARDED accumulate on a virtual 8-device mesh.

K=17 is the regime VERDICT r1 flagged as untested at realistic shapes:
int64 canonical codes (34 bits), an 8.6-billion-cell folded count space
(uint8 ~8.6 GB across shards), int32 local indices after the owner split.
This script runs the real `make_sharded_accumulate` machinery at full K=17
plane size on 8 virtual CPU devices (~26 GB host RAM) and verifies every
touched cell against the NumPy oracle without materialising the 17 GB
unfolded plane.

Run: python scripts/certify_k17_sharded.py  (takes a few minutes)
"""

import os
import sys
import time

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    from pykmer_tpu.oracle import oracle_canonical_codes
    from pykmer_tpu.ops.encode import chunk_stream
    from pykmer_tpu.parallel import (
        make_mesh,
        make_sharded_accumulate,
        shard_batch_chunks_packed,
    )

    kmer_len = 17
    chunk_windows = 1 << 20
    fold_size = 4**kmer_len // 2
    mesh = make_mesh(n_shards=8, n_data=1)
    n_shards = 8
    shard_bits = 3

    rng = np.random.default_rng(17)
    # ~1 Mbp with a repeated motif (saturation + bucket pressure) and Ns;
    # sized so the pure-Python gold oracle stays in tens of seconds
    pieces = []
    motif = np.tile(rng.integers(0, 4, size=kmer_len).astype(np.uint8), 40)
    for _ in range(8):
        pieces.append(rng.integers(0, 5, size=125_000).astype(np.uint8))
        pieces.append(motif)
    seq = np.concatenate(pieces)

    t0 = time.monotonic()
    init_fn, step_fn = make_sharded_accumulate(mesh, kmer_len, chunk_windows)
    state = init_fn()
    padded, n_chunks = chunk_stream(seq, kmer_len, chunk_windows)
    rows = step_fn.rows
    n_steps = (n_chunks + rows - 1) // rows
    for s in range(n_steps):
        chunks = shard_batch_chunks_packed(
            padded, kmer_len, chunk_windows, rows, s
        )
        state = step_fn(state, chunks)
        print(f"step {s + 1}/{n_steps}", flush=True)
    dense, nk_dev, maxb_dev = state
    num_kmers = int(nk_dev)
    assert int(maxb_dev) <= step_fn.capacity, "bucket overflow"
    shards_np = np.asarray(dense)  # [8, fold/8] uint8
    t_accum = time.monotonic() - t0
    print(f"accumulate: {t_accum:.1f}s  num_kmers={num_kmers:,}", flush=True)

    # oracle: int64 canonical codes -> folded -> expected per-cell counts
    t0 = time.monotonic()
    want_codes = oracle_canonical_codes(seq, kmer_len)
    assert want_codes.dtype == np.int64 and int(want_codes.max()) >= 2**31, \
        "fixture must exercise >int32 codes"
    m = np.int64(4**kmer_len - 1)
    folded = np.minimum(want_codes, m - want_codes)  # lossless for odd K
    uniq, counts = np.unique(folded, return_counts=True)
    want_vals = np.minimum(counts, 255).astype(np.uint8)
    assert num_kmers == want_codes.shape[0], (num_kmers, want_codes.shape[0])

    # check the touched cells in the interleaved layout
    got_vals = shards_np[uniq & (n_shards - 1), uniq >> shard_bits]
    assert np.array_equal(got_vals, want_vals), "per-cell count mismatch"
    assert int(want_vals.max()) == 255, "fixture must exercise saturation"
    # everything else must be zero: total sum equals the touched cells' sum
    total = sum(int(row.astype(np.int64).sum()) for row in shards_np)
    assert total == int(want_vals.astype(np.int64).sum()), "stray nonzeros"
    print(
        f"oracle check: {time.monotonic() - t0:.1f}s — "
        f"{uniq.shape[0]:,} distinct cells, max count 255 hit, "
        f"codes up to {int(want_codes.max()):,} (int64) OK",
        flush=True,
    )
    print("K=17 sharded certification PASSED")


if __name__ == "__main__":
    main()
