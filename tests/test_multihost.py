"""Multi-host glue: exact partial-merge semantics + checkpoint/resume."""

import numpy as np

from pykmer_tpu.oracle import oracle_count_stream
from pykmer_tpu.parallel.multihost import (
    clear_shard_checkpoint,
    combine_partial_dense,
    host_slice,
    load_shard_checkpoint,
    save_shard_checkpoint,
)


def test_host_slice_covers_everything():
    for total in (0, 1, 7, 100):
        for n in (1, 2, 3, 8):
            spans = [host_slice(total, p, n) for p in range(n)]
            covered = []
            for a, b in spans:
                covered.extend(range(a, b))
            assert covered == list(range(total))


def test_combine_partial_dense_exact(rng):
    """Per-host clipped partials merge to min(total, 255) — bit-exact."""
    kmer_len = 3
    codes = rng.integers(0, 64, size=3000).astype(np.int64)
    # heavy repeats to cross saturation
    codes = np.concatenate([codes, np.zeros(400, np.int64), np.full(300, 7, np.int64)])
    want = oracle_count_stream([codes], kmer_len)
    # split across 3 "hosts" arbitrarily
    parts = []
    for lo, hi in ((0, 1000), (1000, 2500), (2500, codes.shape[0])):
        parts.append(oracle_count_stream([codes[lo:hi]], kmer_len))
    got = combine_partial_dense(parts)
    assert np.array_equal(got, want)


def test_checkpoint_roundtrip(tmp_path, rng):
    tmp = str(tmp_path / "x.fa.05.kin.tmp")
    dense = rng.integers(0, 256, size=(4, 256)).astype(np.uint8)
    save_shard_checkpoint(tmp, dense, next_step=7, num_kmers=12345,
                          meta={"kmer_len": 5})
    loaded = load_shard_checkpoint(tmp)
    assert loaded is not None
    got, state = loaded
    assert np.array_equal(got, dense)
    assert state["next_step"] == 7
    assert state["num_kmers"] == 12345
    assert state["kmer_len"] == 5
    clear_shard_checkpoint(tmp)
    assert load_shard_checkpoint(tmp) is None
