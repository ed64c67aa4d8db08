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
                          meta={"kmer_len": 5}, max_bucket=99)
    loaded = load_shard_checkpoint(tmp)
    assert loaded is not None
    got, state = loaded
    assert np.array_equal(got, dense)
    assert state["next_step"] == 7
    assert state["num_kmers"] == 12345
    assert state["kmer_len"] == 5
    assert state["max_bucket"] == 99  # overflow high-water mark persists
    clear_shard_checkpoint(tmp)
    assert load_shard_checkpoint(tmp) is None


def test_checkpoint_crash_window_is_atomic(tmp_path, rng):
    """A crash between the dense write and the state commit must leave the
    PREVIOUS (state, dense) pair intact: state.json names its dense file,
    so an orphaned newer plane is simply ignored (the old two-rename
    scheme could pair a new plane with an old cursor and double-count on
    resume)."""
    import os

    tmp = str(tmp_path / "y.fa.05.kin.tmp")
    dense3 = rng.integers(0, 256, size=(4, 64)).astype(np.uint8)
    save_shard_checkpoint(tmp, dense3, next_step=3, num_kmers=30,
                          meta={}, max_bucket=1)
    # simulate a crashed later save: the step-9 plane landed, the state
    # commit did not
    orphan = rng.integers(0, 256, size=(4, 64)).astype(np.uint8)
    d = tmp + ".ckpt"
    with open(os.path.join(d, "dense.9.npy"), "wb") as fh:
        np.save(fh, orphan, allow_pickle=False)
    got, state = load_shard_checkpoint(tmp)
    assert state["next_step"] == 3
    assert np.array_equal(got, dense3)
    # a SUCCESSFUL later save prunes superseded planes
    save_shard_checkpoint(tmp, orphan, next_step=9, num_kmers=90, meta={})
    names = sorted(n for n in os.listdir(d) if n.endswith(".npy"))
    assert names == ["dense.9.npy"]
    got, state = load_shard_checkpoint(tmp)
    assert state["next_step"] == 9
    assert np.array_equal(got, orphan)
    clear_shard_checkpoint(tmp)


# worker-subprocess launch recipe shared with scripts/certify_k17_multihost
from mh_launch import run_workers  # noqa: E402


def test_host_byte_slice_record_aligned(tmp_path, rng):
    """Byte ranges cover the file exactly, cut only at record starts, and
    adjacent hosts agree on every boundary."""
    from conftest import make_random_fasta
    from pykmer_tpu.parallel.multihost import host_byte_slice

    fa = make_random_fasta(str(tmp_path / "bs.fa"), rng, n_records=9,
                           lengths=(500, 120, 900, 77, 333, 640, 50, 211, 404))
    size = __import__("os").path.getsize(fa)
    with open(fa, "rb") as fh:
        data = fh.read()
    for nproc in (1, 2, 3, 5):
        spans = [host_byte_slice(fa, p, nproc) for p in range(nproc)]
        assert spans[0][0] == 0 and spans[-1][1] == size
        for (a0, a1), (b0, b1) in zip(spans, spans[1:]):
            assert a1 == b0  # no gap, no overlap
        for lo, hi in spans:
            if lo not in (0, size):
                assert data[lo:lo + 1] == b">" and data[lo - 1:lo] == b"\n"


def test_combine_partials_sharded_single_process(rng):
    """nproc==1 short-circuit returns the plane as one piece."""
    from pykmer_tpu.parallel.multihost import combine_partials_sharded

    plane = rng.integers(0, 256, size=4096).astype(np.uint8)
    pieces = combine_partials_sharded(plane)
    assert len(pieces) == 1
    off, got = pieces[0]
    assert off == 0 and np.array_equal(got, plane)


def test_unfold_piece_matches_unfold_canonical(rng):
    from pykmer_tpu.ops.readback import unfold_canonical, unfold_piece

    k = 5
    fold = 4**k // 2
    folded = rng.integers(0, 256, size=fold).astype(np.uint8)
    want = unfold_canonical(folded.copy(), k)
    got = np.zeros(4**k, dtype=np.uint8)
    # three uneven pieces
    for g0, g1 in ((0, 100), (100, 417), (417, fold)):
        primary, mirror, m_off = unfold_piece(folded[g0:g1], k, g0)
        got[g0:g1] = primary
        got[m_off : m_off + mirror.shape[0]] = mirror
    assert np.array_equal(got, want)


def test_two_process_distributed_index(tmp_path, rng):
    """The real thing: a subprocess-driven 2-process jax.distributed CPU job
    (4 virtual devices each) builds one .kin cooperatively — byte-identical
    to the single-process pipeline, stats fields equal too."""
    import json
    import os

    from conftest import make_random_fasta
    from pykmer_tpu.config import IndexConfig
    from pykmer_tpu.index import create_fasta_index

    k = 5

    # reference: the ordinary single-process build
    os.makedirs(str(tmp_path / "a"))
    fa1 = make_random_fasta(str(tmp_path / "a" / "mh.fa"), rng, n_records=3,
                            lengths=(700, 350, 90))
    create_fasta_index(fa1, "mh", fa1, k,
                       config=IndexConfig(kmer_len=k, chunk_windows=1 << 10),
                       verbose=False)
    with open(f"{fa1}.{k:02d}.kin", "rb") as fh:
        want = fh.read()
    want_meta = json.load(open(f"{fa1}.{k:02d}.kin.json"))

    # same input content in a second directory for the distributed build
    fa2 = str(tmp_path / "b" / "mh.fa")
    os.makedirs(os.path.dirname(fa2))
    with open(fa1, "rb") as src, open(fa2, "wb") as dst:
        dst.write(src.read())

    results = run_workers(2, [fa2, k])
    for rc, out in results:
        assert rc == 0, out
    assert "worker 0: ok header=yes" in results[0][1], results[0][1]
    assert "worker 1: ok header=no" in results[1][1], results[1][1]

    with open(f"{fa2}.{k:02d}.kin", "rb") as fh:
        got = fh.read()
    assert got == want
    got_meta = json.load(open(f"{fa2}.{k:02d}.kin.json"))
    for key in ("hist", "hist_sum", "vals_sum", "vals_count", "vals_min",
                "vals_max", "num_kmers", "chromosomes", "kmer_len",
                "input_file_cheksum", "output_file_cheksum"):
        assert got_meta[key] == want_meta[key], key


def test_host_byte_slice_bgzf_matches_plain(tmp_path, rng):
    """BGZF uncompressed-space slicing must agree exactly with plain-file
    slicing of the same content (same deterministic boundary scan)."""
    from conftest import make_random_fasta
    from pykmer_tpu.io.bgzf import BgzfRangeReader, compress_file
    from pykmer_tpu.parallel.multihost import (
        host_byte_slice,
        host_byte_slice_bgzf,
    )

    fa = make_random_fasta(str(tmp_path / "bz.fa"), rng, n_records=6,
                           lengths=(800, 150, 600, 90, 400, 220))
    bgz, _ = compress_file(fa)
    r = BgzfRangeReader(bgz)
    for nproc in (2, 3, 4):
        for pid in range(nproc):
            assert host_byte_slice_bgzf(r, pid, nproc) == \
                host_byte_slice(fa, pid, nproc), (nproc, pid)
    r.close()


def test_two_process_bgz_input_byte_split(tmp_path, rng):
    """A `.fa.bgz` input splits by UNCOMPRESSED byte range via the GZI
    block index (each host inflates only its slice) — byte-identical to
    the single-process build."""
    import os

    from conftest import make_random_fasta
    from pykmer_tpu.config import IndexConfig
    from pykmer_tpu.index import create_fasta_index
    from pykmer_tpu.io.bgzf import compress_file

    k = 5
    os.makedirs(str(tmp_path / "a"))
    fa1 = make_random_fasta(str(tmp_path / "a" / "bz.fa"), rng, n_records=3,
                            lengths=(900, 400, 150))
    bgz1, _ = compress_file(fa1, fa1 + ".bgz")
    create_fasta_index(bgz1, "mh", bgz1, k,
                       config=IndexConfig(kmer_len=k, chunk_windows=1 << 10),
                       verbose=False)
    with open(f"{bgz1}.{k:02d}.kin", "rb") as fh:
        want = fh.read()

    bgz2 = str(tmp_path / "b" / "bz.fa.bgz")
    os.makedirs(os.path.dirname(bgz2))
    with open(bgz1, "rb") as src, open(bgz2, "wb") as dst:
        dst.write(src.read())

    for rc, out in run_workers(2, [bgz2, k, 1 << 10]):
        assert rc == 0, out
    with open(f"{bgz2}.{k:02d}.kin", "rb") as fh:
        assert fh.read() == want


import pytest


@pytest.mark.parametrize("stage", ["1", "0"])
def test_two_process_gz_input_window_slice(tmp_path, rng, stage):
    """Plain-gzip inputs: by default host 0 inflates ONCE to a staged
    sibling that all hosts byte-range-read (shared-FS assumption, same as
    the sharded writer); with staging disabled the job falls back to
    full-decode + window slicing. Both must be byte-identical to the
    single-process build, and the staged file must be cleaned up."""
    import gzip
    import os

    from conftest import make_random_fasta
    from pykmer_tpu.config import IndexConfig
    from pykmer_tpu.index import create_fasta_index

    k = 5
    os.makedirs(str(tmp_path / "a"))
    fa1 = make_random_fasta(str(tmp_path / "a" / "gz.fa"), rng, n_records=3,
                            lengths=(900, 400, 150))
    gz1 = fa1 + ".gz"
    with open(fa1, "rb") as src, gzip.open(gz1, "wb") as dst:
        dst.write(src.read())
    create_fasta_index(gz1, "mh", gz1, k,
                       config=IndexConfig(kmer_len=k, chunk_windows=1 << 10),
                       verbose=False)
    with open(f"{gz1}.{k:02d}.kin", "rb") as fh:
        want = fh.read()

    gz2 = str(tmp_path / "b" / "gz.fa.gz")
    os.makedirs(os.path.dirname(gz2))
    with open(gz1, "rb") as src, open(gz2, "wb") as dst:
        dst.write(src.read())

    results = run_workers(
        2, [gz2, k, 1 << 10],
        env_extra={"PYKMER_TPU_MULTIHOST_GZ_STAGE": stage})
    for rc, out in results:
        assert rc == 0, out
    with open(f"{gz2}.{k:02d}.kin", "rb") as fh:
        assert fh.read() == want
    # staged names carry a job tag: {gz}.{K:02d}.{tag}.inflated.tmp(.part)
    import glob

    assert glob.glob(gz2 + ".*.inflated.tmp*") == []


def test_two_process_decode_failure_uniform_error(tmp_path, rng):
    """A decode failure on ONE host's byte slice must surface the same
    error on EVERY host — not strand the healthy hosts at the post-read
    barrier — and must not leak the staged .inflated.tmp (the non-main
    failure path of the ADVICE-r4 leak class: the per-host failure rides
    the allgather as a flag, main unlinks after the barrier, then all
    hosts raise uniformly)."""
    import glob
    import gzip
    import os

    from conftest import make_random_fasta

    k = 5
    fa = make_random_fasta(str(tmp_path / "gz.fa"), rng, n_records=3,
                           lengths=(900, 400, 150))
    gz = fa + ".gz"
    with open(fa, "rb") as src, gzip.open(gz, "wb") as dst:
        dst.write(src.read())

    # inject the failure on the NON-main host (trailing worker arg)
    for rc, out in run_workers(2, [gz, k, 1 << 10, 0, 0, 1]):
        assert rc == 7, (rc, out)
        assert "byte-range decode failed on 1/2 host" in out, out
        assert "injected decode failure" in out, out
    # staged inflated sibling cleaned up despite the failure
    assert glob.glob(gz + ".*.inflated.tmp*") == []
    # and no output was produced
    assert not os.path.exists(f"{gz}.{k:02d}.kin")


def test_three_process_uneven_records(tmp_path, rng):
    """3 processes over 2 records: at least one host's byte range holds no
    record at all — its empty partial must still combine and the output
    stay byte-identical."""
    import json
    import os

    from conftest import make_random_fasta
    from pykmer_tpu.config import IndexConfig
    from pykmer_tpu.index import create_fasta_index

    k = 5
    os.makedirs(str(tmp_path / "a"))
    fa1 = make_random_fasta(str(tmp_path / "a" / "u3.fa"), rng, n_records=2,
                            lengths=(1200, 90))
    create_fasta_index(fa1, "mh", fa1, k,
                       config=IndexConfig(kmer_len=k, chunk_windows=1 << 10),
                       verbose=False)
    with open(f"{fa1}.{k:02d}.kin", "rb") as fh:
        want = fh.read()
    fa2 = str(tmp_path / "b" / "u3.fa")
    os.makedirs(os.path.dirname(fa2))
    with open(fa1, "rb") as src, open(fa2, "wb") as dst:
        dst.write(src.read())

    for rc, out in run_workers(3, [fa2, k, 1 << 10]):
        assert rc == 0, out
    with open(f"{fa2}.{k:02d}.kin", "rb") as fh:
        assert fh.read() == want
    meta1 = json.load(open(f"{fa1}.{k:02d}.kin.json"))
    meta2 = json.load(open(f"{fa2}.{k:02d}.kin.json"))
    for key in ("hist", "num_kmers", "chromosomes", "output_file_cheksum"):
        assert meta1[key] == meta2[key], key


def test_two_process_crash_resume(tmp_path, rng):
    """Kill both workers right after their first per-host checkpoint, then
    re-launch: the job must resume from the checkpoints and produce the
    byte-identical `.kin` (VERDICT r2 #3a: multi-host resumability)."""
    import json
    import os

    from conftest import make_random_fasta
    from pykmer_tpu.config import IndexConfig
    from pykmer_tpu.index import create_fasta_index

    k = 5
    cw = 1 << 9  # small chunks => several steps per host

    os.makedirs(str(tmp_path / "a"))
    fa1 = make_random_fasta(str(tmp_path / "a" / "cr.fa"), rng, n_records=4,
                            lengths=(4000, 2500, 1500, 800))
    create_fasta_index(fa1, "mh", fa1, k,
                       config=IndexConfig(kmer_len=k, chunk_windows=cw),
                       verbose=False)
    with open(f"{fa1}.{k:02d}.kin", "rb") as fh:
        want = fh.read()

    fa2 = str(tmp_path / "b" / "cr.fa")
    os.makedirs(os.path.dirname(fa2))
    with open(fa1, "rb") as src, open(fa2, "wb") as dst:
        dst.write(src.read())

    def launch(abort_after):
        # checkpoint every step
        return run_workers(2, [fa2, k, cw, 1, abort_after])

    # run 1: both processes die after their first checkpoint. The first
    # crash tears down the jax.distributed coordinator, so the OTHER
    # process may die from the coordination error before reaching its own
    # checkpoint — any nonzero exit is a valid simulated crash, and resume
    # must cope with a mixed checkpointed/unckeckpointed host set.
    results = launch(abort_after=1)
    for rc, out in results:
        assert rc != 0, out
    assert any("simulated crash after checkpoint" in out
               for _, out in results)
    tmp = f"{fa2}.{k:02d}.kin.tmp"
    assert os.path.isdir(f"{tmp}.proc000.ckpt") \
        or os.path.isdir(f"{tmp}.proc001.ckpt"), "no checkpoint written"

    # run 2: clean relaunch resumes and completes
    for rc, out in launch(abort_after=0):
        assert rc == 0, out
    with open(f"{fa2}.{k:02d}.kin", "rb") as fh:
        got = fh.read()
    assert got == want
    # checkpoints cleaned up after success
    assert not os.path.isdir(f"{tmp}.proc000.ckpt")
    assert not os.path.isdir(f"{tmp}.proc001.ckpt")
