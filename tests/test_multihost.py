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


def _free_port():
    import socket

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_index(tmp_path, rng):
    """The real thing: a subprocess-driven 2-process jax.distributed CPU job
    (4 virtual devices each) builds one .kin cooperatively — byte-identical
    to the single-process pipeline, stats fields equal too."""
    import json
    import os
    import subprocess
    import sys

    from conftest import make_random_fasta
    from pykmer_tpu.config import IndexConfig
    from pykmer_tpu.index import create_fasta_index

    here = os.path.dirname(os.path.abspath(__file__))
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

    port = _free_port()
    env = {**os.environ, "JAX_PLATFORMS": "", "PYTHONPATH": os.pathsep.join(
        [os.path.dirname(here), here, os.environ.get("PYTHONPATH", "")])}
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(here, "multihost_worker.py"),
             str(pid), "2", str(port), fa2, str(k)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=300)[0].decode() for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out
    assert "worker 0: ok header=yes" in outs[0], outs[0]
    assert "worker 1: ok header=no" in outs[1], outs[1]

    with open(f"{fa2}.{k:02d}.kin", "rb") as fh:
        got = fh.read()
    assert got == want
    got_meta = json.load(open(f"{fa2}.{k:02d}.kin.json"))
    for key in ("hist", "hist_sum", "vals_sum", "vals_count", "vals_min",
                "vals_max", "num_kmers", "chromosomes", "kmer_len",
                "input_file_cheksum", "output_file_cheksum"):
        assert got_meta[key] == want_meta[key], key
