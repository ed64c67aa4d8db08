"""Sharded end-to-end indexer: byte parity with single-chip + resume."""

import json
import os

import numpy as np
import pytest

from pykmer_tpu.config import IndexConfig
from pykmer_tpu.index import create_fasta_index, create_fasta_index_sharded
from pykmer_tpu.parallel import make_mesh
from pykmer_tpu.parallel.multihost import load_shard_checkpoint
from conftest import make_random_fasta


def _file_bytes(path):
    with open(path, "rb") as fh:
        return fh.read()


@pytest.mark.parametrize("n_data,n_shards", [(1, 8), (2, 4)])
def test_sharded_indexer_matches_single_chip(tmp_path, rng, n_data, n_shards):
    fasta = make_random_fasta(str(tmp_path / "s.fa"), rng, n_records=4,
                              lengths=(700, 300, 90, 500))
    kmer_len = 5
    cfg = IndexConfig(kmer_len=kmer_len, chunk_windows=128)

    header = create_fasta_index(fasta, "x", fasta, kmer_len, config=cfg,
                                verbose=False)
    single_kin = _file_bytes(header.index_file_root)
    single_meta = json.load(open(header.metadata_file))
    os.remove(header.index_file_root)
    os.remove(header.metadata_file)

    mesh = make_mesh(n_shards=n_shards, n_data=n_data)
    header = create_fasta_index_sharded(
        fasta, "x", fasta, kmer_len, config=cfg, mesh=mesh, verbose=False)
    assert _file_bytes(header.index_file_root) == single_kin
    sharded_meta = json.load(open(header.metadata_file))
    for key in ("num_kmers", "chromosomes", "hist", "vals_sum", "vals_count"):
        assert sharded_meta[key] == single_meta[key]


def test_sharded_indexer_checkpoint_resume(tmp_path, rng):
    fasta = make_random_fasta(str(tmp_path / "r.fa"), rng, n_records=3,
                              lengths=(900, 600, 400))
    kmer_len = 5
    cfg = IndexConfig(kmer_len=kmer_len, chunk_windows=64)
    mesh = make_mesh(n_shards=4, n_data=1)

    # full run for the expected bytes
    header = create_fasta_index_sharded(
        fasta, "x", fasta, kmer_len, config=cfg, mesh=mesh, verbose=False)
    want = _file_bytes(header.index_file_root)
    os.remove(header.index_file_root)
    os.remove(header.metadata_file)

    # interrupted run: checkpoint every step, abort partway via monkey trick
    class Abort(Exception):
        pass

    from pykmer_tpu.index import sharded as mod

    real_save = mod.multihost.save_shard_checkpoint
    calls = {"n": 0}

    def save_and_abort(*args, **kwargs):
        real_save(*args, **kwargs)
        calls["n"] += 1
        if calls["n"] == 2:
            raise Abort()

    mod.multihost.save_shard_checkpoint = save_and_abort
    try:
        with pytest.raises(Abort):
            create_fasta_index_sharded(
                fasta, "x", fasta, kmer_len, config=cfg, mesh=mesh,
                checkpoint_every=1, verbose=False)
    finally:
        mod.multihost.save_shard_checkpoint = real_save

    assert load_shard_checkpoint(header.index_tmp_file) is not None

    # resume completes and produces identical bytes
    header = create_fasta_index_sharded(
        fasta, "x", fasta, kmer_len, config=cfg, mesh=mesh,
        resume=True, verbose=False)
    assert _file_bytes(header.index_file_root) == want
    assert load_shard_checkpoint(header.index_tmp_file) is None


def test_sharded_overflow_raises(tmp_path):
    # adversarial input: one kmer repeated -> single bucket overflow detected
    fasta = str(tmp_path / "aaa.fa")
    with open(fasta, "w") as fh:
        fh.write(">r\n" + "A" * 5000 + "\n")
    mesh = make_mesh(n_shards=8, n_data=1)
    cfg = IndexConfig(kmer_len=5, chunk_windows=4096)
    with pytest.raises(RuntimeError, match="bucket overflow"):
        create_fasta_index_sharded(
            fasta, "x", fasta, 5, config=cfg, mesh=mesh,
            capacity_factor=0.1, verbose=False)
