"""CLI surface: end-to-end subcommand flows."""

import json
import os

import numpy as np

from pykmer_tpu.cli import main
from conftest import make_random_fasta


def test_cli_full_flow(tmp_path, rng, monkeypatch, capsys):
    monkeypatch.chdir(tmp_path)
    fastas = []
    for i in range(2):
        fasta = make_random_fasta(str(tmp_path / f"c{i}.fa"), rng,
                                  n_records=2, lengths=(300, 150))
        fastas.append(fasta)

    kins = []
    for fasta in fastas:
        rc = main(["index", fasta, "sample", "5", "--quiet", "--bgzip"])
        assert rc == 0
        kins.append(f"{fasta}.05.kin")
        assert os.path.exists(f"{fasta}.05.kin")
        assert os.path.exists(f"{fasta}.05.kin.json")
        assert os.path.exists(f"{fasta}.05.kin.bgz")
        assert os.path.exists(f"{fasta}.05.kin.bgz.gzi")

    rc = main(["read", fastas[0], "5"])
    assert rc == 0

    rc = main(["gzi", f"{fastas[0]}.05.kin.bgz.gzi"])
    assert rc == 0
    assert "number_entries" in capsys.readouterr().out

    rc = main(["merge", "proj", *kins, "--quiet"])
    assert rc == 0
    assert os.path.exists("proj.001-255.kma")

    rc = main(["distance", "proj.001-255.kma"])
    assert rc == 0
    assert os.path.exists("proj.001-255.kma.dist.jaccard.newick")

    rc = main(["testgen", str(tmp_path / "fix" / "ex-"), "3"])
    assert rc == 0
    assert os.path.exists(str(tmp_path / "fix" / "ex--03.fasta.gz"))


def test_cli_merge_needs_two(tmp_path, rng, monkeypatch):
    monkeypatch.chdir(tmp_path)
    fasta = make_random_fasta(str(tmp_path / "x.fa"), rng)
    main(["index", fasta, "s", "3", "--quiet"])
    rc = main(["merge", "p", f"{fasta}.03.kin"])
    assert rc == 1


def test_cli_merge_reads_bgz_inputs(tmp_path, rng, monkeypatch):
    """Merging compressed .kin.bgz inputs gives identical matrices."""
    monkeypatch.chdir(tmp_path)
    kins, bgzs = [], []
    for i in range(2):
        fasta = make_random_fasta(str(tmp_path / f"b{i}.fa"), rng,
                                  n_records=2, lengths=(220, 90))
        main(["index", fasta, "s", "5", "--quiet", "--bgzip"])
        kins.append(f"{fasta}.05.kin")
        bgzs.append(f"{fasta}.05.kin.bgz")
        os.rename(kins[-1], kins[-1] + ".hide")  # force the .bgz path
    assert main(["merge", "pbgz", *bgzs, "--quiet"]) == 0
    for kin in kins:
        os.rename(kin + ".hide", kin)
    assert main(["merge", "praw", *kins, "--quiet"]) == 0
    a = np.load("pbgz.001-255.kma")["matrix"]
    b = np.load("praw.001-255.kma")["matrix"]
    assert np.array_equal(a, b)


def test_cli_sharded_index(tmp_path, rng, monkeypatch):
    monkeypatch.chdir(tmp_path)
    fasta = make_random_fasta(str(tmp_path / "sh.fa"), rng, n_records=2,
                              lengths=(400, 200))
    rc = main(["index", fasta, "s", "5", "--quiet", "--shards", "4",
               "--checkpoint-every", "2"])
    assert rc == 0
    assert os.path.exists(f"{fasta}.05.kin")
    # matches the single-chip result byte for byte
    with open(f"{fasta}.05.kin", "rb") as fh:
        sharded = fh.read()
    os.remove(f"{fasta}.05.kin")
    os.remove(f"{fasta}.05.kin.json")
    rc = main(["index", fasta, "s", "5", "--quiet"])
    assert rc == 0
    with open(f"{fasta}.05.kin", "rb") as fh:
        single = fh.read()
    assert sharded == single


def test_cli_index_batch(tmp_path, rng, monkeypatch, capsys):
    """index-batch: indexes all inputs, skips existing, continues past
    failures, and the outputs match single-file `index` runs exactly."""
    monkeypatch.chdir(tmp_path)
    fastas = [
        make_random_fasta(str(tmp_path / f"g{i}.fa"), rng, n_records=2,
                          lengths=(260, 140))
        for i in range(3)
    ]

    rc = main(["index-batch", "5", *fastas, "--quiet"])
    assert rc == 0
    batch_bytes = {}
    for fasta in fastas:
        assert os.path.exists(f"{fasta}.05.kin")
        assert os.path.exists(f"{fasta}.05.kin.json")
        with open(f"{fasta}.05.kin", "rb") as fh:
            batch_bytes[fasta] = fh.read()
        # default sample name = basename up to the first dot
        meta = json.load(open(f"{fasta}.05.kin.json"))
        assert meta["input_file_name"] == os.path.basename(fasta)

    # byte-identical to the single-file subcommand
    for fasta in fastas[:1]:
        os.remove(f"{fasta}.05.kin")
        os.remove(f"{fasta}.05.kin.json")
        assert main(["index", fasta, "g0", "5", "--quiet"]) == 0
        with open(f"{fasta}.05.kin", "rb") as fh:
            assert fh.read() == batch_bytes[fasta]

    # skip-existing: a second batch run indexes nothing (mtimes unchanged)
    mtimes = {f: os.path.getmtime(f"{f}.05.kin") for f in fastas}
    rc = main(["index-batch", "5", *fastas])
    assert rc == 0
    out = capsys.readouterr().out
    assert out.count("skip ") == 3 and "0 indexed" in out.splitlines()[-1]
    assert mtimes == {f: os.path.getmtime(f"{f}.05.kin") for f in fastas}

    # a failing input (no valid k-mers) is reported; the rest still index
    bad = str(tmp_path / "bad.fa")
    with open(bad, "w") as fh:
        fh.write(">only-ns\nNNNNNNNN\n")
    extra = make_random_fasta(str(tmp_path / "g3.fa"), rng, n_records=1,
                              lengths=(200,))
    rc = main(["index-batch", "5", bad, extra, "--quiet"])
    assert rc == 1
    assert os.path.exists(f"{extra}.05.kin")
    assert not os.path.exists(f"{bad}.05.kin")
    assert not os.path.exists(f"{bad}.05.kin.tmp")


def test_cli_index_stdin(tmp_path, rng, monkeypatch):
    """`index -` reads the FASTA from stdin (reference indexer.py:104-110);
    outputs are named after the sample and match the by-path run exactly."""
    import io
    import sys

    monkeypatch.chdir(tmp_path)
    fasta = make_random_fasta(str(tmp_path / "sin.fa"), rng, n_records=2,
                              lengths=(240, 130))
    assert main(["index", fasta, "s", "5", "--quiet"]) == 0
    with open(f"{fasta}.05.kin", "rb") as fh:
        want = fh.read()
    want_meta = json.load(open(f"{fasta}.05.kin.json"))

    with open(fasta, "rb") as fh:
        data = fh.read()
    monkeypatch.setattr(sys, "stdin",
                        type("S", (), {"buffer": io.BytesIO(data)})())
    assert main(["index", "-", "mysample", "5", "--quiet"]) == 0
    assert os.path.exists("mysample.05.kin")
    with open("mysample.05.kin", "rb") as fh:
        assert fh.read() == want
    meta = json.load(open("mysample.05.kin.json"))
    # same content stats + same stream checksum; no input file to stat
    for key in ("hist", "vals_sum", "vals_count", "num_kmers",
                "input_file_cheksum"):
        assert meta[key] == want_meta[key], key
    assert meta["input_file_size"] is None
    assert meta["input_file_name"] == "mysample"

    # sharded runs reject stdin explicitly
    monkeypatch.setattr(sys, "stdin",
                        type("S", (), {"buffer": io.BytesIO(data)})())
    assert main(["index", "-", "m2", "5", "--quiet", "--shards", "2"]) == 2


def test_cli_merge_buffer_size(tmp_path, rng, monkeypatch):
    """--buffer-size is applied to .bgz stream buffering and does not change
    results (reference merger.py:67 role)."""
    monkeypatch.chdir(tmp_path)
    bgzs = []
    for i in range(2):
        fasta = make_random_fasta(str(tmp_path / f"v{i}.fa"), rng,
                                  n_records=1, lengths=(260,))
        main(["index", fasta, "s", "5", "--quiet", "--bgzip"])
        bgzs.append(f"{fasta}.05.kin.bgz")
        os.remove(f"{fasta}.05.kin")
    assert main(["merge", "pa", *bgzs, "--quiet"]) == 0
    assert main(["merge", "pb", *bgzs, "--quiet",
                 "--buffer-size", "4096"]) == 0
    a = np.load("pa.001-255.kma")["matrix"]
    b = np.load("pb.001-255.kma")["matrix"]
    assert np.array_equal(a, b)
