"""FASTA decoder vs a line-by-line parser that mirrors reference semantics."""

import gzip

import numpy as np
import pytest

from pykmer_tpu.io.fasta import decode_fasta_bytes, read_fasta_codes

CONV = {c: i % 4 for i, c in enumerate("ACGTacgt")}


def naive_parse(text):
    """Reference-faithful record parser (indexer.py:45-99 semantics)."""
    records = []
    name, seq = None, []
    for line in text.split("\n"):
        line = line.strip()
        if not line:
            continue
        if line[0] == ">":
            if name is not None:
                codes = [CONV.get(c, 4) for c in "".join(seq)]
                records.append((name, codes))
            name = line[1:]
            seq = []
        else:
            seq.append(line)
    if name is not None:
        codes = [CONV.get(c, 4) for c in "".join(seq)]
        records.append((name, codes))
    return records


CASES = [
    ">a\nACGT\n",
    ">a\nACGT",  # no trailing newline
    ">a desc with > inside\nAC\nGT\n\n>b\n\nNNacgt\n",
    "junk before header\nACGT\n>real\nTTTT\n",
    ">empty-seq\n>next\nGGGG\n",
    "  >lead-ws header  \n  ACG T  \nacgt\n",  # stripped ends, interior space kept
    ">x\r\nAC\r\nGT\r\n",  # CRLF
    ">tabs\n\tACGT\t\n",
    ">only-n\nNNNN\n",
    "",
    ">noseq",
]


@pytest.mark.parametrize("text", CASES)
def test_decode_matches_naive(text):
    expected = naive_parse(text)
    got = decode_fasta_bytes(text.encode())
    assert len(got) == len(expected)
    for rec, (name, codes) in zip(got, expected):
        assert rec.name == name
        assert rec.codes.tolist() == codes


def test_gzip_roundtrip(tmp_path):
    text = ">r1\nACGTN\n>r2\nggcc\n"
    path = tmp_path / "x.fa.gz"
    with gzip.open(path, "wt") as fh:
        fh.write(text)
    records = read_fasta_codes(str(path))
    assert [r.name for r in records] == ["r1", "r2"]
    assert records[0].codes.tolist() == [0, 1, 2, 3, 4]
    assert records[1].codes.tolist() == [2, 2, 1, 1]


def test_random_fasta_against_naive(rng):
    from conftest import make_random_fasta
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "r.fa")
        make_random_fasta(path, rng, n_records=5, lengths=(33, 90, 7, 255, 64))
        with open(path) as fh:
            text = fh.read()
    expected = naive_parse(text)
    got = decode_fasta_bytes(text.encode())
    assert len(got) == len(expected)
    for rec, (name, codes) in zip(got, expected):
        assert rec.name == name
        assert np.array_equal(rec.codes, np.array(codes, dtype=np.uint8))
