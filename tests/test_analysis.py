"""Analysis tail: Jaccard distances, NJ/newick, cluster outputs, metrics."""

import os

import numpy as np
import pytest

from pykmer_tpu.analysis import metrics
from pykmer_tpu.analysis.cluster import DistanceMatrix
from pykmer_tpu.analysis.distance import calc_distance, get_matrix, load
from pykmer_tpu.analysis.nj import neighbor_joining
from pykmer_tpu.analysis.tree import parse_newick, render_ascii, render_png


SKBIO_EXAMPLE = np.array(
    [[0, 5, 9, 9, 8],
     [5, 0, 10, 10, 9],
     [9, 10, 0, 8, 7],
     [9, 10, 8, 0, 3],
     [8, 9, 7, 3, 0]], dtype=float)
SKBIO_EXPECTED = ("(d:2.000000, (c:4.000000, (b:3.000000, a:2.000000)"
                  ":3.000000):2.000000, e:1.000000);")


def test_nj_matches_skbio_documented_example():
    assert neighbor_joining(SKBIO_EXAMPLE, list("abcde")) == SKBIO_EXPECTED


def test_nj_two_and_three_taxa():
    two = neighbor_joining(np.array([[0.0, 4.0], [4.0, 0.0]]), ["x", "y"])
    assert two == "(x:2.000000, y:2.000000);"
    three = neighbor_joining(
        np.array([[0, 3, 4], [3, 0, 5], [4, 5, 0]], float), ["x", "y", "z"])
    tree = parse_newick(three)
    lens = {leaf.name: leaf.length for leaf in tree.leaves()}
    assert lens["x"] + lens["y"] == pytest.approx(3.0)
    assert lens["x"] + lens["z"] == pytest.approx(4.0)
    assert lens["y"] + lens["z"] == pytest.approx(5.0)


def test_newick_roundtrip_and_ascii():
    tree = parse_newick(SKBIO_EXPECTED)
    leaves = [l.name for l in tree.leaves()]
    assert sorted(leaves) == list("abcde")
    art = render_ascii(tree)
    for name in "abcde":
        assert f"-{name}" in art


def test_newick_quoted_labels():
    tree = parse_newick("('a b':1.5, \"?\"x:2);")
    assert tree.children[0].name == "a b"
    assert tree.children[0].length == 1.5


def test_render_png(tmp_path):
    tree = parse_newick(SKBIO_EXPECTED)
    out = render_png(tree, str(tmp_path / "t.png"), title="proj")
    assert out and os.path.getsize(out) > 0


def test_calc_distance_formula(tmp_path):
    matrix = np.zeros((3, 3, 3), dtype=np.uint64)
    # pair (0,1): totals 10, 8, shared 4 -> dist 1 - 4/(18-4)
    matrix[0, 1] = (10, 8, 4); matrix[1, 0] = (8, 10, 4)
    matrix[0, 2] = (10, 6, 1); matrix[2, 0] = (6, 10, 1)
    matrix[1, 2] = (8, 6, 3); matrix[2, 1] = (6, 8, 3)
    for i, t in enumerate((10, 8, 6)):
        matrix[i, i] = (t, t, t)
    mf = str(tmp_path / "m.kma")
    basefile, dist = calc_distance(mf, matrix)
    assert basefile == f"{mf}.dist.jaccard"
    assert dist[0, 1] == pytest.approx(1 - 4 / 14)
    assert dist[0, 2] == pytest.approx(1 - 1 / 15)
    assert dist[1, 2] == pytest.approx(1 - 3 / 11)
    assert (np.diagonal(dist) == 0).all()
    saved = np.load(f"{basefile}.npz")["distance"]
    assert np.array_equal(saved, dist)


def test_distance_matrix_forms():
    data = SKBIO_EXAMPLE
    dm = DistanceMatrix(data, list("abcde"))
    assert np.array_equal(dm.redundant_form(), data)
    cond = dm.condensed_form()
    assert cond.tolist() == [5, 9, 9, 8, 10, 10, 9, 8, 7, 3]
    with pytest.raises(ValueError):
        DistanceMatrix(data, list("aacde"))
    with pytest.raises(ValueError):
        DistanceMatrix(data + np.eye(5), list("abcde"))


def test_full_load_pipeline(tmp_path, rng, monkeypatch):
    """End-to-end: index 3 samples, merge, run the analysis tail, check the
    complete output file set (reference README.md:239-251)."""
    from conftest import make_random_fasta
    from pykmer_tpu.index import create_fasta_index
    from pykmer_tpu.merge import merge

    paths = []
    for i in range(3):
        fasta = make_random_fasta(str(tmp_path / f"s{i}.fa"), rng,
                                  n_records=2, lengths=(200 + 30 * i, 100))
        header = create_fasta_index(fasta, f"s{i}", fasta, 5, verbose=False)
        paths.append(header.index_file_root)
    project = str(tmp_path / "proj")
    merge(project, paths, verbose=False)
    kma = f"{project}.001-255.kma"

    # names file remapping
    with open(f"{kma}.names.tsv", "w") as fh:
        fh.write("s0.fa\tSample Zero\n")

    load(kma)
    base = f"{kma}.dist.jaccard"
    for suffix in (".npz", ".mat.redundant.np", ".mat.redundant.lsmat",
                   ".mat.condensed.np", ".mat.condensed.txt", ".newick",
                   ".tree", ".png"):
        assert os.path.exists(base + suffix), f"missing output {suffix}"
    with open(base + ".mat.redundant.lsmat") as fh:
        header_line = fh.readline()
    assert "Sample Zero" in header_line
    with open(base + ".newick") as fh:
        assert fh.read().endswith(";")


def test_metrics_registry():
    names = metrics.available_metrics()
    assert len(names) >= 65
    a, b, c, d = metrics.contingency_from_counts(10, 8, 4)
    assert (a, b, c) == (4.0, 6.0, 4.0)
    assert d == a + b + c  # reference quirk
    assert metrics.compute("D_jaccard", a, b, c, d) == pytest.approx(1 - 4 / 14)
    assert metrics.compute("S_jaccard", a, b, c, d) == pytest.approx(4 / 14)
    # division by zero -> 1.0 (reference error fallback)
    assert metrics.compute("D_jaccard", 0, 0, 0, 0) == 1.0
    # true contingency
    _, _, _, d_true = metrics.contingency_true(10, 8, 4, 1024)
    assert d_true == 1024 - 14


def test_metric_matrix_over_kma():
    matrix = np.zeros((2, 2, 3), dtype=np.uint64)
    matrix[0, 1] = (10, 8, 4); matrix[1, 0] = (8, 10, 4)
    matrix[0, 0] = (10, 10, 10); matrix[1, 1] = (8, 8, 8)
    out = metrics.metric_matrix("D_jaccard", matrix)
    assert out[0, 1] == pytest.approx(1 - 4 / 14)
    assert out[0, 0] == 0.0
