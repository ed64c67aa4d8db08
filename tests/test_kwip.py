"""kWIP cross-validation harness: TSV ingest + clustering outputs."""

import os

import numpy as np

from pykmer_tpu.analysis.kwip import load_kwip, read_kwip_dist


def _write_dist(path, ids, matrix):
    with open(path, "w") as fh:
        fh.write("\t" + "\t".join(ids) + "\n")
        for i, row_id in enumerate(ids):
            fh.write(row_id + "\t" + "\t".join(f"{v:.6f}" for v in matrix[i]) + "\n")


def test_read_kwip_dist(tmp_path):
    ids = ["s1", "s2", "s3"]
    m = np.array([[0, 0.5, 0.9], [0.5, 0, 0.3], [0.9, 0.3, 0]], float)
    path = str(tmp_path / "all.dist")
    _write_dist(path, ids, m)
    got, got_ids = read_kwip_dist(path)
    assert got_ids == ids
    assert np.allclose(got, m)


def test_load_kwip_outputs(tmp_path):
    ids = ["a", "b", "c", "d"]
    rng = np.random.default_rng(1)
    m = rng.uniform(0.1, 1.0, size=(4, 4))
    m = (m + m.T) / 2
    np.fill_diagonal(m, 0.0)
    path = str(tmp_path / "all.dist")
    _write_dist(path, ids, m)
    load_kwip(path)
    base = path + ".dist.kwip"
    for suffix in (".mat.redundant.np", ".mat.redundant.lsmat",
                   ".mat.condensed.np", ".mat.condensed.txt",
                   ".newick", ".tree", ".png"):
        assert os.path.exists(base + suffix), suffix
