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


def _write_fake_kma(tmp_path, ids, shared_frac):
    """Minimal .kma + .kma.json: per-sample totals 100, shared given."""
    import json

    n = len(ids)
    m = np.zeros((n, n, 3), dtype=np.uint64)
    for i in range(n):
        for j in range(n):
            m[i, j] = (100, 100, round(100 * shared_frac[i][j]))
    kma = str(tmp_path / "proj.001-255.kma")
    with open(kma, "wb") as fh:
        np.savez_compressed(fh, matrix=m)
    os.rename(kma + ".npz", kma) if os.path.exists(kma + ".npz") else None
    with open(kma + ".json", "w") as fh:
        json.dump({"project_name": "proj",
                   "data": [{"header": {"input_file_name": i}} for i in ids]},
                  fh)
    return kma


def test_compare_with_kma_agreement(tmp_path):
    """A kWIP matrix that induces the same geometry as the .kma's Jaccard
    distances must report high rank correlation and NN agreement; sample
    names match modulo the .khmer suffix."""
    from pykmer_tpu.analysis.kwip import compare_with_kma

    ids = ["a.fa.bgz", "b.fa.bgz", "c.fa.bgz", "d.fa.bgz"]
    # shared fractions -> jaccard dist = 1 - s/(200-s); a,b close; c,d close
    shared = [[1.0, 0.8, 0.2, 0.1],
              [0.8, 1.0, 0.1, 0.2],
              [0.2, 0.1, 1.0, 0.7],
              [0.1, 0.2, 0.7, 1.0]]
    kma = _write_fake_kma(tmp_path, ids, shared)
    # kwip side: a monotone transform of the same geometry, khmer-named
    jd = np.array([[0.0 if i == j else 1 - shared[i][j] * 100 /
                    (200 - shared[i][j] * 100) for j in range(4)]
                   for i in range(4)])
    kw = np.sqrt(jd)  # monotone -> rank-identical
    path = str(tmp_path / "all.dist")
    _write_dist(path, [i + ".khmer" for i in ids], kw)
    rep = compare_with_kma(path, kma)
    assert rep["n_samples"] == 4
    assert rep["spearman"] > 0.99
    assert rep["nn_agreement"] == 1.0
    assert rep["pearson"] > 0.9


def test_compare_with_kma_too_few_matches(tmp_path):
    import pytest

    from pykmer_tpu.analysis.kwip import compare_with_kma

    kma = _write_fake_kma(tmp_path, ["x.fa", "y.fa", "z.fa"],
                          [[1, 0.5, 0.5], [0.5, 1, 0.5], [0.5, 0.5, 1]])
    path = str(tmp_path / "other.dist")
    _write_dist(path, ["p.khmer", "q.khmer", "r.khmer"],
                np.zeros((3, 3)))
    with pytest.raises(ValueError, match="samples match"):
        compare_with_kma(path, kma)


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
