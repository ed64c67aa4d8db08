"""kWIP cross-validation harness (reference kwip/calculate_distance.py).

kWIP is an independent C++ k-mer distance tool the reference uses as an
external oracle (kwip/README.md:10-31): run it over the same genomes, then
cluster its ``.dist`` TSV matrix with the same pipeline and compare trees.
This module ingests that TSV and produces the identical clustering output
set (``.mat.redundant.*``, ``.mat.condensed.*``, ``.newick``, ``.tree``,
``.png``) via our own DistanceMatrix/NJ implementations.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from .cluster import cluster_distance


def read_kwip_dist(dist_file: str) -> Tuple[np.ndarray, list]:
    """Parse a kWIP `.dist` matrix (TSV, row/column sample labels)."""
    import pandas as pd

    frame = pd.read_csv(dist_file, sep="\t", index_col=0)
    ids = [str(c) for c in frame.columns]
    matrix = frame.to_numpy(dtype=np.float64)
    if matrix.shape[0] != matrix.shape[1]:
        raise ValueError(f"{dist_file}: kwip distance matrix must be square")
    # kwip matrices can carry tiny asymmetries / non-zero diagonals from
    # float formatting; normalise like the reference pipeline does implicitly
    matrix = (matrix + matrix.T) / 2.0
    np.fill_diagonal(matrix, 0.0)
    return matrix, ids


def load_kwip(dist_file: str, names_file: Optional[str] = None) -> np.ndarray:
    """Cluster a kWIP distance matrix with the standard output set."""
    matrix, ids = read_kwip_dist(dist_file)

    import json
    import os

    # reuse cluster_distance's file layout with the TSV-derived ids: write a
    # minimal sidecar so load_header can resolve them
    basefile = f"{dist_file}.dist.kwip"
    from .cluster import DistanceMatrix
    from .nj import neighbor_joining
    from .tree import parse_newick, render_ascii, render_png
    from .distance import read_names_file

    if names_file and os.path.exists(names_file):
        names = read_names_file(names_file)
        ids = [names.get(i, i) for i in ids]

    dm = DistanceMatrix(matrix, ids)
    with open(f"{basefile}.mat.redundant.np", "wb") as fh:
        np.save(fh, dm.redundant_form(), allow_pickle=False)
    with open(f"{basefile}.mat.redundant.lsmat", "wt") as fh:
        dm.write_lsmat(fh)
    with open(f"{basefile}.mat.condensed.np", "wb") as fh:
        np.save(fh, dm.condensed_form(), allow_pickle=False)
    with open(f"{basefile}.mat.condensed.txt", "wt") as fh:
        np.savetxt(fh, dm.condensed_form())
    newick = neighbor_joining(matrix, ids)
    with open(f"{basefile}.newick", "wt") as fh:
        fh.write(newick)
    tree = parse_newick(newick)
    with open(f"{basefile}.tree", "wt") as fh:
        fh.write(render_ascii(tree))
    render_png(tree, f"{basefile}.png", title=os.path.basename(dist_file),
               height_px=12 * 4 * (len(ids) + 5), width_px=12 * 2 * (len(ids) + 5),
               dpi=72)
    return dm.redundant_form()
