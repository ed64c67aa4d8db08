"""Certify the MULTI-HOST K=17 index build at FULL plane size (CPU job).

The BASELINE north star names "K=17 sharded across hosts"
(`/root/repo/BASELINE.md`; reference context `/root/reference/README.md:50`
— its K=17 run took 111m5s on one core and its 17 GB `.kin` was the
largest it ever built). The multi-host machinery is subprocess-certified
end-to-end at K=5 (tests/test_multihost.py) and the sharded accumulate at
full K=17 plane size on one process (scripts/certify_k17_sharded.py);
this script closes the composition: a REAL 2-process `jax.distributed`
CPU job (4 virtual devices each) builds one K=17 index cooperatively —
full 2^33-cell folded partials per host, cross-host slab reduce-scatter
combine, sharded write of the 17 GB (4^17 bytes = 16 GiB) `.kin` — and
every touched cell of the written file is verified against the
pure-Python oracle, without ever materialising a full-size reference
array.

Run: python scripts/certify_k17_multihost.py
(~36 GB peak RAM across the two workers, 17 GB scratch disk, ~10-20 min)
"""

import glob
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import numpy as np

from mh_launch import run_workers  # shared with tests/test_multihost.py

KMER_LEN = 17
DATA_SIZE = 4**KMER_LEN
BASE_LUT = np.frombuffer(b"ACGTN", dtype=np.uint8)


def build_fixture(d: str, rng):
    """~1 Mbp over 3 records: dense random bases (uniform codes over the
    full space), sparse N runs (valid-window gating + record boundaries),
    and a motif tiled 400x (drives cells to the 255 saturation ceiling).
    Returns (fasta_path, list of per-record code arrays)."""
    fa = os.path.join(d, "mh17.fa")
    motif = np.tile(rng.integers(0, 4, size=KMER_LEN).astype(np.uint8), 400)
    records = []
    for r in range(3):
        pieces = [rng.integers(0, 4, size=330_000).astype(np.uint8),
                  rng.integers(0, 5, size=3_000).astype(np.uint8), motif]
        records.append(np.concatenate(pieces))
    with open(fa, "wb") as fh:
        for r, seq in enumerate(records):
            fh.write(f">rec{r}\n".encode())
            fh.write(BASE_LUT[seq].tobytes())
            fh.write(b"\n")
    return fa, records


def run_job(fa: str, nproc: int = 2) -> None:
    t0 = time.monotonic()
    results = run_workers(nproc, [fa, KMER_LEN, 1 << 20], timeout=3000)
    for rc, out in results:
        assert rc == 0, out[-4000:]
    assert "worker 0: ok header=yes" in results[0][1], results[0][1][-2000:]
    print(f"2-process K=17 job: {time.monotonic() - t0:.0f}s", flush=True)


def oracle_expected(records):
    from pykmer_tpu.oracle import oracle_canonical_codes

    t0 = time.monotonic()
    codes = np.concatenate(
        [oracle_canonical_codes(seq, KMER_LEN) for seq in records]
    )
    uniq, counts = np.unique(codes, return_counts=True)
    vals = np.minimum(counts, 255).astype(np.uint8)
    # canonical codes min(fwd, rev) live in the FULL 4^K space — the
    # half-space fold w = min(c, 4^K-1-c) is internal to the device plane
    # and undone by the sharded write's unfold_piece before the file lands
    assert int(uniq.max()) >= 2**31, "fixture must exercise > int32 codes"
    assert int(vals.max()) == 255, "fixture must exercise saturation"
    print(
        f"oracle: {codes.shape[0]:,} K=17 windows, {uniq.shape[0]:,} "
        f"distinct cells in {time.monotonic() - t0:.1f}s",
        flush=True,
    )
    return codes.shape[0], uniq, vals


def verify_kin(kin: str, uniq: np.ndarray, vals: np.ndarray) -> None:
    """Stream the 17 GB file; every nonzero must sit exactly at an oracle
    cell with the oracle's value (no full-size reference array needed)."""
    t0 = time.monotonic()
    assert os.path.getsize(kin) == DATA_SIZE, os.path.getsize(kin)
    block = 1 << 28
    seen = 0
    base = 0
    with open(kin, "rb", buffering=0) as fh:
        while base < DATA_SIZE:
            # raw FileIO reads may return short: advance by what arrived
            buf = np.frombuffer(fh.read(block), dtype=np.uint8)
            assert buf.shape[0] > 0, f"EOF at {base:,} of {DATA_SIZE:,}"
            nz = np.flatnonzero(buf)
            lo, hi = np.searchsorted(uniq, [base, base + buf.shape[0]])
            want_idx = uniq[lo:hi] - base
            assert np.array_equal(nz, want_idx), f"cells differ @ {base:,}"
            assert np.array_equal(buf[nz], vals[lo:hi]), f"vals @ {base:,}"
            seen += hi - lo
            base += buf.shape[0]
    assert seen == uniq.shape[0]
    print(
        f"streamed verify of {DATA_SIZE / 1e9:.0f} GB: every cell "
        f"oracle-exact in {time.monotonic() - t0:.0f}s",
        flush=True,
    )


def main() -> None:
    rng = np.random.default_rng(1717)
    d = tempfile.mkdtemp(prefix="k17mh_", dir=os.environ.get("TMPDIR", "/tmp"))
    try:
        fa, records = build_fixture(d, rng)
        num_windows, uniq, vals = oracle_expected(records)
        run_job(fa)
        kin = f"{fa}.{KMER_LEN:02d}.kin"
        meta = json.load(open(kin + ".json"))
        assert meta["num_kmers"] == num_windows, (
            meta["num_kmers"], num_windows)
        assert meta["vals_count"] == int(uniq.shape[0])
        assert meta["vals_max"] == 255
        assert meta["vals_sum"] == int(vals.astype(np.int64).sum())
        assert len(meta["chromosomes"]) == 3
        print("metadata stats match the oracle", flush=True)
        verify_kin(kin, uniq, vals)
        assert glob.glob(f"{fa}*.tmp*") == [], "tmp litter"
        print("K=17 MULTI-HOST certification PASSED (2-process job, "
              "full 2^33-cell folded partials, 17 GB sharded write)")
    finally:
        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
