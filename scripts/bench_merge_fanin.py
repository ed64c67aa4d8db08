"""Merge fan-in benchmark: N synthetic .kin samples through the full merge.

Measures the VERDICT-flagged untested regime (N≈39 streams, N block buffers,
mixed raw/.bgz inputs — the reference's 39-genome workload shape,
/root/reference/README.md:56-81) at a configurable K.

Usage: python scripts/bench_merge_fanin.py [N] [K] [n_bgz]
Writes samples under MERGE_BENCH_DIR (default ./merge_bench_data), reusing
existing ones, then runs merge() and reports wall time + peak RSS.
"""

import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def fabricate_kin(path_stem: str, kmer_len: int, seed: int,
                  bgz: bool = False) -> str:
    """Write a synthetic {stem}.fa.{K:02d}.kin(.bgz) + .kin.json with a
    plausible coverage distribution (Poisson-ish + saturated tail)."""
    from pykmer_tpu.formats.header import KinHeader, fast_counts256

    data_size = 4**kmer_len
    rng = np.random.default_rng(seed)
    # ~half the cells empty, heavy tail, some saturation
    plane = rng.poisson(1.2, size=data_size).astype(np.uint16)
    hot = rng.integers(0, data_size, size=data_size // 1000)
    plane[hot] += rng.integers(200, 400, size=hot.shape[0]).astype(np.uint16)
    plane = np.minimum(plane, 255).astype(np.uint8)

    fake_input = f"{path_stem}.fa"
    with open(fake_input, "w") as fh:
        fh.write(">synthetic\nACGT\n")
    kin = f"{fake_input}.{kmer_len:02d}.kin"
    with open(kin, "wb") as fh:
        fh.write(plane.tobytes())
    h = KinHeader(fake_input, input_file=fake_input, kmer_len=kmer_len)
    h.num_kmers = int(plane.astype(np.int64).sum())
    h.chromosomes = [("synthetic", 4)]
    h.write_metadata(kin, stats_counts256=fast_counts256(plane))
    os.rename(f"{kin}.json", f"{kin}.json")  # already in place
    if bgz:
        from pykmer_tpu.io.bgzf import compress_file

        compress_file(kin)
        os.remove(kin)
        return f"{kin}.bgz"
    return kin


def ensure_fanin_inputs(d: str, n: int, k: int, n_bgz: int,
                        verbose: bool = False) -> list:
    """Fabricate (or reuse cached) N fan-in sample planes under ``d`` —
    the single owner of the stem/seed naming convention (bench.py's fan-in
    leg calls this too; keep the convention in one place)."""
    os.makedirs(d, exist_ok=True)
    kins = []
    for i in range(n):
        stem = os.path.join(d, f"s{i:02d}")
        want_bgz = i < n_bgz
        existing = (f"{stem}.fa.{k:02d}.kin" + (".bgz" if want_bgz else ""))
        if os.path.exists(existing):
            kins.append(existing)
            continue
        kins.append(fabricate_kin(stem, k, seed=1000 + i, bgz=want_bgz))
        if verbose:
            print(f"fabricated {kins[-1]}")
    return kins


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 39
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 13
    n_bgz = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    block_size = int(sys.argv[4]) if len(sys.argv) > 4 else None
    d = os.environ.get("MERGE_BENCH_DIR", "merge_bench_data")
    kins = ensure_fanin_inputs(d, n, k, n_bgz, verbose=True)

    import jax
    print(f"backend={jax.default_backend()}", flush=True)

    from pykmer_tpu.merge import merge

    out = os.path.join(d, f"fanin{n}")
    for suffix in (".001-255.kma", ".001-255.kma.json"):
        if os.path.exists(out + suffix):
            os.remove(out + suffix)
    kwargs = {"block_size": block_size} if block_size else {}
    t0 = time.monotonic()
    _, matrix = merge(out, sorted(kins), verbose=False, **kwargs)
    dt = time.monotonic() - t0
    rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    total_bytes = n * 4**k
    print(
        f"N={n} K={k} ({n_bgz} bgz, block={block_size}): merge {dt:.1f}s  "
        f"{total_bytes / dt / 1e6:.0f} MB/s streamed  peak RSS {rss:.1f} GB"
    )
    print(f"matrix diag sample: {matrix[0, 0]}  off: {matrix[0, 1]}")


if __name__ == "__main__":
    main()
