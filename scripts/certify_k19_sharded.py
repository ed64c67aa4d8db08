"""Certify the K=19 mechanisms — BEYOND the reference's envelope.

The reference could not run K=19 at all: its dense ``.kin`` would be 257 GB
(``/root/reference/README.md:51-52``). This framework's design can — the
folded half-space is 2^37 cells (137 GB = 128 GiB uint8), which maps to a
>= 128-shard pod (int32 local indexing; the build-time envelope guard in
``parallel/histogram.py`` enforces exactly that on TPU backends) or the
single-chip tuple-of-sub-planes sweep over 128 x 2^30-cell planes streamed
through the sparse readback. Neither full layout fits one host's RAM, so —
unlike ``certify_k17_sharded.py``, whose 8.6 GB plane DID fit — this script
certifies every K=19-SPECIFIC mechanism at reduced scale on the virtual
mesh:

 A. sharded halo encode (ring ppermute) at K=19 on 8 virtual devices:
    int64 canonical codes up to ~2^38, parity vs the pure-Python oracle;
 B. the production unstable int64 sort (``sort_codes_fast``) at K=19
    magnitudes, sentinel ordering included;
 C. the K=19 sharded-accumulate program BUILDS and AOT-LOWERS at full
    plane shapes (8 x 2^34-cell int64-local shards) without allocating,
    and the TPU envelope arithmetic demands >= 128 shards (the guard's
    boundary is hw-certified in ``tests_hw/test_tpu_sharded.py``);
 D. the production Pallas sub-plane sweep applied at window bases spanning
    the FULL 2^37 folded range — including bases far beyond int32, the
    exact localisation mechanism K=19 adds over K=15
    (``ops/pallas_hist.localize_sorted``) — every touched cell checked
    against the oracle, with 255-saturation exercised in one window.

Run: python scripts/certify_k19_sharded.py   (a few minutes; ~2 GB RAM)
"""

import os
import sys
import time

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

KMER_LEN = 19
FOLD_SIZE = 4**KMER_LEN // 2  # 2^37
WINDOW_CELLS = 1 << 22  # reduced-scale sub-plane (mechanism is size-blind)


def build_fixture(rng):
    """~620 kbp mostly-N-free random sequence (dense, uniform folded codes
    across the full 2^37 range) plus sparse N runs (valid-window gating)
    and a motif tiled 300x (drives K=19 cells to the 255 ceiling)."""
    pieces = []
    motif = np.tile(rng.integers(0, 4, size=KMER_LEN).astype(np.uint8), 300)
    for _ in range(6):
        pieces.append(rng.integers(0, 4, size=100_000).astype(np.uint8))
        pieces.append(rng.integers(0, 5, size=2_000).astype(np.uint8))
        pieces.append(motif)
    return np.concatenate(pieces)


def part_a_halo_encode(seq, want_codes):
    from pykmer_tpu.parallel import make_halo_encode, make_mesh

    mesh = make_mesh(n_shards=8, n_data=1)
    shard_len = (seq.shape[0] + 7) // 8
    pad = np.full(shard_len * 8 - seq.shape[0], 4, np.uint8)
    fn = make_halo_encode(mesh, KMER_LEN, shard_len)
    got = np.asarray(fn(np.concatenate([seq, pad])))
    sentinel = 4**KMER_LEN
    assert got.dtype == np.int64, got.dtype
    got_valid = got[got < sentinel]
    assert np.array_equal(got_valid, want_codes), "halo encode parity"
    assert int(want_codes.max()) > 2**37, "fixture must exceed 2^37 codes"
    print(
        f"A. sharded halo encode K=19: {want_codes.shape[0]:,} codes, "
        f"max {int(want_codes.max()):,} (> 2^37) — parity OK",
        flush=True,
    )


def part_b_sort(folded):
    from pykmer_tpu.ops.histogram import sort_codes_fast

    # production stream: folded codes with trailing invalid-window sentinels
    stream = np.concatenate(
        [folded, np.full(1024, FOLD_SIZE, np.int64)]
    ).astype(np.int64)
    got = np.asarray(sort_codes_fast(jax.numpy.asarray(stream)))
    want = np.sort(stream)
    assert np.array_equal(got, want), "int64 sort parity at K=19"
    assert got[-1] == FOLD_SIZE, "sentinels must sort last"
    print(
        f"B. sort_codes_fast int64 K=19: {stream.shape[0]:,} keys "
        "(sentinels last) — parity OK",
        flush=True,
    )
    return want[: folded.shape[0]]  # sorted valid codes


def part_c_build_and_lower():
    from pykmer_tpu.parallel import make_mesh, make_sharded_accumulate

    mesh = make_mesh(n_shards=8, n_data=1)
    chunk_windows = 1 << 20
    init_fn, step_fn = make_sharded_accumulate(mesh, KMER_LEN, chunk_windows)
    local = FOLD_SIZE // 8
    assert step_fn.local_size == local == 2**34
    span = step_fn.span
    b_span, m_span = (span + 3) // 4, (span + 7) // 8
    t0 = time.monotonic()
    lowered = step_fn.jitted.lower(
        jax.ShapeDtypeStruct((8, local), np.uint8,
                             sharding=step_fn.dense_sharding),
        jax.ShapeDtypeStruct((), np.int64),
        jax.ShapeDtypeStruct((), np.int32),
        jax.ShapeDtypeStruct((8, b_span), np.uint8,
                             sharding=step_fn.chunk_sharding),
        jax.ShapeDtypeStruct((8, m_span), np.uint8,
                             sharding=step_fn.chunk_sharding),
    )
    text = lowered.as_text()
    assert "all_to_all" in text or "AllToAll" in text
    # the TPU envelope guard's arithmetic (parallel/histogram.py): minimum
    # power-of-two shard count whose local plane stays int32-indexable
    need = 1
    while FOLD_SIZE // need > 2**31 - 1:
        need *= 2
    assert need == 128, need  # 2^37/64 = 2^31 still exceeds int32 by one
    print(
        f"C. K=19 sharded step lowers at FULL plane shapes (8 x {local:,} "
        f"int64-local cells, {time.monotonic() - t0:.1f}s, no allocation); "
        "TPU envelope demands >= 128 shards — OK",
        flush=True,
    )


def part_d_subplane_sweep(sorted_folded):
    from pykmer_tpu.ops.pallas_hist import (
        accumulate_sorted_pallas,
        localize_sorted,
    )

    jnp = jax.numpy
    uniq, counts = np.unique(sorted_folded, return_counts=True)
    motif_code = int(uniq[counts.argmax()])
    # window bases spanning the full folded range: bottom, middle (the
    # first base past int32), top (near 2^37), and the saturated motif cell
    bot_code = int(sorted_folded[0])
    mid_code = int(sorted_folded[sorted_folded.shape[0] // 2])
    top_code = int(sorted_folded[-1])
    bases = sorted(
        {
            (bot_code // WINDOW_CELLS) * WINDOW_CELLS,
            (mid_code // WINDOW_CELLS) * WINDOW_CELLS,
            (top_code // WINDOW_CELLS) * WINDOW_CELLS,
            (motif_code // WINDOW_CELLS) * WINDOW_CELLS,
        }
    )
    assert max(bases) > 2**32, "top window must exceed int32 offsets"
    stream = jnp.asarray(sorted_folded)
    rows = WINDOW_CELLS // 128
    sat_seen = False
    for base in bases:
        t0 = time.monotonic()
        local = localize_sorted(stream, base, base + WINDOW_CELLS)
        assert local.dtype == jnp.int32
        plane = jnp.zeros((rows, 128), dtype=jnp.uint8)
        out = accumulate_sorted_pallas(
            plane, local, tile_rows=min(512, rows), interpret=True
        )
        got = np.asarray(out).reshape(-1)
        in_w = (uniq >= base) & (uniq < base + WINDOW_CELLS)
        cells = uniq[in_w] - base
        want = np.minimum(counts[in_w], 255).astype(np.uint8)
        assert cells.shape[0] > 0, f"window @{base:,} has no oracle hits"
        assert np.array_equal(got[cells], want), f"window @{base:,} mismatch"
        assert int(got.astype(np.int64).sum()) == int(
            want.astype(np.int64).sum()
        ), f"stray nonzeros @{base:,}"
        if int(want.max()) == 255:
            sat_seen = True
        print(
            f"D. sweep window @ base {base:,}: {cells.shape[0]:,} cells, "
            f"max {int(want.max())}, {time.monotonic() - t0:.1f}s — OK",
            flush=True,
        )
    assert sat_seen, "one window must exercise 255 saturation"


def main() -> None:
    from pykmer_tpu.oracle import oracle_canonical_codes

    rng = np.random.default_rng(19)
    seq = build_fixture(rng)
    t0 = time.monotonic()
    want_codes = oracle_canonical_codes(seq, KMER_LEN)
    print(
        f"oracle: {want_codes.shape[0]:,} K=19 codes in "
        f"{time.monotonic() - t0:.1f}s",
        flush=True,
    )
    m = np.int64(4**KMER_LEN - 1)
    folded = np.minimum(want_codes, m - want_codes)

    part_a_halo_encode(seq, want_codes)
    sorted_folded = part_b_sort(folded)
    part_c_build_and_lower()
    part_d_subplane_sweep(sorted_folded)
    print("K=19 certification PASSED (beyond-reference envelope)")


if __name__ == "__main__":
    main()
