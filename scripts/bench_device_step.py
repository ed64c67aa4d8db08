"""Device-step microbenchmark: encode / sort / sweep on one TPU chip.

The end-to-end pipeline hides the device step behind the host/wire pipeline
(docs/PERFORMANCE.md), but the step itself is the single-chip MFU story and
caps throughput on any faster-link deployment. This script measures each
stage of the per-chunk step at realistic shape (default: K=15, 16.7M
windows), sweeps the kernel variants, and prints a windows/s table plus an
MFU estimate for the sweep.

Stages (matching index.indexer._make_chunk_sorted_codes + _make_sweep_apply):
  encode : unpack 2-bit bases -> canonical codes -> fold
  sort   : jnp.sort of the folded codes (int32 / f32-bitcast variants)
  sweep  : Pallas tile sweep (bf16 / int8 MXU variants, tile_rows sweep)

Usage: python scripts/bench_device_step.py [K] [windows]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def sync(x):
    """Force full device completion: fetch one scalar (block_until_ready on
    this environment's tunneled backend does not reliably wait for
    non-donating programs, and each sync costs a ~0.1-1 s RPC round trip —
    every measurement below amortizes MANY chained iterations over ONE
    sync and subtracts the measured sync cost)."""
    return float(jnp.sum(x[..., :1].astype(jnp.float32)))


def timed_chain(fn, x0, iters=8, trials=3):
    """Best-of-trials per-iteration time of out = fn(out) chained ``iters``
    times behind one scalar-fetch sync; fn must preserve shape/dtype."""
    out = fn(x0)
    sync(out)  # warmup: compile + first executable load
    # measure the bare sync round trip to subtract it
    t0 = time.perf_counter()
    sync(out)
    t_sync = time.perf_counter() - t0
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(out)  # rolling rebind: donating fns consume the input
        sync(out)
        best = min(best, (time.perf_counter() - t0 - t_sync) / iters)
    return best


def main() -> None:
    kmer_len = int(sys.argv[1]) if len(sys.argv) > 1 else 15
    windows = int(sys.argv[2]) if len(sys.argv) > 2 else (1 << 24)
    fold_size = 4**kmer_len // 2
    span = windows + kmer_len - 1

    from pykmer_tpu.ops.encode import (
        canonical_codes,
        fold_codes,
        pack_base_stream,
        unpack_base_2bit,
    )
    from pykmer_tpu.ops.pallas_hist import accumulate_sorted_pallas

    print(f"backend={jax.default_backend()} K={kmer_len} "
          f"windows={windows:,} fold_size={fold_size:,}", file=sys.stderr)

    rng = np.random.default_rng(7)
    bases = rng.integers(0, 4, size=span).astype(np.uint8)
    bases2, _maskbits = pack_base_stream(bases)
    dev_b = jnp.asarray(bases2)

    # --- encode ---------------------------------------------------------
    from pykmer_tpu.ops.encode import canonical_codes_packed

    @jax.jit
    def encode(b):
        return fold_codes(
            canonical_codes(unpack_base_2bit(b, span), kmer_len), kmer_len
        )

    # the bases must be an ARGUMENT of the jitted chain, not a closed-over
    # device constant: jit treats a captured array as a compile-time
    # constant and XLA folded the entire encode + max into one scalar,
    # which is how the r3 table recorded "0.2 ms" for the packed encoder
    # (the carried scalar serializes iterations, the max keeps the encode
    # live). Standalone encode chains still disagree a few ms with in-step
    # A/B (output alloc churn), so the production encoder default is set
    # by A/B of the full chained step — see index.indexer.
    @jax.jit
    def encode_chain(c, b):
        codes = encode(b).astype(jnp.int32)
        return c + codes.max()

    t_enc_old = timed_chain(
        lambda c: encode_chain(c, dev_b), jnp.zeros((1,), jnp.int32)
    )
    print(f"encode+fold slice : {t_enc_old * 1e3:6.1f} ms", file=sys.stderr)

    enc_ok = True
    codes_i32 = encode(dev_b).astype(jnp.int32)
    sync(codes_i32)
    if kmer_len <= 15:  # the packed encoder's 2K-bit fields need u32 pairs

        @jax.jit
        def encode_packed_chain(c, b):
            codes = canonical_codes_packed(
                b, None, span, kmer_len
            ).astype(jnp.int32)
            return c + codes.max()

        t_enc_packed = timed_chain(
            lambda c: encode_packed_chain(c, dev_b), jnp.zeros((1,), jnp.int32)
        )
        print(f"encode+fold packed: {t_enc_packed * 1e3:6.1f} ms",
              file=sys.stderr)
        enc_ok = bool(jnp.array_equal(
            canonical_codes_packed(dev_b, None, span, kmer_len)
            .astype(jnp.int32), codes_i32))
        print(f"packed-encode parity: {enc_ok}", file=sys.stderr)
        # report the best of the two as the step's encode leg
        t_enc = min(t_enc_old, t_enc_packed) if enc_ok else t_enc_old
    else:
        t_enc = t_enc_old

    # --- sort variants --------------------------------------------------
    sort_i32 = jax.jit(lambda c: jnp.sort(c))
    t_sort = timed_chain(sort_i32, codes_i32)
    sorted_codes = sort_i32(codes_i32)
    sync(sorted_codes)

    # the shipping sort (r3 default): unstable keys-only on the unsigned
    # bitcast — stability cannot change a keys-only output, non-negative
    # codes make unsigned order == signed order
    from pykmer_tpu.ops.histogram import sort_codes_fast

    sort_fast = jax.jit(sort_codes_fast)
    t_sortu = timed_chain(sort_fast, codes_i32)
    u_ok = bool(jnp.array_equal(sort_fast(codes_i32), sorted_codes))
    print(f"unstable-u32 sort parity: {u_ok}", file=sys.stderr)

    @jax.jit
    def sort_f32_bitcast(c):
        # bias by 2^30 so every bitcast is a NORMAL positive float (TPU
        # flushes denormals, which breaks compares for codes < 2^23); the
        # biased range [2^30, 2^30 + 2^29) stays well below the NaN band,
        # and positive-float IEEE order == integer order
        f = jax.lax.bitcast_convert_type(c + jnp.int32(1 << 30), jnp.float32)
        return jax.lax.bitcast_convert_type(
            jnp.sort(f), jnp.int32
        ) - jnp.int32(1 << 30)

    t_sortf = timed_chain(sort_f32_bitcast, codes_i32)
    # compare ON DEVICE: a single 67 MB host fetch aborts the tunneled link
    f32_ok = bool(jnp.array_equal(sort_f32_bitcast(codes_i32), sorted_codes))
    print(f"f32-bitcast sort parity: {f32_ok}", file=sys.stderr)
    if not f32_ok:
        t_sortf = float("inf")

    @jax.jit
    def sort_key16(c):
        # the sweep only needs TILE-granular grouping (>= 2^13-cell groups
        # at any tile_rows >= 64), so sort by the top 16 bits as a uint16
        # KEY carrying the low 13 bits as a uint16 payload — half-width
        # compares; the reconstructed stream is grouped, not fully sorted
        k = (c >> jnp.int32(13)).astype(jnp.uint16)
        v = (c & jnp.int32(0x1FFF)).astype(jnp.uint16)
        ks, vs = jax.lax.sort((k, v), num_keys=1)
        return (ks.astype(jnp.int32) << 13) | vs.astype(jnp.int32)

    t_sortk16 = timed_chain(sort_key16, codes_i32)
    k16_ok = bool(
        jnp.array_equal(jnp.sort(sort_key16(codes_i32)), sorted_codes)
    )
    print(f"key16 sort parity (re-sorted): {k16_ok}", file=sys.stderr)

    seg_rows = 16

    @jax.jit
    def sort_segmented(c):
        # 16 independent segment sorts (what a multi-stream sweep would
        # consume); lower bound on what segmenting could buy
        return jnp.sort(c, axis=1)

    pad = (-codes_i32.shape[0]) % seg_rows
    codes_seg = jnp.concatenate(
        [codes_i32, jnp.full((pad,), np.int32(2**31 - 1), jnp.int32)]
    ) if pad else codes_i32
    t_sortseg = timed_chain(sort_segmented, codes_seg.reshape(seg_rows, -1))

    # --- sweep variants -------------------------------------------------
    results = {}
    for tile_rows in (256, 512, 1024):
        for int8_mxu in (False, True):
            dense = jnp.zeros((fold_size // 128, 128), dtype=jnp.uint8)

            def sweep(d, s, tr=tile_rows, i8=int8_mxu):
                return accumulate_sorted_pallas(d, s, tile_rows=tr,
                                                int8_mxu=i8)

            swj = jax.jit(sweep, donate_argnums=(0,))
            try:
                # chained donation: each iteration's input is the previous
                # output (production aliases the plane in place; re-calling
                # with a consumed buffer would be invalid)
                t = timed_chain(lambda d: swj(d, sorted_codes), dense)
            except Exception as exc:  # Mosaic may reject a variant
                print(f"  sweep tr={tile_rows} int8={int8_mxu}: "
                      f"FAILED {type(exc).__name__}: {str(exc)[:120]}",
                      file=sys.stderr)
                continue
            results[(tile_rows, int8_mxu)] = t

    # correctness spot-check of the int8 variant vs bf16 (device-side
    # compare — the planes are 0.5 GiB, never fetch them)
    int8_ok = None
    if any(k[1] for k in results):
        dense_a = jnp.zeros((fold_size // 128, 128), dtype=jnp.uint8)
        dense_b = jnp.zeros((fold_size // 128, 128), dtype=jnp.uint8)
        a = accumulate_sorted_pallas(dense_a, sorted_codes)
        b = accumulate_sorted_pallas(dense_b, sorted_codes, int8_mxu=True)
        int8_ok = bool(jnp.array_equal(a, b))
        print(f"int8 sweep parity vs bf16: {int8_ok}", file=sys.stderr)
        del dense_a, dense_b, a, b

    # --- report ---------------------------------------------------------
    m = windows
    print(f"\n== device step, K={kmer_len}, {m:,} windows ==")
    print(f"encode+fold best             {t_enc * 1e3:8.1f} ms"
          f"  ({m / t_enc / 1e6:7.1f} M win/s; defaults are per-variant,"
          f" see index.indexer)"
          + ("" if enc_ok else "  (PARITY FAILED — slice time shown)"))
    print(f"encode+fold slice            {t_enc_old * 1e3:8.1f} ms")
    print(f"sort int32 (stable)          {t_sort * 1e3:8.1f} ms")
    print(f"sort u32 unstable (DEFAULT)  {t_sortu * 1e3:8.1f} ms"
          + ("" if u_ok else "  (PARITY FAILED — excluded)"))
    print(f"sort f32-bitcast             {t_sortf * 1e3:8.1f} ms"
          + ("" if f32_ok else "  (PARITY FAILED — excluded)"))
    print(f"sort key16+payload16         {t_sortk16 * 1e3:8.1f} ms"
          + ("  (tile-granular grouping)" if k16_ok
             else "  (PARITY FAILED)"))
    print(f"sort 16-segment              {t_sortseg * 1e3:8.1f} ms")
    best_sort = min(t_sort, t_sortf,
                    t_sortu if u_ok else float('inf'))
    print()
    best_key, best_sweep = None, float("inf")
    for (tr, i8), t in sorted(results.items()):
        n_tiles = fold_size // (tr * 128)
        # MXU MACs: ~2 blocks-per-tile slop from window alignment
        blocks = m // 1024 + n_tiles * 2
        macs = blocks * tr * 1024 * 128
        peak = 394e12 if i8 else 197e12
        mfu = 2 * macs / t / peak
        tag = "int8" if i8 else "bf16"
        print(f"sweep tr={tr:5d} {tag}          {t * 1e3:8.1f} ms"
              f"  (~{mfu * 100:4.1f}% MXU of {'394T' if i8 else '197T'})")
        if t < best_sweep:
            best_key, best_sweep = (tr, i8), t
    step = t_enc + best_sort + best_sweep
    print(f"\nbest step = encode {t_enc * 1e3:.1f} + sort "
          f"{best_sort * 1e3:.1f} + sweep {best_sweep * 1e3:.1f} ms "
          f"-> {m / step / 1e6:,.0f} M windows/s "
          f"(sweep variant {best_key})")


if __name__ == "__main__":
    main()
