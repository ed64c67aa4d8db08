"""Focused sweep-kernel experiments on the real TPU.

Measures the fixed tile sweep's tuning knobs (int8 MXU, narrow compares,
software-pipelined one-hot build) against the shipping default, with
device-side parity checks. The serialized VPU one-hot build (~15 ms) +
MXU matmul (~11 ms) decomposition measured in r3 is the target: pipelining
should overlap the units, narrow compares should shrink the VPU term.

Usage: python scripts/bench_sweep_exp.py [K] [windows]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from bench_device_step import sync, timed_chain  # noqa: E402


def main() -> None:
    kmer_len = int(sys.argv[1]) if len(sys.argv) > 1 else 15
    windows = int(sys.argv[2]) if len(sys.argv) > 2 else (1 << 24)
    fold_size = 4**kmer_len // 2

    from pykmer_tpu.ops.pallas_hist import accumulate_sorted_pallas

    print(f"backend={jax.default_backend()} K={kmer_len} "
          f"windows={windows:,}", file=sys.stderr)

    rng = np.random.default_rng(11)
    # uniform folded codes at realistic density (bench-genome-like)
    codes = np.sort(
        rng.integers(0, fold_size, size=windows).astype(np.int32))
    sorted_codes = jnp.asarray(codes)
    sync(sorted_codes)

    variants = [
        ("int8 base        ", dict(int8_mxu=True)),
        ("int8 narrow      ", dict(int8_mxu=True, narrow_cmp=True)),
        ("int8 pipe        ", dict(int8_mxu=True, pipelined=True)),
        ("int8 narrow+pipe ", dict(int8_mxu=True, narrow_cmp=True,
                                   pipelined=True)),
        ("bf16 narrow+pipe ", dict(narrow_cmp=True, pipelined=True)),
        ("int8 n+p tr=1024 ", dict(int8_mxu=True, narrow_cmp=True,
                                   pipelined=True, tile_rows=1024)),
    ]

    ref = None
    results = {}
    for name, kw in variants:
        dense = jnp.zeros((fold_size // 128, 128), dtype=jnp.uint8)

        def sweep(d, kw=kw):
            return accumulate_sorted_pallas(d, sorted_codes, **kw)

        swj = jax.jit(sweep, donate_argnums=(0,))
        try:
            t = timed_chain(swj, dense)
        except Exception as exc:
            print(f"{name}: FAILED {type(exc).__name__}: {str(exc)[:200]}",
                  file=sys.stderr)
            continue
        # parity vs the first successful variant (device-side compare)
        out = accumulate_sorted_pallas(
            jnp.zeros((fold_size // 128, 128), jnp.uint8), sorted_codes, **kw)
        if ref is None:
            ref = out
            ok = True
        else:
            ok = bool(jnp.array_equal(ref, out))
            del out
        results[name] = (t, ok)

    print(f"\n== sweep experiments, K={kmer_len}, {windows:,} codes ==")
    for name, (t, ok) in results.items():
        print(f"{name} {t * 1e3:8.1f} ms   "
              f"({windows / t / 1e6:7.1f} M upd/s)"
              + ("" if ok else "  PARITY FAILED"))


if __name__ == "__main__":
    main()
