"""Saturating dense-histogram accumulation on device.

The `.kin` array is ``min(total_count, 255)`` per canonical code — the
reference's two-stage clipping (per-flush clip at indexer.py:239 plus
saturating memmap add at indexer.py:262) composes to exactly that, so
accumulation order and batching cannot change the result (the test-suite
proves this against the flush-faithful oracle).

Algorithm per batch (all static shapes, no data-dependent control flow):
  1. sort the batch's codes (sentinels 4^K sort to the end);
  2. run-length analysis with two associative scans (run start = prefix-max of
     start indices, run end = suffix-min of next-start indices) — every
     element of a run learns its run's total count without any scatter;
  3. gather current dense values at the sorted codes, compute
     ``min(old + count, 255)``, and scatter-overwrite. Duplicates all write
     the same value and indices are sorted+in-range-checked, which XLA can
     lower without serialising the whole update.
"""

from __future__ import annotations

import functools
from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from ..config import MAX_VAL


def sort_codes_fast(codes: jax.Array) -> jax.Array:
    """Keys-only UNSTABLE sort via an unsigned bitcast.

    Stability cannot change a keys-only sort's output, and every code domain
    here is non-negative (canonical/folded codes, sentinels), so unsigned
    order == signed order. Measured on v5e at 16.7M int32 codes: stable
    jnp.sort 34.8 ms / unstable signed 17.3 / unstable unsigned 10.1 —
    the 3.4x that took the sort off the device step's critical path (r3,
    docs/ROUND_NOTES.md)."""
    if codes.dtype == jnp.int32 or codes.dtype == jnp.int64:
        uint_dt = jnp.uint32 if codes.dtype == jnp.int32 else jnp.uint64
        u = jax.lax.bitcast_convert_type(codes, uint_dt)
        return jax.lax.bitcast_convert_type(
            jax.lax.sort(u, is_stable=False), codes.dtype
        )
    return jax.lax.sort(codes, is_stable=False)


def saturating_accumulate(
    dense: jax.Array, codes: jax.Array, sentinel: int
) -> Tuple[jax.Array, jax.Array]:
    """Apply one batch of canonical codes to the dense uint8 array.

    dense: uint8[D]; codes: int[M] (values in [0, D] where D==sentinel marks
    dropped/padded windows). Returns (updated dense, number of valid codes).
    """
    return saturating_accumulate_sorted(dense, sort_codes_fast(codes), sentinel)


def saturating_accumulate_sorted(
    dense: jax.Array, sorted_codes: jax.Array, sentinel: int
) -> Tuple[jax.Array, jax.Array]:
    """Same as :func:`saturating_accumulate` for an ALREADY-SORTED batch —
    the split device step sorts in its encode program (index.indexer), so
    the apply program must not pay a second sort."""
    m = sorted_codes.shape[0]
    idx = jnp.arange(m, dtype=jnp.int32)

    is_start = jnp.concatenate(
        [jnp.ones((1,), dtype=bool), sorted_codes[1:] != sorted_codes[:-1]]
    )
    start_idx = jnp.where(is_start, idx, -1)
    run_start = jax.lax.associative_scan(jnp.maximum, start_idx)

    next_idx = jnp.where(is_start, idx, m)
    suffix_min = jax.lax.associative_scan(jnp.minimum, next_idx, reverse=True)
    run_end = jnp.concatenate([suffix_min[1:], jnp.full((1,), m, jnp.int32)])

    count = jnp.minimum(run_end - run_start, MAX_VAL)

    valid = sorted_codes < sentinel
    safe_idx = jnp.where(valid, sorted_codes, 0)
    old = dense[safe_idx].astype(jnp.int32)
    new = jnp.minimum(old + count, MAX_VAL).astype(jnp.uint8)

    dense = dense.at[sorted_codes].set(
        new, mode="drop", indices_are_sorted=True
    )
    num_valid = valid.sum(dtype=jnp.int64)
    return dense, num_valid


def make_accumulate_fn(data_size: int) -> Callable:
    """jit-compiled accumulate with the dense array donated (updated in place)."""

    @functools.partial(jax.jit, donate_argnums=0)
    def fn(dense: jax.Array, codes: jax.Array):
        assert dense.shape == (data_size,)
        return saturating_accumulate(dense, codes, sentinel=data_size)

    return fn


def counts256_from_dense(dense) -> "np.ndarray":
    """256-bin value histogram of the dense array (host-side numpy).

    Delegates to formats.header.fast_counts256 — np.bincount on a GiB-scale
    uint8 plane materialises an 8x int64 cast (60+ s at 4^15)."""
    import numpy as np

    from ..formats.header import fast_counts256

    return fast_counts256(np.asarray(dense).reshape(-1))
