"""Sample comparison as bit-mask intersection.

The reference streams both 4^K byte arrays per pair and popcounts three masks
(tools.py:439-493) — O(N^2) full-file reads. Here each sample is reduced
*once* to a validity bitmask (1 bit per cell: count within [min_count,
max_count]), 8x smaller than the dense array, and every pair is then a
bitwise-AND + population count over the packed words — pure VPU work at HBM
bandwidth, with per-sample totals computed once.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pack_validity_mask(dense: jax.Array, min_count: int, max_count: int) -> jax.Array:
    """uint8[D] → packed uint32[D/32] validity bitmask."""
    d = dense.shape[0]
    assert d % 32 == 0
    valid = (dense >= min_count) & (dense <= max_count)
    bits = valid.reshape(d // 32, 32).astype(jnp.uint32)
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))[None, :]
    return (bits * weights).sum(axis=1, dtype=jnp.uint32)


def popcount_mask(mask: jax.Array) -> jax.Array:
    """Total set bits of a packed mask."""
    return jax.lax.population_count(mask).astype(jnp.int64).sum()


def pair_counts_from_masks(mask_a: jax.Array, mask_b: jax.Array) -> jax.Array:
    """Shared valid-cell count of two packed masks."""
    return jax.lax.population_count(mask_a & mask_b).astype(jnp.int64).sum()


@jax.jit
def pairwise_shared_matrix(masks: jax.Array) -> jax.Array:
    """All-pairs shared counts: masks uint32[N, W] → int64[N, N].

    N is small (tens of samples); the N^2 loop unrolls as vector ops over the
    W-word masks.
    """
    n = masks.shape[0]

    def row(i):
        return jax.vmap(
            lambda b: jax.lax.population_count(masks[i] & b).astype(jnp.int64).sum()
        )(masks)

    return jnp.stack([row(i) for i in range(n)])
