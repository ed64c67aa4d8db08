"""Sharded N×N comparison: per-chip MXU contingency partials + psum.

The merge engine's V·Vᵀ matmul (merge/merger.py) over cell-space shards:
each chip computes the N×N partial over its slice of the count space, one
psum over 'shards' yields the full matrix on every chip. Cell-space order
inside a shard is irrelevant (the matmul is a sum over cells), so any
host-side blocking works.
"""

from __future__ import annotations

import functools

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import SHARD_AXIS


@functools.lru_cache(maxsize=None)
def make_sharded_pair_matrix(
    mesh: Mesh, n_samples: int, cells_per_shard: int,
    min_count: int, max_count: int,
) -> Callable:
    """Returns jitted fn: blocks [N, S*cells] (sharded on axis 1) → [N, N]
    shared-count matrix (replicated)."""
    n_shards = mesh.shape[SHARD_AXIS]

    def per_chip(blocks_local):
        # [N, 1, cells]
        v = (
            (blocks_local[:, 0, :] >= min_count)
            & (blocks_local[:, 0, :] <= max_count)
        ).astype(jnp.int8)
        partial = jnp.dot(v, v.T, preferred_element_type=jnp.int32)
        return jax.lax.psum(partial, SHARD_AXIS)

    from jax import shard_map

    fn = shard_map(
        per_chip,
        mesh=mesh,
        in_specs=(P(None, SHARD_AXIS, None),),
        out_specs=P(None, None),
        check_vma=False,
    )
    jitted = jax.jit(fn)
    sharding = NamedSharding(mesh, P(None, SHARD_AXIS, None))

    def pair_matrix(blocks):
        # blocks: [N, total_cells] uint8 with total = n_shards*cells_per_shard
        blocks = blocks.reshape(n_samples, n_shards, cells_per_shard)
        blocks = jax.device_put(blocks, sharding)
        return jitted(blocks)

    return pair_matrix
