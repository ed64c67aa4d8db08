"""Sequence-parallel encoding with ring halo exchange.

When the base-code stream itself lives sharded across chips (long-genome
streaming without host re-framing), each chip needs the first K-1 bases of
its right neighbour to close its boundary windows — the genomic analog of
context-parallel halo passing (the reference materialises whole chromosomes
in one tuple instead, indexer.py:75-79). ``jax.lax.ppermute`` ships the halo
left along the 'shards' ring; the last chip pads with invalid bases so its
tail windows drop.

Why the production indexers do NOT route through this: the host framer
already hands each chunk its K−1 overlap bases inline (ops.encode
chunk_stream), costing (K−1)/chunk_windows ≈ 0.0004%% extra upload at the
default 4M-window chunks — an on-device ppermute would add a collective
per step to save nothing measurable. This encoder is the right primitive
only when sequences are BORN device-resident and resharding through the
host is the thing being avoided (e.g. a device-side generative pipeline);
it is kept compiled-path-tested (dryrun + tests/test_parallel.py) for that
deployment shape.
"""

from __future__ import annotations

import functools

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import SHARD_AXIS
from ..ops.encode import canonical_codes


@functools.lru_cache(maxsize=None)
def make_halo_encode(mesh: Mesh, kmer_len: int, shard_len: int) -> Callable:
    """Returns jitted fn: seq [S*shard_len] (sharded) → codes [S*shard_len]
    (sharded; one canonical code per window start, sentinel where invalid or
    past the sequence end)."""
    n_shards = mesh.shape[SHARD_AXIS]
    halo = kmer_len - 1

    def per_chip(seq_local):
        # seq_local: [1, shard_len]
        seq = seq_local[0]
        my_head = seq[:halo]
        # send my first K-1 bases to my LEFT neighbour (it needs them as halo)
        perm = [(i, (i - 1) % n_shards) for i in range(n_shards)]
        neighbor_head = jax.lax.ppermute(my_head, SHARD_AXIS, perm)
        # last chip's "neighbour" wrapped around: poison it
        idx = jax.lax.axis_index(SHARD_AXIS)
        neighbor_head = jnp.where(
            idx == n_shards - 1, jnp.full((halo,), 4, jnp.uint8), neighbor_head
        )
        ext = jnp.concatenate([seq, neighbor_head])
        return canonical_codes(ext, kmer_len)[None, :]

    from jax import shard_map

    fn = shard_map(
        per_chip,
        mesh=mesh,
        in_specs=(P(SHARD_AXIS, None),),
        out_specs=P(SHARD_AXIS, None),
        check_vma=False,
    )
    jitted = jax.jit(fn)
    sharding = NamedSharding(mesh, P(SHARD_AXIS, None))

    def encode(seq_flat):
        seq = jax.device_put(
            seq_flat.reshape(n_shards, shard_len), sharding
        )
        return jitted(seq).reshape(-1)

    return encode
