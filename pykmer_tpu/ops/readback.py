"""Packed device→host readback of the dense array.

Host links to TPU devices can be far slower than HBM (this dev environment's
tunnel moves ~36 MB/s device→host; even real PCIe is ~100x slower than HBM),
so the final 4^K-byte fetch dominates end-to-end indexing time at K>=15.
Counts at realistic coverage are tiny (Poisson λ<1 for K=15 plant genomes:
>99.99% of cells < 15), so the dense uint8 array is read back losslessly as:

  1. 4-bit nibbles, two adjacent cells per byte, value 15 meaning ">= 15" —
     halves the transfer;
  2. the host unpacks, finds nibble-15 cells, and patches them with one tiny
     index gather on device (second round trip, bytes ∝ escapes).

Auto-fallback to a raw fetch when escapes are dense (small K / saturated
arrays) or the array is small.

All device programs here work on a [rows, 256] 2D view: giant 1D programs
(2^30 elements) trigger pathological XLA TPU compile times.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

ESCAPE = 15
_PACK_LANES = 256


def _as2d(dense: jax.Array) -> jax.Array:
    return dense.reshape(-1, _PACK_LANES)


@jax.jit
def pack_nibbles(dense: jax.Array) -> jax.Array:
    """dense (any shape, size % 256 == 0) → uint8[rows,128]: min(v,15)
    nibbles, even cell of each adjacent pair in the low bits."""
    d2 = _as2d(dense)
    nib = jnp.minimum(d2, ESCAPE)
    return (nib[:, 0::2] | (nib[:, 1::2] << 4)).astype(jnp.uint8)


@jax.jit
def count_escapes(dense: jax.Array) -> jax.Array:
    return (_as2d(dense) >= ESCAPE).sum(dtype=jnp.int64)


def unpack_nibbles(packed: np.ndarray) -> np.ndarray:
    """[rows,128] packed → flat uint8[rows*256] (host side)."""
    rows = packed.shape[0]
    out = np.empty((rows, _PACK_LANES), dtype=np.uint8)
    out[:, 0::2] = packed & 0x0F
    out[:, 1::2] = packed >> 4
    return out.reshape(-1)


@jax.jit
def _gather_cells(dense: jax.Array, rows: jax.Array, cols: jax.Array) -> jax.Array:
    return _as2d(dense)[rows, cols]


def fetch_dense(dense: jax.Array, mode: str = "auto") -> np.ndarray:
    """Fetch the device dense array to host numpy (lossless, flat uint8).

    mode: "auto" | "packed" | "raw".
    """
    size = int(np.prod(dense.shape))
    if mode == "raw" or (mode == "auto" and size < (1 << 26)) or size % _PACK_LANES:
        return np.asarray(dense).reshape(-1)
    n_esc = int(count_escapes(dense))
    if mode == "auto" and n_esc > size // 16:
        return np.asarray(dense).reshape(-1)

    packed = np.asarray(pack_nibbles(dense))
    out = unpack_nibbles(packed)
    esc_idx = np.flatnonzero(out == ESCAPE)
    assert esc_idx.shape[0] == n_esc
    if n_esc:
        rows = jnp.asarray((esc_idx // _PACK_LANES).astype(np.int32))
        cols = jnp.asarray((esc_idx % _PACK_LANES).astype(np.int32))
        vals = np.asarray(_gather_cells(dense, rows, cols))
        out[esc_idx] = vals
    return out
