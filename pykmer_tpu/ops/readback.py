"""Packed device→host readback of the dense array.

Host links to TPU devices can be far slower than HBM (this dev environment's
tunnel moves ~36 MB/s device→host; even real PCIe is ~100x slower than HBM),
so the final 4^K-byte fetch dominates end-to-end indexing time at K>=15.
Counts at realistic coverage are tiny (Poisson λ<1 for K=15 plant genomes:
>99.99% of cells < 15), so the dense uint8 array is read back losslessly as:

  1. 4-bit nibbles, two cells per byte, value 15 meaning ">= 15" — halves
     the transfer;
  2. the host unpacks, finds nibble-15 cells, and patches them with one tiny
     index gather on device (second round trip, bytes ∝ escapes).

Auto-fallback to a raw fetch when escapes are dense (small K / saturated
arrays) or the array is small.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

ESCAPE = 15


@jax.jit
def pack_nibbles(dense: jax.Array) -> jax.Array:
    """uint8[D] → uint8[D/2]: min(v,15) nibbles, even cell in the low bits."""
    nib = jnp.minimum(dense, ESCAPE)
    return (nib[0::2] | (nib[1::2] << 4)).astype(jnp.uint8)


@jax.jit
def count_escapes(dense: jax.Array) -> jax.Array:
    return (dense >= ESCAPE).sum(dtype=jnp.int64)


def unpack_nibbles(packed: np.ndarray) -> np.ndarray:
    out = np.empty(packed.shape[0] * 2, dtype=np.uint8)
    out[0::2] = packed & 0x0F
    out[1::2] = packed >> 4
    return out


def fetch_dense(dense: jax.Array, mode: str = "auto") -> np.ndarray:
    """Fetch the device dense array to host numpy (lossless).

    mode: "auto" | "packed" | "raw".
    """
    d = dense.shape[0]
    if mode == "raw" or (mode == "auto" and d < (1 << 26)):
        return np.asarray(dense)
    n_esc = int(count_escapes(dense))
    if mode == "auto" and n_esc > d // 16:
        return np.asarray(dense)

    packed = np.asarray(pack_nibbles(dense))
    out = unpack_nibbles(packed)
    esc_idx = np.flatnonzero(out == ESCAPE)
    assert esc_idx.shape[0] == n_esc
    if n_esc:
        idx_dev = jnp.asarray(esc_idx.astype(np.int64))
        vals = np.asarray(dense[idx_dev])
        out[esc_idx] = vals
    return out
