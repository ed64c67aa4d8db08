"""Pallas TPU kernel: saturating dense-histogram accumulation.

Why: XLA lowers scatter-add on TPU to a serial per-update loop (~1 M
updates/s measured — the reference-beating bottleneck), and its compile time
scales with the update count. This kernel replaces the scatter with a dense
tile sweep that runs entirely on MXU/VPU:

  - updates = the batch's canonical codes, **sorted** (XLA sort), so each
    dense tile owns a contiguous slice of them; per-tile slice bounds come
    from one searchsorted over the tile boundaries (scalar-prefetched);
  - grid = dense tiles of (TILE_ROWS, 128) uint8 cells streamed
    HBM→VMEM→HBM by the Pallas pipeline;
  - per tile, updates arrive in fixed-size blocks (manual DMA from HBM with
    a dynamic offset); each block turns into two one-hot factor matrices
    (row of cell, lane of cell) whose product — one MXU matmul
    (TILE_ROWS×B)·(B×128) — adds the block's per-cell counts to an f32
    accumulator. bf16 one-hots and f32 accumulation are exact here (counts
    ≤ 2^21 « 2^24);
  - finally the tile applies the reference's saturation semantics
    ``min(old + min(count, 255), 255)`` (== min(total,255), see
    ops/histogram) and writes back in place (input/output aliased).

Cost: O(batch · 128) VPU compares + O(batch · TILE_ROWS · 128 / B) MXU MACs
+ one full sweep of the dense array per batch — no serial scatter anywhere.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128  # minimum/VPU-native lane count; planes may carry 2x/4x lanes
# MXU cost per update is ~2*TILE_CELLS MACs (the row one-hot spans the
# whole tile), so smaller tiles directly cut compute, traded against
# per-tile grid overhead. Measured on v5e at 16.7M codes over a 2^29-cell
# folded plane (double-buffered block DMA, 128-lane rows):
# 2048/1024/512/256/128 rows → 66/45/36/42/66 ms; block < 1024 fails to
# compile (dynamic VMEM slices must align to the (1024,) int32 tile);
# block 2048 is ~2 ms slower. The per-tile CELL count stays 2^16 across
# lane widths; wide-lane planes ([R/4, 512]) build the same one-hots over
# more lanes / fewer sublanes, which the VPU runs ~10%% faster (r3 probe:
# 3.16 vs 2.86 ns/update at 512x128 vs 128x512).
DEFAULT_TILE_CELLS = 1 << 16
DEFAULT_TILE_ROWS = 512  # legacy alias: rows at 128 lanes
DEFAULT_BLOCK = 1024
# Largest sub-plane the int32-indexed sweep kernel addresses. Count spaces
# beyond it (K >= 17: 2^33 folded cells) are carried as a tuple of
# MAX_SWEEP_CELLS-sized planes and swept one sub-plane at a time with the
# codes localised (see localize_sorted / accumulate_sorted_planes).
MAX_SWEEP_CELLS = 1 << 30


def _kernel(offs_ref, codes_ref, dense_in_ref, dense_out_ref,
            acc_ref, codes_buf, sems, *, tile_rows: int, block: int,
            lanes: int = LANES, int8_mxu: bool = False):
    t = pl.program_id(0)
    start = offs_ref[t]
    end = offs_ref[t + 1]
    lane_bits = int(lanes).bit_length() - 1

    # Mosaic requires dynamic VMEM slices aligned to the (1024,) int32
    # tiling, so update blocks are `block`-aligned windows around the tile's
    # slice; codes outside [tile_base, tile_base + tile_cells) vanish in the
    # one-hot compare (their row index falls outside [0, tile_rows)), so the
    # overhang needs no masking.
    a_start = start & jnp.int32(~(block - 1))
    n_blocks = pl.cdiv(end - a_start, jnp.int32(block))
    tile_base = t * (tile_rows * lanes)
    fdt = jnp.int8 if int8_mxu else jnp.bfloat16
    adt = jnp.int32 if int8_mxu else jnp.float32

    def dma(i, slot):
        slot = jnp.asarray(slot, jnp.int32)
        offs = pl.multiple_of(a_start + i * block, block)
        # the scratch is flat [2 * block] so both slot windows are
        # block-aligned (Mosaic requires (1024,)-tile-aligned dynamic VMEM
        # slices; a [2, block] scratch's dynamic sublane slice is rejected)
        # explicit int32: under jax_enable_x64 the product otherwise traces
        # as i64, which Mosaic's memref_slice rejects
        dst = pl.multiple_of(
            (slot * jnp.int32(block)).astype(jnp.int32), block
        )
        return pltpu.make_async_copy(
            codes_ref.at[pl.ds(offs, block)],
            codes_buf.at[pl.ds(dst, block)],
            sems.at[slot],
        )

    def load_codes(slot):
        return codes_buf[
            pl.ds(
                pl.multiple_of(
                    (slot * jnp.int32(block)).astype(jnp.int32), block
                ),
                block,
            )
        ]

    def one_hots(c):
        """(row one-hot^T [TR, B], col one-hot [B, 128]) of a code block.

        The row one-hot is built already transposed so the matmul contracts
        over the last/first dims MXU-natively — contracting dim 0 of a
        [B, TR] operand costs a VMEM relayout per block. (Measured dead
        ends, r3: int16/int8-operand compares fail to lower on the real
        backend; staging the one-hots through scratch to overlap VPU build
        with the MXU matmul cost 44.6 vs 31.4 ms — scratch traffic beats
        any overlap the scheduler finds. docs/ROUND_NOTES.md.)"""
        local = c - tile_base
        row = local >> lane_bits
        col = local & (lanes - 1)
        oh_row_t = (
            row[None, :]
            == jax.lax.broadcasted_iota(jnp.int32, (tile_rows, block), 0)
        ).astype(fdt)
        oh_col = (
            col[:, None]
            == jax.lax.broadcasted_iota(jnp.int32, (block, lanes), 1)
        ).astype(fdt)
        return oh_row_t, oh_col

    def body_serial(i, _):
        slot = jax.lax.rem(i, jnp.int32(2))
        # double-buffered block stream: block i+1's HBM->VMEM DMA is in
        # flight while block i feeds the MXU (the serial start();wait() it
        # replaces cost ~2 us x ~20k blocks per 16M-code sweep)
        @pl.when(i + 1 < n_blocks)
        def _():
            dma(i + 1, 1 - slot).start()

        dma(i, slot).wait()
        oh_row_t, oh_col = one_hots(load_codes(slot))
        acc_ref[...] += jax.lax.dot_general(
            oh_row_t, oh_col,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=adt,
        )
        return 0

    @pl.when(end > start)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        dma(0, 0).start()
        jax.lax.fori_loop(0, n_blocks, body_serial, 0)
        counts = jnp.minimum(acc_ref[...], 255).astype(jnp.int32) \
            if int8_mxu else jnp.minimum(acc_ref[...], 255.0).astype(jnp.int32)
        old = dense_in_ref[...].astype(jnp.int32)
        new = jnp.minimum(old + counts, 255)
        dense_out_ref[...] = new.astype(jnp.uint8)

    @pl.when(end <= start)
    def _():
        # untouched tile: the pipeline still writes the out block back, so
        # it must hold the original data
        dense_out_ref[...] = dense_in_ref[...]


def dense_plane_shape(cells: int):
    """Preferred on-device layout of a dense (sub-)plane of ``cells``.

    128 lanes: a standalone one-hot probe suggested wide-lane tiles
    (128 rows x 512 lanes) would be ~10% faster, but the FULL kernel
    measured 35.1 vs 31.9 ms at K=15 on v5e — the DMA/accumulator
    machinery eats the VPU layout win, so 128 stays the default. The
    sweep itself accepts any power-of-two lane multiple of 128 (tested
    through the readback chase at 512), so revisiting costs one line."""
    if cells % 128 == 0:
        return (cells // 128, 128)
    return (cells,)


def accumulate_sorted_pallas(
    dense2d: jax.Array,
    sorted_codes: jax.Array,
    tile_rows: Optional[int] = None,
    block: int = DEFAULT_BLOCK,
    interpret: bool = False,
    int8_mxu: bool = False,
) -> jax.Array:
    """Apply sorted int32 codes to dense2d [R, lanes] uint8.

    ``lanes`` is any power-of-two multiple of 128 (cell c lives at
    ``[c // lanes, c %% lanes]`` — a [R, 128] plane and its [R/4, 512]
    reshape are the same row-major bytes, so callers pick the lane width;
    wider lanes build the same one-hots over more lanes / fewer sublanes,
    ~10%% faster on the VPU). ``tile_rows`` defaults to
    DEFAULT_TILE_CELLS / lanes; R %% tile_rows must be 0. Codes >=
    R*lanes (sentinels/out-of-range) are ignored. Returns the updated
    dense2d; safe to donate.

    ``int8_mxu`` builds the one-hot factors as int8 with an int32
    accumulator — v5e's MXU runs int8 at 2x the bf16 MAC rate (394 vs 197
    T/s), exact for the same reason bf16/f32 is (per-block counts <= block).
    """
    r, lanes = dense2d.shape
    assert lanes % LANES == 0 and lanes & (lanes - 1) == 0, lanes
    if tile_rows is None:
        tile_rows = max(DEFAULT_TILE_CELLS // lanes, 8)
    tile_rows = min(tile_rows, r)
    assert r % tile_rows == 0
    # all index math (codes, searchsorted bounds, DMA offsets) is int32
    if r * lanes > np.iinfo(np.int32).max:
        raise ValueError(
            f"pallas sweep indexes the plane in int32; {r * lanes} cells "
            "exceed int32 range (K>=17 folded) — use the XLA histogram path"
        )
    # the alignment mask `start & ~(block-1)` and pl.multiple_of claims
    # require a power-of-two block; on real hardware Mosaic additionally
    # rejects dynamic VMEM slices below the (1024,) int32 tile (interpret
    # mode has no such constraint — tests use tiny blocks there)
    if block & (block - 1) or (not interpret and block < 1024):
        raise ValueError(
            f"block must be a power of two (>= 1024 on hardware), got {block}"
        )
    n_tiles = r // tile_rows
    m = sorted_codes.shape[0]

    bounds = (
        jnp.arange(n_tiles + 1, dtype=sorted_codes.dtype) * (tile_rows * lanes)
    )
    offsets = jnp.searchsorted(sorted_codes, bounds).astype(jnp.int32)
    # pad so the last block's DMA never reads out of bounds
    codes_pad = jnp.concatenate(
        [sorted_codes.astype(jnp.int32),
         jnp.full((block,), np.int32(2**31 - 1), jnp.int32)]
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # codes stay in HBM
            pl.BlockSpec(
                # t*0 keeps the index int32 under jax_enable_x64 (a python 0
                # would trace as int64, which Mosaic cannot legalize)
                (tile_rows, lanes), lambda t, offs: (t, t * 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (tile_rows, lanes), lambda t, offs: (t, t * 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((tile_rows, lanes),
                       jnp.int32 if int8_mxu else jnp.float32),
            pltpu.VMEM((2 * block,), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(_kernel, tile_rows=tile_rows, block=block,
                               lanes=lanes, int8_mxu=int8_mxu)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((r, lanes), jnp.uint8),
        input_output_aliases={2: 0},
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * m * tile_rows * lanes // max(block, 1),
            bytes_accessed=2 * r * lanes + 4 * m,
            transcendentals=0,
        ),
    )(offsets, codes_pad, dense2d)


def localize_sorted(sorted_codes: jax.Array, lo: int, hi: int) -> jax.Array:
    """Map globally sorted codes to a monotone int32 stream local to [lo, hi).

    Codes below ``lo`` become -1, codes at or above ``hi`` become int32 max
    (the sweep's natural sentinel), in-range codes become ``code - lo``.
    All three bands preserve the input's sorted order, so the int32 sweep
    kernel can consume a <= 2^30-cell sub-plane of a count space that itself
    exceeds int32 indexing (K >= 17 folded planes, SURVEY.md §7 hard part d).
    Out-of-band casts may wrap, but every wrapped value is overwritten by the
    corresponding ``where`` arm.
    """
    assert hi - lo <= np.iinfo(np.int32).max
    local = (sorted_codes - lo).astype(jnp.int32)
    local = jnp.where(sorted_codes < lo, jnp.int32(-1), local)
    return jnp.where(
        sorted_codes >= hi, jnp.int32(np.iinfo(np.int32).max), local
    )


def accumulate_sorted_planes(
    planes,
    sorted_codes: jax.Array,
    tile_rows: int = DEFAULT_TILE_ROWS,
    block: int = DEFAULT_BLOCK,
    interpret: bool = False,
    int8_mxu: bool = False,
):
    """Apply sorted codes to a folded plane carried as a tuple of [R_q, 128]
    uint8 sub-planes covering contiguous code ranges (see MAX_SWEEP_CELLS).

    ``sorted_codes`` may be int64 (K >= 17) — each sub-plane sweep sees an
    int32 localisation of the stream. Codes past the last plane (sentinels)
    are ignored. Returns the updated tuple; safe to donate.
    """
    out = []
    base = 0
    for p in planes:
        cells = p.shape[0] * p.shape[1]
        local = localize_sorted(sorted_codes, base, base + cells)
        out.append(
            accumulate_sorted_pallas(
                p, local, tile_rows=min(tile_rows, p.shape[0]),
                block=block, interpret=interpret, int8_mxu=int8_mxu,
            )
        )
        base += cells
    return tuple(out)


def saturating_accumulate_tiled(
    dense: jax.Array,
    codes: jax.Array,
    sentinel: int,
    tile_rows: int = DEFAULT_TILE_ROWS,
    block: int = DEFAULT_BLOCK,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Drop-in replacement for ops.histogram.saturating_accumulate using the
    Pallas sweep (dense [D] uint8, D % (tile_rows*128) == 0)."""
    d = dense.shape[0]
    if max(d, sentinel) > np.iinfo(np.int32).max:
        # codes are cast to int32 below: a >=2^31 sentinel would wrap
        # negative, sort FIRST, and be silently counted into tile 0
        raise ValueError(
            f"pallas sweep is int32-indexed (plane {d}, sentinel {sentinel})"
            " — K>=17 folded planes must use the XLA histogram path"
        )
    tile_rows = min(tile_rows, max(d // LANES, 1))
    from .histogram import sort_codes_fast

    sorted_codes = sort_codes_fast(codes.astype(jnp.int32))
    num_valid = (codes < sentinel).sum(dtype=jnp.int64)
    dense2d = dense.reshape(d // LANES, LANES)
    out = accumulate_sorted_pallas(
        dense2d, sorted_codes, tile_rows=tile_rows, block=block,
        interpret=interpret,
    )
    return out.reshape(d), num_valid
