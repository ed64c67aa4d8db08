"""Typed configuration for the whole engine.

The reference scatters its knobs over module constants and argv
(reference tools.py:99-106, indexer.py:480-491, merger.py:51-59); here they are
one typed config. Defaults are value-identical so recorded metadata
(``flush_every``, ``frag_size``) and CLI behaviour match the reference.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

DEFAULT_FLUSH_EVERY = 100_000_000
DEFAULT_MIN_FRAG_SIZE = 500_000_000
DEFAULT_MAX_FRAG_SIZE = 1_000_000_000
DEFAULT_MIN_COUNT = 1
DEFAULT_MAX_COUNT = 255
DEFAULT_BLOCK_SIZE = 100_000_000
DEFAULT_THREADS = 4
MAX_VAL = 255  # uint8 saturation ceiling (reference tools.py:217)


@dataclasses.dataclass(frozen=True)
class IndexConfig:
    """Configuration of one indexing run (FASTA → .kin)."""

    kmer_len: int
    # host→device streaming: number of window starts per device chunk.
    # ``None`` resolves per backend at run start (resolve_chunk_windows):
    # 16M windows on TPU — fewer dispatch/upload round-trips dominate there
    # (measured 9.1 s → 5.1 s ingest at 840 Mbp vs 4M windows) — and 4M
    # elsewhere (XLA CPU compile time scales with batch size).
    chunk_windows: Optional[int] = None
    # kmer codes buffered on device before a dense-array accumulate
    flush_every: int = DEFAULT_FLUSH_EVERY
    min_frag_size: int = DEFAULT_MIN_FRAG_SIZE
    max_frag_size: int = DEFAULT_MAX_FRAG_SIZE
    # device strategy: "auto" | "device" (HBM-resident dense array) | "host"
    # (host-RAM dense array for count spaces exceeding HBM, e.g. K=17 1-chip)
    accumulate: str = "auto"
    # accumulate kernel: "auto" picks the Pallas tile-sweep on TPU for large
    # count spaces (XLA scatter lowers to a serial loop there) and the XLA
    # sort+scan path elsewhere
    kernel: str = "auto"
    # final device→host fetch: "auto" uses 4-bit packed readback for large
    # arrays over slow host links; "raw"/"packed" force a path
    readback: str = "auto"

    def __post_init__(self) -> None:
        if self.kmer_len <= 0 or self.kmer_len % 2 == 0:
            raise ValueError(
                f"kmer_len must be a positive odd integer, got {self.kmer_len}"
            )
        if self.chunk_windows is not None and self.chunk_windows % 8:
            raise ValueError(
                f"chunk_windows must be a multiple of 8 (bit-packed upload "
                f"alignment), got {self.chunk_windows}"
            )


def resolve_chunk_windows(
    config: "IndexConfig", input_hint_bytes: Optional[int] = None
) -> "IndexConfig":
    """Replace a ``chunk_windows=None`` placeholder with the backend default
    (called once at each indexing entry point, before any framing).

    ``input_hint_bytes`` (raw input file size, when known) clamps the
    default DOWN to the next power of two covering the input: a tiny
    fixture otherwise pads to the full 16M-window TPU chunk — >99.9%
    sentinels sorted and swept per chunk, plus a fresh device-program
    compile at a shape the input never needed. Explicit user values are
    honoured as-is; power-of-two clamping keeps the compile-cache key set
    small (one per octave, floor 2^16)."""
    if config.chunk_windows is not None:
        return config
    import jax

    cw = (1 << 24) if jax.default_backend() == "tpu" else (1 << 22)
    if jax.default_backend() == "tpu" and 4 ** config.kmer_len // 2 > (1 << 30):
        # multi-sub-plane count spaces (K >= 16): every chunk sweeps EVERY
        # sub-plane (a full-plane HBM pass + 16K-tile grid each), so bigger
        # chunks amortise it — measured K=17 dispatch 49 s -> 8.7 s at 2^26
        # windows (the +18% tail-padding sentinels are far cheaper than the
        # extra plane passes)
        cw = 1 << 26
    if input_hint_bytes is not None and input_hint_bytes > 0:
        # window count <= base count <= raw byte count
        need = 1 << 16
        while need < input_hint_bytes and need < cw:
            need <<= 1
        cw = min(cw, need)
    return dataclasses.replace(config, chunk_windows=cw)


@dataclasses.dataclass(frozen=True)
class MergeConfig:
    """Configuration of one merge run (N×.kin → .kma)."""

    min_count: int = DEFAULT_MIN_COUNT
    max_count: int = DEFAULT_MAX_COUNT
    block_size: int = DEFAULT_BLOCK_SIZE
    threads: int = DEFAULT_THREADS
    # device engine: bit-pack validity masks once per sample, AND+popcount pairs
    engine: str = "auto"  # "auto" | "device" | "stream"


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device-mesh shape for sharded runs.

    ``shards`` range-shards the 4^K count space (low-bit interleaved for load
    balance); ``data`` is the data-parallel axis (multi-host: one group per
    host, partial histograms merged with a saturating reduce at finalize).
    """

    shards: int = 1
    data: int = 1
