"""Multi-host indexing: FASTA → `.kin` across a `jax.distributed` job.

This is the replacement for the reference's "filesystem as interconnect"
model (reference merger.py:19-20: every stage is a separate hand-launched OS
process communicating through files). Here the hosts of one job cooperate on
ONE index build:

1. every process decodes the FASTA and takes a disjoint slice of the global
   window range (K−1 stream overlap keeps every window intact — the
   sequence-parallel analog of halo exchange at host granularity);
2. each process accumulates its slice into a full folded partial plane on
   its LOCAL devices (parallel/histogram: encode → all_to_all → saturating
   accumulate over the local mesh, so ICI carries the count-space exchange);
3. the per-host partial planes combine over the GLOBAL mesh with the exact
   saturating merge — ``min(sum_h min(c_h, 255), 255) == min(sum_h c_h, 255)``
   (uint16 psum across the 'host' axis + clip; exact for ≤ 257 hosts, see
   parallel/multihost.combine_partial_dense) — riding DCN once;
4. process 0 unfolds + writes + stamps metadata (same tail as the
   single-host pipeline), everyone barriers, done.

The result is byte-identical to a single-host run regardless of process
count or slice boundaries: integer saturating adds compose exactly and the
window partition is exact (tested by a subprocess-driven 2-process CPU job,
tests/test_multihost.py).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from ..config import IndexConfig
from ..formats import kin as kinfmt
from ..formats.header import KinHeader
from ..ops.encode import chunk_stream
from ..parallel.histogram import (
    interleaved_to_flat,
    make_sharded_accumulate,
    shard_batch_chunks_packed,
)
from ..parallel.mesh import make_mesh
from ..parallel.multihost import host_slice, initialize_distributed
from .indexer import _load_joined_stream, PRINT_EVERY


def _combine_partials_global(partial: np.ndarray, num_kmers: int):
    """Saturating merge of per-host partial folded planes over the global
    mesh; returns (combined full plane on this host, global num_kmers).

    uint16 cross-host psum + clip is exactly ``min(sum_h c_h, 255)`` for
    ≤ 257 hosts. The plane is sharded over local devices during the reduce
    (peak per device ≈ fold/ldc uint16 + fold uint8 for the replicated out).
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import multihost_utils
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    nproc = jax.process_count()
    if nproc == 1:
        return partial, num_kmers
    assert nproc <= 257, "uint16 saturating combine is exact for <= 257 hosts"
    ldc = jax.local_device_count()
    devs = np.array(jax.devices()).reshape(nproc, ldc)
    gmesh = Mesh(devs, ("host", "d"))
    fold_size = partial.shape[0]
    cols = "d" if fold_size % ldc == 0 else None
    garr = multihost_utils.host_local_array_to_global_array(
        partial.reshape(1, fold_size), gmesh, P("host", cols)
    )

    @jax.jit
    def combine(a):
        s = jnp.minimum(
            jnp.sum(a.astype(jnp.uint16), axis=0), 255
        ).astype(jnp.uint8)
        return jax.lax.with_sharding_constraint(s, NamedSharding(gmesh, P()))

    out = combine(garr)
    combined = np.asarray(out.addressable_data(0))
    per_host = multihost_utils.process_allgather(
        np.asarray([num_kmers], dtype=np.int64)
    )
    return combined, int(np.asarray(per_host).sum())


def create_fasta_index_multihost(
    project_name: str,
    sample_name: str,
    input_file: str,
    kmer_len: int,
    overwrite: bool = True,
    config: Optional[IndexConfig] = None,
    n_shards_local: Optional[int] = None,
    n_data_local: int = 1,
    capacity_factor: float = 2.0,
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    verify: bool = True,
    verbose: bool = True,
) -> Optional[KinHeader]:
    """Build one `.kin` cooperatively across all processes of a
    jax.distributed job. Every process must call this with identical
    arguments (standard SPMD contract). Returns the header on process 0,
    ``None`` elsewhere.

    ``coordinator_address``/``num_processes``/``process_id`` initialize the
    job if it isn't already (no-op when single-process or already joined).
    """
    import jax

    initialize_distributed(coordinator_address, num_processes, process_id)
    pid = jax.process_index()
    nproc = jax.process_count()
    is_main = pid == 0

    config = config or IndexConfig(kmer_len=kmer_len)
    if config.chunk_windows is None:
        import dataclasses as _dc

        config = _dc.replace(config, chunk_windows=1 << 22)

    header = KinHeader(
        project_name,
        input_file=input_file,
        kmer_len=kmer_len,
        flush_every=config.flush_every,
        min_frag_size=config.min_frag_size,
        max_frag_size=config.max_frag_size,
    )
    data_size = header.data_size
    fold_size = data_size // 2
    tmp = header.index_tmp_file
    timer = header.timer

    if is_main:
        kinfmt.remove_outputs(input_file, kmer_len, overwrite)
        if verbose:
            print(
                f"multihost index: {nproc} processes x "
                f"{jax.local_device_count()} local devices, K={kmer_len}"
            )

    # --- 1. decode + window slice -----------------------------------------
    # every host decodes the input (the native decode runs at GB/s and
    # overlaps across hosts; only the accumulate is the scaling-relevant
    # phase) and takes a disjoint window range with K−1 stream overlap
    raw: dict = {}
    stream, chromosomes, total_bp = _load_joined_stream(
        input_file, kmer_len, raw_out=raw if is_main else None,
        tail_headroom=config.chunk_windows + kmer_len,
    )
    n_windows = max(int(stream.shape[0]) - kmer_len + 1, 0)
    if n_windows <= 0:
        raise ValueError(f"{input_file}: no valid k-mers at K={kmer_len}")
    w0, w1 = host_slice(n_windows, pid, nproc)
    if w1 > w0:
        if nproc > 1:
            # copy the slice into a pooled block and release the full
            # stream: a bare view would pin the whole ~genome-size decode
            # on EVERY host through the accumulate (and chunk_stream's
            # in-place framing needs a big_empty-backed base anyway —
            # an offset view would force an unpooled concatenate copy)
            from ..utils.bigmem import big_empty

            span = (w1 - w0) + kmer_len - 1
            local_stream = big_empty(span)
            np.copyto(local_stream, stream[w0 : w0 + span])
        else:
            local_stream = stream[w0 : w1 + kmer_len - 1]
    else:
        local_stream = None
    del stream

    # input checksum on process 0, overlapping the accumulate
    import threading

    input_ck: dict = {}
    ck_thread = None
    if is_main:

        def _hash_input() -> None:
            import hashlib

            from ..utils.checksum import sha256_file

            if "bytes" in raw:
                input_ck["hex"] = hashlib.sha256(raw["bytes"]).hexdigest()
                del raw["bytes"]
            else:
                input_ck["hex"] = sha256_file(header.input_file_path)

        ck_thread = threading.Thread(target=_hash_input, daemon=True)
        ck_thread.start()

    # --- 2. local accumulate over this host's devices ----------------------
    local_mesh = make_mesh(
        n_shards=n_shards_local, n_data=n_data_local,
        devices=jax.local_devices(),
    )
    init_fn, step_fn = make_sharded_accumulate(
        local_mesh, kmer_len, config.chunk_windows,
        capacity_factor=capacity_factor,
    )
    state = init_fn()
    if local_stream is not None and local_stream.shape[0] >= kmer_len:
        padded, n_chunks = chunk_stream(
            local_stream, kmer_len, config.chunk_windows
        )
        rows = step_fn.rows
        n_steps = (n_chunks + rows - 1) // rows
        for s in range(n_steps):
            chunks = shard_batch_chunks_packed(
                padded, kmer_len, config.chunk_windows, rows, s
            )
            state = step_fn(state, chunks)
            if verbose and is_main and n_steps > 1:
                print(f"  dispatched step {s + 1}/{n_steps}")
        del padded
    dense, nk_dev, maxb_dev = state
    local_kmers = int(nk_dev)
    if int(maxb_dev) > step_fn.capacity:
        raise RuntimeError(
            f"shard bucket overflow ({int(maxb_dev)} > {step_fn.capacity}): "
            f"re-run with a larger capacity_factor (got {capacity_factor}) "
            f"or smaller chunk_windows"
        )
    partial = interleaved_to_flat(np.asarray(dense))
    del dense, state
    assert partial.shape == (fold_size,) and partial.dtype == np.uint8

    # --- 3. global saturating combine (DCN) ---------------------------------
    combined, num_kmers = _combine_partials_global(partial, local_kmers)
    del partial
    if num_kmers == 0:
        raise ValueError(f"{input_file}: no valid k-mers at K={kmer_len}")

    # --- 4. process 0 writes; everyone barriers -----------------------------
    from jax.experimental import multihost_utils

    if is_main:
        if total_bp >= PRINT_EVERY:
            timer.update(total_bp)
        from ..formats.header import fast_counts256
        from ..io.direct import DirectWriter
        from ..ops.readback import _write_and_hash, unfold_canonical
        from ..utils.bigmem import big_empty

        counts = fast_counts256(combined).copy()
        counts[0] += fold_size
        out = big_empty(data_size)
        unfold_canonical(combined, kmer_len, out=out)
        del combined
        with DirectWriter(tmp, size=data_size) as fd:
            output_ck = _write_and_hash(fd, out)
        del out
        header.num_kmers = num_kmers
        header.chromosomes = chromosomes
        if ck_thread is not None:
            ck_thread.join()
        header.write_metadata(
            tmp,
            stats_counts256=counts,
            input_checksum=input_ck.get("hex"),
            output_checksum=output_ck,
        )
        if verify:
            fresh = KinHeader(
                project_name, input_file=input_file, kmer_len=kmer_len
            )
            fresh.update_stats_from_file(tmp)
            if fresh.hist != header.hist or fresh.vals_sum != header.vals_sum:
                raise AssertionError(
                    "written .kin does not match computed stats"
                )
        os.rename(tmp, header.index_file_root)
        if verbose:
            print("done")
    else:
        del combined
    multihost_utils.sync_global_devices("pykmer_tpu.index.multihost.done")
    return header if is_main else None
