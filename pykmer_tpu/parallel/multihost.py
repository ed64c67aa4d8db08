"""Multi-host orchestration (jax.distributed glue).

Replaces the reference's "filesystem as interconnect" model (SURVEY §2.3):
hosts join one jax.distributed job; the global mesh puts the host boundary on
the 'data' axis so chip-to-chip code exchange stays on ICI and only input
spraying crosses DCN. Each host feeds its own slice of the input stream
(every host reads its local FASTA portion), and the saturating-histogram
semantics make the cross-host merge exact:

    min(sum_h min(c_h, 255), 255) == min(sum_h c_h, 255)

so per-host partial dense shards combine with a saturating u16 add at
finalize (`combine_partial_dense`) — bit-identical to a single-host run
regardless of how the stream was split (proved in tests/test_parallel.py and
tests/test_multihost.py).

Checkpoint/resume: `save_shard_checkpoint` / `load_shard_checkpoint` persist
the dense shards + stream cursor so a killed K=17 multi-host build resumes
from the last flush instead of restarting (the reference can only restart
whole files, SURVEY §5).
"""

from __future__ import annotations

import json
import os
from typing import List, Optional, Tuple

import numpy as np


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Join the jax.distributed job (no-op for single-process runs).

    Arguments default to the standard JAX env vars; call before any backend
    use on every host.
    """
    import jax

    if num_processes in (None, 1) and coordinator_address is None:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def host_slice(total: int, process_id: int, num_processes: int) -> Tuple[int, int]:
    """Contiguous [start, end) slice of ``total`` work items for this host."""
    per = (total + num_processes - 1) // num_processes
    start = min(process_id * per, total)
    return start, min(start + per, total)


def combine_partial_dense(parts: List[np.ndarray]) -> np.ndarray:
    """Saturating elementwise merge of per-host partial dense arrays.

    Exact because saturating adds of clipped partial counts compose to
    min(total, 255) (see module docstring); u16 intermediate is safe for up
    to 257 partials.
    """
    assert len(parts) <= 257
    acc = np.zeros_like(parts[0], dtype=np.uint16)
    for p in parts:
        assert p.dtype == np.uint8
        acc += p
    return np.minimum(acc, 255).astype(np.uint8)


# ---- shard checkpoints ------------------------------------------------------

def checkpoint_dir(index_tmp_file: str) -> str:
    return index_tmp_file + ".ckpt"


def save_shard_checkpoint(
    index_tmp_file: str,
    dense_shards: np.ndarray,
    next_step: int,
    num_kmers: int,
    meta: Optional[dict] = None,
) -> None:
    """Atomically persist sharded progress (tmp + rename per file)."""
    d = checkpoint_dir(index_tmp_file)
    os.makedirs(d, exist_ok=True)
    data_path = os.path.join(d, "dense.npy")
    with open(data_path + ".tmp", "wb") as fh:
        np.save(fh, dense_shards, allow_pickle=False)
    os.rename(data_path + ".tmp", data_path)
    state = {"next_step": next_step, "num_kmers": num_kmers}
    state.update(meta or {})
    state_path = os.path.join(d, "state.json")
    with open(state_path + ".tmp", "wt") as fh:
        json.dump(state, fh, indent=1, sort_keys=True)
    os.rename(state_path + ".tmp", state_path)


def load_shard_checkpoint(
    index_tmp_file: str,
) -> Optional[Tuple[np.ndarray, dict]]:
    d = checkpoint_dir(index_tmp_file)
    data_path = os.path.join(d, "dense.npy")
    state_path = os.path.join(d, "state.json")
    if not (os.path.exists(data_path) and os.path.exists(state_path)):
        return None
    with open(state_path) as fh:
        state = json.load(fh)
    dense = np.load(data_path)
    return dense, state


def clear_shard_checkpoint(index_tmp_file: str) -> None:
    import shutil

    d = checkpoint_dir(index_tmp_file)
    if os.path.exists(d):
        shutil.rmtree(d)
