"""Worker entry for the 2-process jax.distributed CPU tests.

Usage: python multihost_worker.py <pid> <nproc> <port> <fasta> <K>
           [chunk_windows] [checkpoint_every] [abort_after_saves]
           [fail_decode_pid]
Each process joins the job, runs create_fasta_index_multihost, and process 0
writes the `.kin` + `.kin.json`. Must configure the CPU platform BEFORE any
backend use (same recipe as tests/conftest.py).

``abort_after_saves`` > 0 simulates a crash: the process exits hard (code 3)
right after its Nth per-host checkpoint lands — a rerun must resume from it.
``fail_decode_pid`` >= 0 injects a decode failure on that host's byte slice:
every host must then surface the same uniform error (exit code 7) instead of
the failing host stranding the others at the post-read barrier.
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
)

import jax

jax.config.update("jax_platforms", "cpu")

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
fasta, kmer_len = sys.argv[4], int(sys.argv[5])
chunk_windows = int(sys.argv[6]) if len(sys.argv) > 6 else (1 << 10)
checkpoint_every = int(sys.argv[7]) if len(sys.argv) > 7 else 0
abort_after_saves = int(sys.argv[8]) if len(sys.argv) > 8 else 0
fail_decode_pid = int(sys.argv[9]) if len(sys.argv) > 9 else -1

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pykmer_tpu.config import IndexConfig
from pykmer_tpu.index import create_fasta_index_multihost

if abort_after_saves:
    from pykmer_tpu.parallel import multihost as mh

    _orig_save = mh.save_shard_checkpoint
    _saves = {"n": 0}

    def _save_then_die(*args, **kwargs):
        _orig_save(*args, **kwargs)
        _saves["n"] += 1
        if _saves["n"] >= abort_after_saves:
            print(f"worker {pid}: simulated crash after checkpoint", flush=True)
            os._exit(3)

    mh.save_shard_checkpoint = _save_then_die

if fail_decode_pid == pid:
    # injected byte-slice decode failure (multihost.py imports the symbol
    # from index.indexer at call time, so module-level patching binds)
    from pykmer_tpu.index import indexer as _ix

    def _bad_decode(*args, **kwargs):
        raise ValueError("injected decode failure")

    _ix._decode_joined_bytes = _bad_decode

try:
    header = create_fasta_index_multihost(
        fasta,
        "mh",
        fasta,
        kmer_len,
        config=IndexConfig(kmer_len=kmer_len, chunk_windows=chunk_windows),
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nproc,
        process_id=pid,
        checkpoint_every=checkpoint_every or None,
        verbose=False,
    )
except Exception as exc:
    import traceback

    traceback.print_exc()  # keep the stack in the captured output
    print(f"worker {pid}: error {type(exc).__name__}: {exc}", flush=True)
    sys.exit(7)
print(f"worker {pid}: ok header={'yes' if header is not None else 'no'}",
      flush=True)
