"""Worker entry for the 2-process jax.distributed CPU test.

Usage: python multihost_worker.py <pid> <nproc> <port> <fasta> <K>
Each process joins the job, runs create_fasta_index_multihost, and process 0
writes the `.kin` + `.kin.json`. Must configure the CPU platform BEFORE any
backend use (same recipe as tests/conftest.py).
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

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pykmer_tpu.config import IndexConfig
from pykmer_tpu.index import create_fasta_index_multihost

header = create_fasta_index_multihost(
    fasta,
    "mh",
    fasta,
    kmer_len,
    config=IndexConfig(kmer_len=kmer_len, chunk_windows=chunk_windows),
    coordinator_address=f"127.0.0.1:{port}",
    num_processes=nproc,
    process_id=pid,
    verbose=False,
)
print(f"worker {pid}: ok header={'yes' if header is not None else 'no'}",
      flush=True)
