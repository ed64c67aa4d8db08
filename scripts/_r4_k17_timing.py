"""One stage-timed K=17 end-to-end run (round-4 measurement scratch)."""
import os
import sys
import time

os.environ.setdefault("PYKMER_TPU_STAGE_TIMING", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pykmer_tpu.config import IndexConfig
from pykmer_tpu.index import create_fasta_index

fasta = "bench_data/synthetic_840000000.fa"
t0 = time.time()
h = create_fasta_index(fasta, "bench", fasta, 17, overwrite=True,
                       config=IndexConfig(kmer_len=17, chunk_windows=int(os.environ.get("CW", 0)) or None), verify=False,
                       verbose=True)
dt = time.time() - t0
bp = sum(c[1] for c in h.chromosomes)
print(f"TOTAL elapsed={dt:.2f}s bp/s={bp/dt:,.0f} vs_base={bp/dt/128452:.1f}x")
