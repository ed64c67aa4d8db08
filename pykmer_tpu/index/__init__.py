from .._jax_setup import ensure_x64

ensure_x64()

from .batch import index_batch
from .indexer import create_fasta_index
from .multihost import create_fasta_index_multihost
from .sharded import create_fasta_index_sharded
from .reader import read_fasta_index
