from .batch import index_batch
from .indexer import create_fasta_index
from .sharded import create_fasta_index_sharded
from .reader import read_fasta_index
