from .indexer import create_fasta_index
from .reader import read_fasta_index
