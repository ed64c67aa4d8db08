from .fasta import (
    BASE_LUT,
    INVALID,
    FastaRecord,
    decode_fasta_bytes,
    read_fasta_codes,
    open_input_bytes,
)
