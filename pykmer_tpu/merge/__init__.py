from .merger import merge, pair_counts_stream
