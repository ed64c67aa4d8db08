"""Device ops (single-chip building blocks).

x64 is enabled at import: this engine does exact integer arithmetic (canonical
k-mer codes need 2K bits — K=17 exceeds int32) and all dtypes are explicit.
"""

import jax

jax.config.update("jax_enable_x64", True)

from .encode import code_dtype, canonical_codes, make_canonical_codes_fn, SENTINEL_FACTORY  # noqa: E402
from .histogram import saturating_accumulate, make_accumulate_fn, counts256_from_dense  # noqa: E402
from .compare import pack_validity_mask, pair_counts_from_masks, popcount_mask  # noqa: E402
