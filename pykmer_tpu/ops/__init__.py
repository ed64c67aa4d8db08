"""Device ops (single-chip building blocks).

x64 is enabled at import (via the package's single configuration point,
``pykmer_tpu._jax_setup``): this engine does exact integer arithmetic
(canonical k-mer codes need 2K bits — K=17 exceeds int32) and all dtypes are
explicit.
"""

from .._jax_setup import ensure_x64

ensure_x64()

from .encode import code_dtype, canonical_codes, make_canonical_codes_fn, SENTINEL_FACTORY  # noqa: E402
from .histogram import saturating_accumulate, make_accumulate_fn, counts256_from_dense  # noqa: E402
