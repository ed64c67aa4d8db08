"""Device ops (single-chip building blocks).

x64 is enabled at import: this engine does exact integer arithmetic (canonical
k-mer codes need 2K bits — K=17 exceeds int32) and all dtypes are explicit.
"""

import os

import jax

jax.config.update("jax_enable_x64", True)

# XLA compile times for large-batch programs run to minutes on TPU; a
# persistent cache makes them once-ever per (shape, K) instead of per process.
_cache_dir = os.environ.get(
    "PYKMER_TPU_COMPILE_CACHE",
    os.path.expanduser("~/.cache/pykmer_tpu_xla"),
)
if _cache_dir and _cache_dir != "0":
    try:
        os.makedirs(_cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

from .encode import code_dtype, canonical_codes, make_canonical_codes_fn, SENTINEL_FACTORY  # noqa: E402
from .histogram import saturating_accumulate, make_accumulate_fn, counts256_from_dense  # noqa: E402
