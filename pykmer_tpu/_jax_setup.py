"""Single-point JAX process configuration.

The engine does exact integer arithmetic — canonical k-mer codes need 2K bits
(K=17 exceeds int32), per-sample merge totals exceed int32 at K>=16 — so
64-bit dtypes must be available before ANY program traces. ``jax_enable_x64``
is process-global, and flipping it after other code has traced programs
invalidates jit caches and makes import order semantically significant; this
module is therefore the ONLY place the flag is written. Every jax-using
subpackage calls :func:`ensure_x64` at import (idempotent, one-shot), and
code that merely depends on the flag being set calls :func:`assert_x64`.

Also installs the persistent XLA compilation cache: compile times for
large-batch TPU programs run to minutes, a persistent cache makes them
once-ever per (shape, K) instead of per process.
"""

from __future__ import annotations

import os

_configured = False


def ensure_x64() -> None:
    """Enable 64-bit dtypes + the persistent compile cache (idempotent)."""
    global _configured
    if _configured:
        return
    import jax

    jax.config.update("jax_enable_x64", True)

    cache_dir = os.environ.get(
        "PYKMER_TPU_COMPILE_CACHE",
        os.path.expanduser("~/.cache/pykmer_tpu_xla"),
    )
    if cache_dir and cache_dir != "0":
        try:
            os.makedirs(cache_dir, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        except Exception:
            pass
    _configured = True


def assert_x64() -> None:
    """Fail fast where 64-bit programs are about to trace with x64 off."""
    import jax

    if not jax.config.jax_enable_x64:
        raise RuntimeError(
            "pykmer_tpu requires jax_enable_x64: import a pykmer_tpu compute "
            "module (which sets it once) before tracing, and do not disable "
            "it mid-process"
        )
