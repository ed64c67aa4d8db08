"""Device→host link keepalive.

Host↔device links behind proxies/tunnels (and some NIC power states) drop to
a cold state after sub-minute idle periods: the next transfer then pays a
multi-second ramp (measured here: 5-15x slower first fetch after 60 s of
d2h-idle compute). Indexing is exactly that pattern — a long h2d/compute
phase followed by one large readback — so a daemon thread fetches a tiny
device scalar a few times per second for the duration of the pipeline,
keeping the d2h path warm. Cost: ~5 transfers/s of a few bytes, invisible on
any hardware; benefit on tunneled links: the final 4^K-plane fetch starts at
full bandwidth.

No reference analog (the reference is host-only); this is TPU-runtime glue.
"""

from __future__ import annotations

import contextlib
import os
import threading
import time
from typing import Iterator

_INTERVAL_S = 0.2

# suspension: bulk readbacks pause the pulse (a tiny round trip queued among
# large pipelined slice transfers stalls them — the cure must not outcost
# the disease). Nesting-counted so overlapping fetches compose.
_suspend_lock = threading.Lock()
_suspend_depth = 0


@contextlib.contextmanager
def keepalive_suspended() -> Iterator[None]:
    """Pause the keepalive pulse while a bulk d2h transfer runs."""
    global _suspend_depth
    with _suspend_lock:
        _suspend_depth += 1
    try:
        yield
    finally:
        with _suspend_lock:
            _suspend_depth -= 1


def _suspended() -> bool:
    return _suspend_depth > 0


@contextlib.contextmanager
def d2h_keepalive(interval_s: float = _INTERVAL_S) -> Iterator[None]:
    """Keep the device→host path warm while the body runs.

    No-op when JAX is unavailable, on the CPU backend (no link to warm), or
    when PYKMER_TPU_NO_KEEPALIVE is set.
    """
    tick = None
    if not os.environ.get("PYKMER_TPU_NO_KEEPALIVE"):
        # setup is fully separated from the yield: an exception thrown into
        # the body must never be swallowed by this except clause
        try:
            import jax
            import jax.numpy as jnp

            if jax.default_backend() != "cpu":
                tick = jnp.zeros((8,), jnp.uint8)
                tick.block_until_ready()
        except Exception:
            tick = None
    if tick is None:
        yield
        return

    import numpy as np

    stop = threading.Event()

    def pulse() -> None:
        while not stop.is_set():
            if not _suspended():
                try:
                    np.asarray(tick + 1)
                except Exception:
                    return
            stop.wait(interval_s)

    thread = threading.Thread(target=pulse, daemon=True, name="d2h-keepalive")
    thread.start()
    try:
        yield
    finally:
        stop.set()
        thread.join(timeout=2.0)
