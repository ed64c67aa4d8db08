"""File checksumming (sha256, chunked) — reference tools.py:548-556 semantics."""

from __future__ import annotations

import hashlib


def sha256_file(path: str, chunk_size: int = 2**16) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as fh:
        while True:
            chunk = fh.read(chunk_size)
            if not chunk:
                break
            h.update(chunk)
    return h.hexdigest()
