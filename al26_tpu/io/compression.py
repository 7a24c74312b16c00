"""zstd compression wrappers (al26_nbody.py:320-345): level 8, all threads."""
from __future__ import annotations

import zstandard as zstd


def compress(data: bytes, level: int = 8, threads: int = -1) -> bytes:
    c = zstd.ZstdCompressor(threads=threads, level=level)
    return c.compress(data)


def decompress(data: bytes) -> bytes:
    return zstd.ZstdDecompressor().decompress(data)
