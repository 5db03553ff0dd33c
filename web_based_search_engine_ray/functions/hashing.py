"""Stable (process-independent) hashing utilities.

Python's builtin ``hash`` is salted per process; everything here must be
deterministic across workers and across runs, so all hashes derive from
md5 (or small closed-form mixers seeded by md5).
"""

from __future__ import annotations

import hashlib

import numpy as np


def stable_hash63(s: str | bytes) -> int:
    """First 8 bytes of md5, masked to 63 bits (non-negative int64)."""
    b = s.encode("utf-8") if isinstance(s, str) else s
    return int.from_bytes(hashlib.md5(b).digest()[:8], "big") & 0x7FFF_FFFF_FFFF_FFFF


def term_bucket(term: str, num_buckets: int) -> int:
    """Deterministic term → segment-partition bucket."""
    return stable_hash63(term) % num_buckets


def stable_hash63_array(strings: "np.ndarray | list[str]") -> np.ndarray:
    """Vectorized-ish stable_hash63 over a sequence of strings."""
    return np.fromiter(
        (stable_hash63(s) for s in strings), dtype=np.int64, count=len(strings)
    )


_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)
_MASK63 = np.uint64(0x7FFF_FFFF_FFFF_FFFF)


def fnv1a63_array(col) -> np.ndarray:
    """Vectorized FNV-1a 64-bit (masked to 63 bits) over an Arrow string
    column, reading the UTF-8 data buffer zero-copy: one vectorized
    xor/multiply per byte POSITION (bounded by the longest string), not
    one hash call per row.  Used for transient partitioning keys (url
    buckets, Bloom probes) — persisted formats (term buckets, derived
    doc ids) keep the md5-based ``stable_hash63`` for compatibility."""
    import pyarrow as pa

    if isinstance(col, (list, np.ndarray)):
        col = pa.array(col, type=pa.string())
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    odt = np.int64 if pa.types.is_large_string(col.type) else np.int32
    bufs = col.buffers()
    offsets = np.frombuffer(bufs[1], dtype=odt)[
        col.offset:col.offset + n + 1
    ].astype(np.int64)
    data = (
        np.frombuffer(bufs[2], dtype=np.uint8)
        if bufs[2] is not None
        else np.empty(0, dtype=np.uint8)
    )
    starts = offsets[:-1]
    lens = offsets[1:] - starts
    h = np.full(n, _FNV_OFFSET, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(int(lens.max())):
            active = np.flatnonzero(lens > j)
            b = data[starts[active] + j].astype(np.uint64)
            h[active] = (h[active] ^ b) * _FNV_PRIME
    return (h & _MASK63).astype(np.int64)


def splitmix64_array(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer — derives a second independent
    hash stream from a first one (double-hashing Bloom probes)."""
    x = x.astype(np.uint64)
    with np.errstate(over="ignore"):
        x = x + np.uint64(0x9E3779B97F4A7C15)
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        x = x ^ (x >> np.uint64(31))
    return x
