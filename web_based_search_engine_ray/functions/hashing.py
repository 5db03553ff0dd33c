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
