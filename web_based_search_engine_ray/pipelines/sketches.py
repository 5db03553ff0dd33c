"""Sketch operators: approximate aggregates whose state is O(1) in the
input size — the only viable shape for corpus-wide distinct counts at
10^12 rows (an exact COUNT(DISTINCT) is an all-to-all shuffle of every
key; a sketch is one map pass plus a tiny register merge).

HyperLogLog (Flajolet et al. 2007, public algorithm) with the standard
bias corrections from the original paper.  Deterministic: the hash is
the repo's FNV-1a-63 (``functions/hashing.py``), so the estimate is a
pure function of the input SET — reproducible at any parallelism,
any partitioning, any row order (register merge is elementwise max,
which is commutative/associative/idempotent).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from web_based_search_engine_ray.functions.hashing import (
    fnv1a63_array,
    splitmix64_array,
)


def _hll_partial(col, p: int) -> np.ndarray:
    """Per-batch HLL registers (2^p uint8) for an Arrow string column."""
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    # FNV-1a's high bits avalanche poorly on short strings (measured:
    # 10× the expected register-index collisions on 2-3 char keys);
    # the splitmix64 finalizer restores bit uniformity deterministically
    h = splitmix64_array(fnv1a63_array(col)) & np.uint64(
        0x7FFF_FFFF_FFFF_FFFF
    )
    if len(h) == 0:
        return regs
    idx = (h >> np.uint64(63 - p)).astype(np.int64)  # top p of the 63 bits
    rest = (h << np.uint64(p + 1)) >> np.uint64(p + 1)  # low 63-p bits
    # rank = position of the leftmost 1-bit in the remaining 63-p bits,
    # counting from 1; all-zero rest -> max rank (63-p+1)
    w = 63 - p
    nz = rest != 0
    # bit_length via log2 is unsafe at 2^53; use a float-free loop over
    # the ~6 bit-halving steps (vectorized binary search for the MSB)
    msb = np.zeros(len(rest), dtype=np.int64)
    v = rest.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        big = v >= (np.uint64(1) << np.uint64(shift))
        msb[big] += shift
        v[big] >>= np.uint64(shift)
    rank = np.where(nz, w - msb, w + 1).astype(np.int64)
    np.maximum.at(regs, idx, rank.astype(np.uint8))
    return regs


def _hll_estimate(regs: np.ndarray) -> float:
    """Standard HLL estimator with small-range (linear counting) and
    the original large-range correction."""
    m = float(len(regs))
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    if est <= 2.5 * m:
        zeros = int(np.count_nonzero(regs == 0))
        if zeros:
            return m * np.log(m / zeros)
    two63 = float(1 << 63)
    if est > two63 / 30.0:
        return -two63 * np.log(1.0 - est / two63)
    return float(est)


def hll_distinct(ds, col: str, *, p: int = 14) -> dict:
    """Approximate distinct count of ``ds[col]`` (string column).

    One ``map_batches`` pass emits a 2^p-byte register row per block;
    the merge is an elementwise max over those tiny rows — no shuffle
    of the data, driver state = one register array (16 KB at p=14,
    relative error ~1.04/sqrt(2^p) ≈ 0.8%).  Returns
    ``{"estimate": float, "p": p, "registers_merged": n}``."""
    m = 1 << p

    def partial(batch: pa.Table) -> pa.Table:
        regs = _hll_partial(batch[col], p)
        return pa.table({"regs": pa.array([regs.tobytes()], type=pa.binary())})

    parts = ds.map_batches(partial, batch_format="pyarrow")
    merged = np.zeros(m, dtype=np.uint8)
    n = 0
    # per-block rows are m bytes each; iter_batches streams them to the
    # driver (the only driver-side state is the single merged array)
    for b in parts.iter_batches(batch_format="pyarrow"):
        for buf in b["regs"].to_pylist():
            np.maximum(merged, np.frombuffer(buf, dtype=np.uint8), out=merged)
            n += 1
    return {"estimate": _hll_estimate(merged), "p": p, "registers_merged": n}
