"""HyperLogLog distinct-count sketch."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from web_based_search_engine_ray.pipelines.sketches import (
    _hll_estimate,
    _hll_partial,
    hll_distinct,
)


def _ds(strings, blocks=8):
    t = pa.table({"s": pa.array(strings, type=pa.string())})
    return rd.from_arrow(t).repartition(blocks)


def test_accuracy_large():
    n = 200_000
    vals = [f"key-{i * 2654435761 % (1 << 40):x}" for i in range(n)]
    r = hll_distinct(_ds(vals, blocks=16), "s", p=14)
    assert abs(r["estimate"] / n - 1.0) < 0.02
    assert r["registers_merged"] >= 1


def test_duplicates_do_not_move_estimate():
    vals = [f"v{i}" for i in range(5000)]
    a = hll_distinct(_ds(vals), "s")
    b = hll_distinct(_ds(vals * 7, blocks=13), "s")
    assert a["estimate"] == b["estimate"]  # set function, exact equality


def test_partition_invariance():
    vals = [f"x{i}" for i in range(20_000)]
    a = hll_distinct(_ds(vals, blocks=2), "s")
    b = hll_distinct(_ds(vals, blocks=31), "s")
    assert a["estimate"] == b["estimate"]


def test_small_range_linear_counting():
    vals = [f"u{i}" for i in range(100)]
    r = hll_distinct(_ds(vals, blocks=3), "s")
    # linear counting regime: near-exact at n << m
    assert abs(r["estimate"] - 100) < 3


def test_empty_and_single():
    r = hll_distinct(_ds([], blocks=1), "s")
    assert r["estimate"] == 0.0 or np.isclose(r["estimate"], 0.0)
    r1 = hll_distinct(_ds(["only"], blocks=1), "s")
    assert abs(r1["estimate"] - 1.0) < 0.5


def test_partial_merge_is_max():
    a = _hll_partial(pa.array(["a", "b", "c"]), 12)
    b = _hll_partial(pa.array(["c", "d"]), 12)
    both = _hll_partial(pa.array(["a", "b", "c", "d"]), 12)
    assert np.array_equal(np.maximum(a, b), both)
    est = _hll_estimate(np.maximum(a, b))
    assert abs(est - 4.0) < 1.0
