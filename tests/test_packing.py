"""Sequence packing operator (pipelines.packing)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def test_pack_greedy_rules():
    from web_based_search_engine_ray.pipelines.packing import _pack_greedy

    # fits: 3+4=7 <=8; 2 overflows to a new pack; 9 > budget gets its
    # own pack; the next doc never joins the over-budget pack
    n = np.array([3, 4, 2, 9, 1], dtype=np.int64)
    np.testing.assert_array_equal(
        _pack_greedy(n, 8), np.array([0, 0, 1, 2, 3])
    )
    # first doc over budget still opens pack 0
    np.testing.assert_array_equal(
        _pack_greedy(np.array([99, 1], dtype=np.int64), 8),
        np.array([0, 1]),
    )
    assert _pack_greedy(np.empty(0, dtype=np.int64), 8).size == 0


def test_pack_sequences_invariants_and_determinism(ray_session):
    import ray.data as rd

    from web_based_search_engine_ray.pipelines.packing import (
        pack_sequences,
        verify_packing,
    )

    rng = np.random.default_rng(7)
    texts = [
        " ".join(f"w{j}" for j in range(rng.integers(1, 120)))
        for _ in range(400)
    ]
    t = pa.table({
        "doc_id": pa.array(range(400), pa.int64()),
        "text": pa.array(texts),
    })
    out1 = pack_sequences(rd.from_arrow(t), 256, num_shards=4).to_pandas()
    verify_packing(out1, 256)
    assert len(out1) == 400
    assert set(out1["shard"]) == {0, 1, 2, 3}
    out2 = pack_sequences(rd.from_arrow(t), 256, num_shards=4).to_pandas()
    a = out1.sort_values("doc_id").reset_index(drop=True)
    b = out2.sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)

    with pytest.raises(ValueError, match="budget"):
        pack_sequences(rd.from_arrow(t), 0)
