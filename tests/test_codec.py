from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from web_based_search_engine_ray.stages import codec


def test_varbyte_roundtrip_simple():
    for vals in ([], [0], [1], [127], [128], [16383], [16384], [2**62],
                 [0, 1, 127, 128, 300, 2**40, 5]):
        arr = np.array(vals, dtype=np.uint64)
        out = codec.varbyte_decode(codec.varbyte_encode(arr))
        assert out.tolist() == vals


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=200))
def test_varbyte_roundtrip_property(vals):
    arr = np.array(vals, dtype=np.uint64)
    out = codec.varbyte_decode(codec.varbyte_encode(arr))
    assert out.tolist() == vals


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**40), max_size=100))
def test_sorted_roundtrip(vals):
    vals = sorted(vals)
    arr = np.array(vals, dtype=np.int64)
    out = codec.decode_sorted(codec.encode_sorted(arr))
    assert out.tolist() == vals


def test_position_lists_roundtrip():
    lists = [np.array([0, 3, 7]), np.array([], dtype=np.int64),
             np.array([5]), np.array([2, 2000, 2001])]
    lens = np.array([len(x) for x in lists])
    blob = codec.encode_position_lists(lists)
    back = codec.decode_position_lists(blob, lens)
    assert len(back) == len(lists)
    for a, b in zip(lists, back):
        assert a.tolist() == b.tolist()


def test_compression_is_compact():
    # 1000 doc ids with small gaps → ~1 byte per id
    ids = np.cumsum(np.random.default_rng(0).integers(1, 60, 1000))
    blob = codec.encode_sorted(ids)
    assert len(blob) < 1100
