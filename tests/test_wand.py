"""Block-Max WAND traversal: rank identity with the TAAT engine."""

import numpy as np
import pytest

from web_based_search_engine_ray.config import IndexConfig
from web_based_search_engine_ray.pipelines.build_index import build_index
from web_based_search_engine_ray.pipelines.search import (
    Searcher,
    _topk_indices,
)
from web_based_search_engine_ray.sources.webcorpus import synth_corpus

_QUERIES = [
    {"spark", "merge"},
    {"window", "batch", "stream"},
    {"customer", "table", "scan", "sort"},
    {"data"},
    {"spark", "nosuchword"},
    {"nosuchword"},
    {"spark", "merge", "join", "window", "batch", "stream", "filter"},
]


@pytest.fixture(scope="module")
def idx(ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("wand_idx"))
    build_index(
        lambda: synth_corpus("/root/testdata/sf0.001"),
        d,
        IndexConfig(),
        input_key="wand-test",
        resume=False,
    )
    return d


@pytest.mark.parametrize("mode", ["ref", "bm25"])
@pytest.mark.parametrize("k", [1, 5, 10, 50])
def test_wand_rank_identical(idx, mode, k):
    s = Searcher(idx)
    for words in _QUERIES:
        ids, vals = s.scores_arrays(words, mode=mode)
        top = _topk_indices(ids, vals, k)
        want_ids, want_vals = ids[top], vals[top]
        got_ids, got_vals = s.scores_topk_wand(words, k=k, mode=mode)
        assert got_ids.tolist() == want_ids.tolist(), (mode, k, words)
        # bitwise-equal scores (same fold, same partials)
        assert np.array_equal(got_vals, want_vals), (mode, k, words)


def test_wand_small_blocks_still_exact(idx):
    """Tiny blocks exercise the block-max refinement path."""
    s = Searcher(idx)
    s.WAND_BLOCK = 4
    for words in _QUERIES[:4]:
        ids, vals = s.scores_arrays(words)
        top = _topk_indices(ids, vals, 10)
        got_ids, got_vals = s.scores_topk_wand(words, k=10)
        assert got_ids.tolist() == ids[top].tolist()
        assert np.array_equal(got_vals, vals[top])


def test_wand_guards(idx):
    s = Searcher(idx)
    with pytest.raises(ValueError, match="k >= 1"):
        s.scores_topk_wand({"spark"}, k=0)
    assert s.scores_topk_wand({"nosuchword"}, k=5)[0].size == 0


def test_search_traversal_wand(idx):
    s = Searcher(idx)
    a = s.search({"spark", "merge"}, k=5, hydrate=False)
    b = s.search({"spark", "merge"}, k=5, hydrate=False,
                 traversal="wand")
    assert a["doc_id"].tolist() == b["doc_id"].tolist()
    assert a["score"].tolist() == b["score"].tolist()
    with pytest.raises(ValueError, match="traversal"):
        s.search({"spark"}, traversal="bogus")


@pytest.mark.parametrize("mode", ["ref", "bm25"])
def test_wand_c_kernel_bitwise_parity(idx, mode):
    """The compiled kernel (data/wand_kernel.c) must match BOTH the
    Python walk and the TAAT scorer bitwise."""
    from web_based_search_engine_ray.stages.cwand import load_kernel

    if load_kernel() is None:
        pytest.skip("no C compiler on this host")
    s = Searcher(idx)
    for k in (1, 7, 25):
        for words in _QUERIES:
            ids, vals = s.scores_arrays(words, mode=mode)
            top = _topk_indices(ids, vals, k)
            ci, cv = s.scores_topk_wand(words, k=k, mode=mode, kernel="c")
            pi, pv = s.scores_topk_wand(words, k=k, mode=mode, kernel="py")
            assert ci.tolist() == ids[top].tolist() == pi.tolist()
            assert np.array_equal(cv, vals[top])
            assert np.array_equal(cv, pv)


def test_wand_c_kernel_small_blocks(idx):
    from web_based_search_engine_ray.stages.cwand import load_kernel

    if load_kernel() is None:
        pytest.skip("no C compiler on this host")
    s = Searcher(idx)
    s.WAND_BLOCK = 4
    for words in _QUERIES[:4]:
        ids, vals = s.scores_arrays(words)
        top = _topk_indices(ids, vals, 10)
        ci, _ = s.scores_topk_wand(words, k=10, kernel="c")
        assert ci.tolist() == ids[top].tolist()


def test_wand_kernel_fallbacks(idx):
    """kernel='auto' must return results even when the compiled path
    declines (k over compiled capacity); kernel='c' raises then."""
    from web_based_search_engine_ray.stages import cwand

    s = Searcher(idx)
    big_k = cwand.MAX_K + 1
    ids, vals = s.scores_arrays({"spark", "merge"})
    top = _topk_indices(ids, vals, big_k)
    gi, _ = s.scores_topk_wand({"spark", "merge"}, k=big_k, kernel="auto")
    assert gi.tolist() == ids[top].tolist()
    if cwand.load_kernel() is not None:
        with pytest.raises(RuntimeError, match="compiled WAND"):
            s.scores_topk_wand({"spark", "merge"}, k=big_k, kernel="c")
