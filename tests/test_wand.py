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
