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


def test_search_traversal_auto_rank_identity(idx):
    """traversal='auto' must be rank-identical to both engines on every
    query shape (the cost model only picks, never changes results)."""
    s = Searcher(idx)
    for words in _QUERIES:
        a = s.search(words, k=10, hydrate=False)
        c = s.search(words, k=10, hydrate=False, traversal="auto")
        assert a["doc_id"].tolist() == c["doc_id"].tolist(), words
        assert a["score"].tolist() == c["score"].tolist(), words
    # phrase queries route to TAAT under auto (semi-join needs OR-merge)
    p1 = s.search({"spark", "merge"}, phrase=["spark", "merge"], k=10,
                  hydrate=False)
    p2 = s.search({"spark", "merge"}, phrase=["spark", "merge"], k=10,
                  hydrate=False, traversal="auto")
    assert p1["doc_id"].tolist() == p2["doc_id"].tolist()


def test_choose_traversal_cost_model(ray_session, tmp_path_factory):
    """On a skewed-df (Zipfian) corpus the cost model picks WAND for a
    common+rare pair and TAAT for flat pairs / single terms; on the
    flat-vocabulary corpus it never leaves TAAT."""
    from web_based_search_engine_ray.sources.webcorpus import (
        synth_corpus,
        zipf_documents_dir,
        zipf_queries,
    )
    from web_based_search_engine_ray.stages.cwand import load_kernel

    d = str(tmp_path_factory.mktemp("zipf_idx"))
    # sized so a common+rare pair clears WAND_AUTO_MIN_VOLUME (sum_df
    # ≈ df(w1) ≈ n_docs must exceed 4096)
    zdir = zipf_documents_dir(
        n_docs=6000, vocab=4000, doc_len=80, seed=9,
        cache_root=str(tmp_path_factory.mktemp("zipf_docs")),
    )
    build_index(
        lambda: synth_corpus(zdir), d, IndexConfig(),
        input_key="zipf-test", resume=False,
    )
    s = Searcher(d)
    if load_kernel() is not None:
        # w1 df≈N, w900 rare → volume+skew+k all clear the bars
        assert s.choose_traversal({"w1", "w900"}, k=10) == "wand"
    # flat pair (similar ranks → similar dfs): skew bar fails
    assert s.choose_traversal({"w1", "w2"}, k=10) == "taat"
    # single term: nothing to skip
    assert s.choose_traversal({"w1"}, k=10) == "taat"
    # deep k kills pruning
    assert s.choose_traversal({"w1", "w900"}, k=10**6) == "taat"

    # rank identity across all three traversals on the zipf index
    for q in zipf_queries(12):
        words = {w for w in q.split()}
        a = s.search(words, k=10, hydrate=False)
        b = s.search(words, k=10, hydrate=False, traversal="wand")
        c = s.search(words, k=10, hydrate=False, traversal="auto")
        assert a["doc_id"].tolist() == b["doc_id"].tolist() == \
            c["doc_id"].tolist(), q
