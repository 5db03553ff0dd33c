"""MaxScore pruning must be rank-identical to exhaustive scoring for
the returned top-k."""

from __future__ import annotations

import numpy as np
import pytest


@pytest.fixture(scope="module")
def idx(ray_session, sf_dir):
    from web_based_search_engine_ray.config import IndexConfig
    from web_based_search_engine_ray.registry import get_index

    return get_index(sf_dir, IndexConfig())


def test_lexicon_has_upper_bounds(idx):
    import os

    import pyarrow.dataset as pads

    lex = pads.dataset(os.path.join(idx, "lexicon"), format="parquet").to_table()
    assert "ub_adj" in lex.column_names
    ub = lex["ub_adj"].to_numpy(zero_copy_only=False)
    assert (ub > 0).all() and (ub <= 1.0).all()  # adjTF/tfMax <= 1


@pytest.mark.parametrize("k", [1, 5, 10, 50])
def test_prune_rank_identical(idx, k):
    from web_based_search_engine_ray.pipelines.search import Searcher

    s = Searcher(idx)
    for words in [
        {"spark", "merge"},
        {"window", "batch", "stream", "join"},
        {"doc", "fast"},
        {"dup", "slow", "agg", "row", "key", "data"},
    ]:
        full = s.search(words, k=k, hydrate=False)
        pruned = s.search(words, k=k, hydrate=False, prune=True)
        assert full["doc_id"].tolist() == pruned["doc_id"].tolist(), (words, k)
        # term processing order differs between the two paths, so sums
        # differ in the last ulp; ranks must still agree exactly
        np.testing.assert_allclose(
            full["score"].to_numpy(np.float64),
            pruned["score"].to_numpy(np.float64),
            rtol=1e-12,
        )


def test_segments_carry_block_max_metadata(idx):
    import os

    import pyarrow.dataset as pads

    seg = pads.dataset(
        os.path.join(idx, "segments"), format="parquet", partitioning="hive"
    ).to_table(columns=["min_doc", "max_doc", "ub_run", "df_run"])
    mn = seg["min_doc"].to_numpy(zero_copy_only=False)
    mx = seg["max_doc"].to_numpy(zero_copy_only=False)
    ub = seg["ub_run"].to_numpy(zero_copy_only=False)
    assert (mn <= mx).all()
    assert (ub > 0).all() and (ub <= 1.0).all()


def test_restricted_phase_skips_runs(ray_session, sf_dir, tmp_path_factory):
    """On a multi-run index (small tokenize blocks + run chunking) the
    pruned path must decode strictly fewer runs than exhaustive
    scoring, while staying rank-identical."""
    from web_based_search_engine_ray.config import IndexConfig
    from web_based_search_engine_ray.pipelines.build_index import build_index
    from web_based_search_engine_ray.pipelines.search import Searcher
    from web_based_search_engine_ray.sources.webcorpus import synth_corpus

    d = str(tmp_path_factory.mktemp("runskip") / "idx")
    build_index(
        lambda: synth_corpus(sf_dir), d,
        IndexConfig(max_run_docs=64, tokenize_batch_size=64,
                    shuffle_partitions=4, extract_concurrency=(1, 2),
                    tokenize_concurrency=(1, 2)),
        input_key="runskip", resume=False,
    )
    words = {"42", "merge", "join", "batch", "stream", "window"}
    decoded = {}
    for prune in (False, True):
        s = Searcher(d)
        res = s.search(words, k=1, hydrate=False, prune=prune)
        decoded[prune] = s.run_stats["decoded"]
        if prune:
            assert res["doc_id"].tolist() == top_unpruned
        else:
            top_unpruned = res["doc_id"].tolist()
    assert decoded[True] < decoded[False]


def test_prune_actually_restricts(idx):
    """With small k on a query mixing one rare and several common terms,
    the pruning path must enter restricted mode (observable via fewer
    candidates than exhaustive scoring)."""
    from web_based_search_engine_ray.pipelines.search import Searcher

    s = Searcher(idx)
    words = {"42", "merge", "join", "batch"}  # '42' = rare title term
    full_map = s.scores(words)
    pruned_map = s.scores(words, k=1, prune=True)
    top_full = max(full_map.items(), key=lambda kv: (kv[1], -kv[0]))
    top_pruned = max(pruned_map.items(), key=lambda kv: (kv[1], -kv[0]))
    assert top_full == top_pruned
    assert len(pruned_map) <= len(full_map)


@pytest.mark.parametrize("k", [1, 5, 10])
def test_bm25_prune_rank_identical(idx, k):
    """BM25 MaxScore (ub = idf·(k1+1), no norm division) must return
    the exact top-k of exhaustive bm25 scoring."""
    from web_based_search_engine_ray.pipelines.search import Searcher

    s = Searcher(idx)
    for words in [
        {"spark", "merge"},
        {"window", "batch", "stream", "join"},
        {"dup", "slow", "agg", "row", "key", "data"},
    ]:
        full = s.search(words, k=k, hydrate=False, mode="bm25")
        pruned = s.search(words, k=k, hydrate=False, prune=True,
                          mode="bm25")
        assert full["doc_id"].tolist() == pruned["doc_id"].tolist(), (words, k)
        np.testing.assert_allclose(
            full["score"].to_numpy(np.float64),
            pruned["score"].to_numpy(np.float64),
            rtol=1e-12,
        )


def test_bm25_restricted_phase_skips_runs(ray_session, sf_dir,
                                          tmp_path_factory):
    """The bm25 pruned path must decode strictly fewer runs than
    exhaustive bm25 on a multi-run index, rank-identically."""
    from web_based_search_engine_ray.config import IndexConfig
    from web_based_search_engine_ray.pipelines.build_index import build_index
    from web_based_search_engine_ray.pipelines.search import Searcher
    from web_based_search_engine_ray.sources.webcorpus import synth_corpus

    d = str(tmp_path_factory.mktemp("runskip25") / "idx")
    build_index(
        lambda: synth_corpus(sf_dir), d,
        IndexConfig(max_run_docs=64, tokenize_batch_size=64,
                    shuffle_partitions=4, extract_concurrency=(1, 2),
                    tokenize_concurrency=(1, 2)),
        input_key="runskip25", resume=False,
    )
    words = {"42", "merge", "join", "batch", "stream", "window"}
    decoded = {}
    for prune in (False, True):
        s = Searcher(d)
        res = s.search(words, k=1, hydrate=False, prune=prune, mode="bm25")
        decoded[prune] = s.run_stats["decoded"]
        if prune:
            assert res["doc_id"].tolist() == top_unpruned
        else:
            top_unpruned = res["doc_id"].tolist()
    assert decoded[True] < decoded[False], decoded


def test_lexicon_bucket_lazy_load(idx):
    """Searcher must load only the queried terms' lexicon buckets —
    actor RSS independent of total vocabulary."""
    from web_based_search_engine_ray.pipelines.search import Searcher

    s = Searcher(idx)
    assert s._lex_bucketed and not s._lex_cache
    s.search({"spark", "merge"}, k=5, hydrate=False)
    touched = len(s._lex_cache)
    assert 0 < touched <= 2  # at most one bucket per query term


def test_restricted_partial_bitwise_matches_cached(idx):
    """``_partial_for_candidates`` must use the SAME fp association as
    the cached-partial scorers — restricted-phase contributions are
    exact bit for bit in both modes (regression: the bm25 branch
    multiplied ``(idf*tf)*(k1+1)`` instead of ``idf*(tf*(k1+1))``,
    making pruned scores differ by ulps from warm-cache scores)."""
    from web_based_search_engine_ray.pipelines.search import Searcher

    s = Searcher(idx)
    term = s.stem_query_word("merge")
    df = s._lex_entry(term)[0]
    for bm25 in (False, True):
        tp = (s._term_partial_bm25(term, df) if bm25
              else s._term_partial(term, df))
        if tp[3] is not None:  # densified: re-sparsify for comparison
            ids_c = s._stat_ids[tp[4]]
            part_c = tp[3][tp[4]]
        else:
            ids_c, part_c = tp[0], tp[1]
        ids_r, part_r, _pos = s._partial_for_candidates(
            term, df, ids_c, bm25=bm25
        )
        pos = np.searchsorted(ids_r, ids_c)
        assert (ids_r[pos] == ids_c).all()
        assert (part_r[pos] == part_c).all(), (
            f"bm25={bm25}: restricted-phase partials not bit-identical"
        )


def test_search_k0_returns_empty(idx):
    """k=0 must yield empty results on every traversal, not an obscure
    ``np.partition`` ValueError (regression)."""
    from web_based_search_engine_ray.pipelines.search import Searcher

    s = Searcher(idx)
    for tr in ("taat", "auto"):
        res = s.search({"spark", "merge"}, k=0, hydrate=False,
                       traversal=tr)
        assert len(res) == 0


def test_choose_traversal_respects_kernel_capacity(idx, monkeypatch):
    """Queries over the compiled kernel's capacity (terms > MAX_TERMS
    or k > MAX_K) must route to TAAT — wand would silently fall back to
    the order-of-magnitude-slower Python pivot walk (regression)."""
    from web_based_search_engine_ray.pipelines.search import Searcher
    from web_based_search_engine_ray.stages.cwand import (
        MAX_K,
        load_kernel,
    )

    if load_kernel() is None:
        pytest.skip("no C compiler on this host")
    s = Searcher(idx)
    # force the volume/skew/k heuristics open so capacity is the only gate
    monkeypatch.setattr(s, "WAND_AUTO_MIN_VOLUME", 0)
    monkeypatch.setattr(s, "WAND_AUTO_SKEW", 0.0)
    monkeypatch.setattr(s, "WAND_AUTO_K_FACTOR", 0)
    words = ["spark", "merge"]
    assert s.choose_traversal(words, k=10) == "wand"
    assert s.choose_traversal(words, k=MAX_K + 1) == "taat"
