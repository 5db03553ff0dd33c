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
