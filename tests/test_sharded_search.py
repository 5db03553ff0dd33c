"""Doc-partitioned index + scatter-gather search must be result-
identical to the single-partition engine on the same corpus."""

from __future__ import annotations

import numpy as np
import pytest


@pytest.fixture(scope="module")
def indexes(ray_session, tmp_path_factory):
    from web_based_search_engine_ray.config import IndexConfig
    from web_based_search_engine_ray.pipelines.build_index import build_index
    from web_based_search_engine_ray.sources.webcorpus import synth_corpus

    sf = "/root/testdata/sf0.001"
    base = tmp_path_factory.mktemp("sharded")
    flat_dir = str(base / "flat")
    shard_dir = str(base / "sharded")
    common = dict(
        extract_concurrency=(1, 2),
        tokenize_concurrency=(1, 2),
        shuffle_partitions=4,
    )
    build_index(
        lambda: synth_corpus(sf), flat_dir,
        IndexConfig(**common), input_key="flat", resume=False,
    )
    build_index(
        lambda: synth_corpus(sf), shard_dir,
        IndexConfig(doc_shards=4, **common), input_key="shard", resume=False,
    )
    return flat_dir, shard_dir


def test_sharded_build_partitions_exist(indexes):
    import os

    _, shard_dir = indexes
    parts = sorted(os.listdir(os.path.join(shard_dir, "segments")))
    assert parts == [f"doc_shard={i}" for i in range(4)]
    # docstats is partitioned the same way, so a shard Searcher loads
    # only its 1/shards slice of doc state
    sparts = sorted(
        p for p in os.listdir(os.path.join(shard_dir, "docstats"))
        if p.startswith("doc_shard=")
    )
    assert sparts == [f"doc_shard={i}" for i in range(4)]


def test_brokered_batch_search_matches_driver_merge(indexes):
    from web_based_search_engine_ray.pipelines.search import ShardedSearcher

    _, shard_dir = indexes
    sharded = ShardedSearcher(shard_dir, num_cpus_per_shard=0.5)
    try:
        queries = ["spark merge", '"batch batch" window', "doc table",
                   "key fast join", "zzznope"]
        plain = sharded.batch_search(queries, k=10, n_brokers=0)
        brokered = sharded.batch_search(queries, k=10, n_brokers=2)
        pa = plain.sort_values(["query_id", "rank"], ignore_index=True)
        pb = brokered.sort_values(["query_id", "rank"], ignore_index=True)
        assert pa["doc_id"].tolist() == pb["doc_id"].tolist()
        assert pa["query_id"].tolist() == pb["query_id"].tolist()
        np.testing.assert_allclose(
            pa["score"].to_numpy(np.float64),
            pb["score"].to_numpy(np.float64), rtol=1e-12,
        )
    finally:
        sharded.shutdown()


def test_sharded_results_identical(indexes):
    from web_based_search_engine_ray.pipelines.search import (
        Searcher,
        ShardedSearcher,
    )

    flat_dir, shard_dir = indexes
    flat = Searcher(flat_dir)
    sharded = ShardedSearcher(shard_dir)
    try:
        for words, phrase in [
            ({"spark", "merge"}, None),
            ({"window", "batch"}, ["batch", "batch"]),
            ({"doc", "table"}, None),
            ({"zzznope"}, None),
        ]:
            a = flat.search(words, phrase, k=20, hydrate=False)
            b = sharded.search(words, phrase, k=20)
            assert a["doc_id"].tolist() == b["doc_id"].tolist(), (words, phrase)
            np.testing.assert_allclose(
                a["score"].to_numpy(dtype=np.float64),
                b["score"].to_numpy(dtype=np.float64),
                rtol=1e-12,
            )
        bs = sharded.batch_search(["spark merge", '"batch batch" window'], k=10)
        assert set(bs.columns) == {"query_id", "rank", "doc_id", "score"}
        q0 = bs[bs.query_id == 0]
        direct = sharded.search({"spark", "merge"}, None, k=10)
        assert q0["doc_id"].tolist() == direct["doc_id"].tolist()
    finally:
        sharded.shutdown()


def test_shard_restricted_searcher_is_partition(indexes):
    from web_based_search_engine_ray.pipelines.search import Searcher

    _, shard_dir = indexes
    full = Searcher(shard_dir)
    all_ids = set(full.search({"merge"}, k=10**9, hydrate=False)["doc_id"])
    union = set()
    for s in range(4):
        part = Searcher(shard_dir, doc_shard=s)
        ids = set(part.search({"merge"}, k=10**9, hydrate=False)["doc_id"])
        assert all(i % 4 == s for i in ids)
        union |= ids
    assert union == all_ids
