"""Incremental update must produce an index equivalent to a full
rebuild of the updated corpus, while leaving unaffected doc-shard
segment partitions untouched on disk."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.dataset as pads
import pytest

SF = "/root/testdata/sf0.001"
UPDATED_IDS = (0, 4, 8)          # all in shard 0 (mod 4)
NEW_IDS = (1000, 1004)           # shard 0 as well


def _corpus_v1():
    from web_based_search_engine_ray.sources.webcorpus import synth_corpus

    return synth_corpus(SF)


def _corpus_v2():
    """v1 with docs 0/4/8 rewritten (newer warc_ts) and two new docs."""
    import ray.data as rd

    from web_based_search_engine_ray.sources.webcorpus import synth_batch

    def modify(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        texts = batch["text"].to_pylist()
        texts = [
            t + " freshly updated content tokens"
            if i in UPDATED_IDS else t
            for i, t in zip(ids, texts)
        ]
        t = batch.set_column(
            batch.schema.get_field_index("text"), "text",
            pa.array(texts, type=pa.string()),
        )
        return t

    def to_web(batch: pa.Table) -> pa.Table:
        web = synth_batch(batch)
        ids = web["doc_id"].to_numpy(zero_copy_only=False)
        ts = web["warc_ts"].to_numpy(zero_copy_only=False).astype(
            "datetime64[us]"
        )
        bumped = np.where(
            np.isin(ids, UPDATED_IDS), ts + np.timedelta64(1, "D"), ts
        )
        i = web.schema.get_field_index("warc_ts")
        return web.set_column(
            i, "warc_ts", pa.array(bumped, type=pa.timestamp("us"))
        )

    base = (
        rd.read_parquet(f"{SF}/documents.parquet",
                        columns=["doc_id", "text", "lang"],
                        override_num_blocks=8)
        .map_batches(modify, batch_format="pyarrow")
    )
    extra = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(NEW_IDS), type=pa.int64()),
                "text": pa.array(
                    ["brand new document about sparkly merges" for _ in NEW_IDS]
                ),
                "lang": pa.array(["en"] * len(NEW_IDS)),
            }
        )
    )
    return base.union(extra).map_batches(to_web, batch_format="pyarrow")


@pytest.fixture(scope="module")
def updated_and_rebuilt(ray_session, tmp_path_factory):
    from web_based_search_engine_ray.config import IndexConfig
    from web_based_search_engine_ray.pipelines.build_index import build_index
    from web_based_search_engine_ray.pipelines.update_index import update_index

    cfg = IndexConfig(
        extract_concurrency=(1, 2), tokenize_concurrency=(1, 2),
        shuffle_partitions=4, num_buckets=4, doc_shards=4,
    )
    base = tmp_path_factory.mktemp("upd")
    inc_dir = str(base / "incremental")
    full_dir = str(base / "full")

    build_index(_corpus_v1, inc_dir, cfg, input_key="v1", resume=False)
    # snapshot mtimes of unaffected shard partitions (segments AND the
    # doc-shard-partitioned extracted/ checkpoint)
    mtimes = {
        (stage, s): os.path.getmtime(
            os.path.join(inc_dir, stage, f"doc_shard={s}")
        )
        for s in (1, 2, 3)
        for stage in ("segments", "extracted")
    }
    report = update_index(_corpus_v2, inc_dir, cfg, input_key="v2")
    build_index(_corpus_v2, full_dir, cfg, input_key="v2-full", resume=False)
    return inc_dir, full_dir, report, mtimes


def test_update_report(updated_and_rebuilt):
    _, _, report, _ = updated_and_rebuilt
    assert report["update"]["fresh_docs"] == len(UPDATED_IDS) + len(NEW_IDS)
    assert report["update"]["affected_shards"] == [0]
    assert not report["update"]["full_segment_rebuild"]
    assert report["n_docs"] == 502


def test_unaffected_partitions_untouched(updated_and_rebuilt):
    inc_dir, _, _, mtimes = updated_and_rebuilt
    for (stage, s), old in mtimes.items():
        now = os.path.getmtime(
            os.path.join(inc_dir, stage, f"doc_shard={s}")
        )
        assert now == old, f"{stage} shard {s} was rewritten"


def _tbl(d, name, cols=None):
    return (
        pads.dataset(os.path.join(d, name), format="parquet",
                     partitioning="hive")
        .to_table(columns=cols)
        .to_pandas()
    )


def test_update_equals_full_rebuild(updated_and_rebuilt):
    inc_dir, full_dir, _, _ = updated_and_rebuilt
    li = _tbl(inc_dir, "lexicon").sort_values("term").reset_index(drop=True)
    lf = _tbl(full_dir, "lexicon").sort_values("term").reset_index(drop=True)
    pd.testing.assert_frame_equal(li, lf)
    si = _tbl(inc_dir, "docstats").sort_values("doc_id").reset_index(drop=True)
    sf = _tbl(full_dir, "docstats").sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(si, sf)


def test_update_search_equivalent(updated_and_rebuilt):
    from web_based_search_engine_ray.pipelines.search import Searcher

    inc_dir, full_dir, _, _ = updated_and_rebuilt
    a, b = Searcher(inc_dir), Searcher(full_dir)
    for words, phrase in [
        ({"freshly", "updated"}, None),
        ({"sparkly", "merges"}, None),
        ({"spark", "merge"}, None),
        ({"batch"}, ["batch", "batch"]),
    ]:
        ra = a.search(words, phrase, k=50, hydrate=False)
        rb = b.search(words, phrase, k=50, hydrate=False)
        assert ra["doc_id"].tolist() == rb["doc_id"].tolist(), words
        np.testing.assert_allclose(
            ra["score"].to_numpy(np.float64),
            rb["score"].to_numpy(np.float64),
            rtol=1e-12,
        )
    # the updated content is actually searchable
    hits = a.search({"freshly"}, k=10, hydrate=False)
    assert sorted(hits["doc_id"]) == list(UPDATED_IDS)


REMOVED_IDS = (2, 6)  # shard 2 (mod 4)


def _corpus_v3():
    """v1 minus docs 2 and 6 (full-sync snapshot with deletions)."""
    import ray.data as rd

    from web_based_search_engine_ray.sources.webcorpus import synth_batch

    return (
        rd.read_parquet(f"{SF}/documents.parquet",
                        columns=["doc_id", "text", "lang"],
                        override_num_blocks=8)
        .filter(expr=f"doc_id not in {list(REMOVED_IDS)}")
        .map_batches(synth_batch, batch_format="pyarrow")
    )


def test_remove_missing_deletes_documents(ray_session, tmp_path_factory):
    """update_index(remove_missing=True) must equal a full rebuild of
    the reduced snapshot: deleted docs gone from docmeta/search, df and
    norms globally consistent."""
    import pandas as pd

    from web_based_search_engine_ray.config import IndexConfig
    from web_based_search_engine_ray.pipelines.build_index import build_index
    from web_based_search_engine_ray.pipelines.search import Searcher
    from web_based_search_engine_ray.pipelines.update_index import update_index

    cfg = IndexConfig(
        extract_concurrency=(1, 2), tokenize_concurrency=(1, 2),
        shuffle_partitions=4, num_buckets=4, doc_shards=4,
    )
    base = tmp_path_factory.mktemp("del")
    inc_dir = str(base / "incremental")
    full_dir = str(base / "full")

    build_index(_corpus_v1, inc_dir, cfg, input_key="v1", resume=False)
    report = update_index(
        _corpus_v3, inc_dir, cfg, input_key="v3", remove_missing=True
    )
    assert report["update"]["removed_docs"] == len(REMOVED_IDS)
    assert 2 in report["update"]["affected_shards"]
    assert report["n_docs"] == 500 - len(REMOVED_IDS)

    build_index(_corpus_v3, full_dir, cfg, input_key="v3-full", resume=False)
    li = _tbl(inc_dir, "lexicon").sort_values("term").reset_index(drop=True)
    lf = _tbl(full_dir, "lexicon").sort_values("term").reset_index(drop=True)
    pd.testing.assert_frame_equal(li, lf)

    meta = _tbl(inc_dir, "docmeta", cols=["doc_id"])
    assert not set(REMOVED_IDS) & set(meta["doc_id"])

    a, b = Searcher(inc_dir), Searcher(full_dir)
    for words in [{"spark", "merge"}, {"doc", "2"}]:
        ra = a.search(words, k=10**9, hydrate=False)
        rb = b.search(words, k=10**9, hydrate=False)
        assert ra["doc_id"].tolist() == rb["doc_id"].tolist()
        assert not set(REMOVED_IDS) & set(ra["doc_id"])


def _corpus_v4():
    """v2 with doc 5 (shard 1 under mod 4) rewritten again."""
    import ray.data as rd

    from web_based_search_engine_ray.sources.webcorpus import synth_batch

    def modify(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        texts = [
            t + " freshly updated content tokens" if i in UPDATED_IDS
            else t + " secondwave tokens" if i == 5
            else t
            for i, t in zip(ids, batch["text"].to_pylist())
        ]
        return batch.set_column(
            batch.schema.get_field_index("text"), "text",
            pa.array(texts, type=pa.string()),
        )

    def to_web(batch: pa.Table) -> pa.Table:
        web = synth_batch(batch)
        ids = web["doc_id"].to_numpy(zero_copy_only=False)
        ts = web["warc_ts"].to_numpy(zero_copy_only=False).astype(
            "datetime64[us]"
        )
        bumped = np.where(
            np.isin(ids, UPDATED_IDS), ts + np.timedelta64(1, "D"), ts
        )
        bumped = np.where(ids == 5, ts + np.timedelta64(2, "D"), bumped)
        i = web.schema.get_field_index("warc_ts")
        return web.set_column(
            i, "warc_ts", pa.array(bumped, type=pa.timestamp("us"))
        )

    base = (
        rd.read_parquet(f"{SF}/documents.parquet",
                        columns=["doc_id", "text", "lang"],
                        override_num_blocks=8)
        .map_batches(modify, batch_format="pyarrow")
    )
    extra = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(NEW_IDS), type=pa.int64()),
                "text": pa.array(
                    ["brand new document about sparkly merges" for _ in NEW_IDS]
                ),
                "lang": pa.array(["en"] * len(NEW_IDS)),
            }
        )
    )
    return base.union(extra).map_batches(to_web, batch_format="pyarrow")


def test_second_update_prunes_forward_and_segments(updated_and_rebuilt):
    """Per-shard content tokens must let a SECOND update skip the
    untouched shards of BOTH sharded stages (segments AND forward —
    after the first update the forward stage is in the per-shard
    layout with part manifests, so updates from then on are O(delta)
    in tokenize work)."""
    from web_based_search_engine_ray.pipelines.search import Searcher
    from web_based_search_engine_ray.pipelines.update_index import update_index
    from web_based_search_engine_ray.config import IndexConfig

    cfg = IndexConfig(
        extract_concurrency=(1, 2), tokenize_concurrency=(1, 2),
        shuffle_partitions=4, num_buckets=4, doc_shards=4,
    )
    inc_dir, _, _, _ = updated_and_rebuilt
    assert os.path.exists(os.path.join(inc_dir, "_shard_tokens.json"))

    mtimes = {
        (stage, s): os.path.getmtime(
            os.path.join(inc_dir, stage, f"doc_shard={s}")
        )
        for s in (0, 2, 3)
        for stage in ("segments", "forward", "extracted")
    }
    report = update_index(_corpus_v4, inc_dir, cfg, input_key="v4")
    assert report["update"]["affected_shards"] == [1]
    assert not report["update"]["full_segment_rebuild"]
    for (stage, s), old in mtimes.items():
        now = os.path.getmtime(
            os.path.join(inc_dir, stage, f"doc_shard={s}")
        )
        assert now == old, f"{stage} shard {s} was rewritten on update 2"

    # the second wave of content is searchable and correctly scored
    hits = Searcher(inc_dir).search({"secondwave"}, k=10, hydrate=False)
    assert hits["doc_id"].tolist() == [5]
