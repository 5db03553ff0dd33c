"""Unit tests for stage bodies: run compaction, forward derivation,
events, dedup — checked against brute-force implementations."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from web_based_search_engine_ray.config import IndexConfig
from web_based_search_engine_ray.stages import codec
from web_based_search_engine_ray.stages.postings import (
    TokenizeEncode,
    compact_bucket,
)


def _mk_batch(rows):
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "title": pa.array([r[1] for r in rows], type=pa.string()),
            "text": pa.array([r[2] for r in rows], type=pa.string()),
        }
    )


def _decode_rows(seg: pa.Table):
    """segment rows → {term: {doc: (ttf, btf, tpos, bpos)}}"""
    out: dict = {}
    for i in range(seg.num_rows):
        term = seg["term"][i].as_py()
        ids = codec.decode_sorted(seg["doc_gaps"][i].as_py())
        ttfs = codec.varbyte_decode(seg["title_tfs"][i].as_py()).astype(np.int64)
        btfs = codec.varbyte_decode(seg["body_tfs"][i].as_py()).astype(np.int64)
        tflat = codec.decode_concat_positions(seg["title_pos"][i].as_py(), ttfs)
        bflat = codec.decode_concat_positions(seg["body_pos"][i].as_py(), btfs)
        toff = np.concatenate(([0], np.cumsum(ttfs)))
        boff = np.concatenate(([0], np.cumsum(btfs)))
        d = out.setdefault(term, {})
        for j, doc in enumerate(ids):
            assert int(doc) not in d, f"duplicate doc {doc} for {term}"
            d[int(doc)] = (
                int(ttfs[j]),
                int(btfs[j]),
                tflat[toff[j]:toff[j + 1]].tolist(),
                bflat[boff[j]:boff[j + 1]].tolist(),
            )
    return out


CFG = IndexConfig(use_stemming=False, use_stopwords=False, num_buckets=1)


def test_tokenize_encode_roundtrip():
    enc = TokenizeEncode(CFG)
    seg = enc(_mk_batch([
        (1, "alpha beta", "alpha gamma alpha"),
        (2, "", "beta beta"),
    ]))
    decoded = _decode_rows(seg)
    assert decoded["alpha"][1] == (1, 2, [0], [0, 2])
    assert decoded["beta"][1] == (1, 0, [1], [])
    assert decoded["beta"][2] == (0, 2, [], [0, 1])
    assert decoded["gamma"][1] == (0, 1, [], [1])


def test_compact_merges_runs_across_blocks():
    enc = TokenizeEncode(CFG)
    # same terms split across two blocks, unordered doc ids
    seg1 = enc(_mk_batch([(5, "x", "x y"), (1, "", "y")]))
    seg2 = enc(_mk_batch([(3, "x x", "z x")]))
    both = pa.concat_tables([seg1, seg2])
    compacted = compact_bucket(both, max_run_docs=1000, num_buckets=1)
    decoded = _decode_rows(compacted)
    assert sorted(decoded["x"].keys()) == [3, 5]
    assert decoded["x"][3] == (2, 1, [0, 1], [1])
    assert decoded["x"][5] == (1, 1, [0], [0])
    assert sorted(decoded["y"].keys()) == [1, 5]
    # x appears in 2 runs pre-compaction, 1 run after
    x_rows = compacted.filter(
        pa.compute.equal(compacted["term"], "x")
    )
    assert x_rows.num_rows == 1
    assert x_rows["df_run"][0].as_py() == 2


def test_compact_chunks_hot_terms():
    enc = TokenizeEncode(CFG)
    segs = [
        enc(_mk_batch([(d, "", "hot") for d in range(b * 10, b * 10 + 10)]))
        for b in range(4)
    ]
    compacted = compact_bucket(
        pa.concat_tables(segs), max_run_docs=15, num_buckets=1
    )
    assert compacted.num_rows == 3  # 40 docs / 15 per run
    assert sum(compacted["df_run"].to_pylist()) == 40
    decoded = _decode_rows(compacted)
    assert sorted(decoded["hot"].keys()) == list(range(40))


def test_sessionize_matches_bruteforce(ray_session, sf_dir):
    import ray.data as rd

    from web_based_search_engine_ray.pipelines.events import sessionize

    got = (
        sessionize(rd.read_parquet(f"{sf_dir}/events.parquet"), gap_minutes=30)
        .to_pandas()
        .sort_values(["user_id", "session_start"])
        .reset_index(drop=True)
    )

    ev = pd.read_parquet(f"{sf_dir}/events.parquet").sort_values(
        ["user_id", "ts"]
    )
    rows = []
    for uid, grp in ev.groupby("user_id"):
        cur = None
        for _, r in grp.iterrows():
            if cur is None or (r["ts"] - cur["end"]).total_seconds() > 1800:
                if cur:
                    rows.append(cur)
                cur = {"user_id": uid, "start": r["ts"], "end": r["ts"],
                       "n": 1, "sum": r["value"]}
            else:
                cur["end"] = r["ts"]
                cur["n"] += 1
                cur["sum"] += r["value"]
        if cur:
            rows.append(cur)
    exp = pd.DataFrame(rows).sort_values(["user_id", "start"]).reset_index(drop=True)
    assert len(got) == len(exp)
    assert (got["user_id"].to_numpy() == exp["user_id"].to_numpy()).all()
    assert (got["n_events"].to_numpy() == exp["n"].to_numpy()).all()
    np.testing.assert_allclose(got["sum_value"], exp["sum"], rtol=1e-9)


def test_exact_dedup_keeps_min_doc_id(ray_session):
    import ray.data as rd

    from web_based_search_engine_ray.pipelines.dedup import exact_dedup

    t = pa.table(
        {
            "doc_id": pa.array([5, 1, 3, 2, 9], type=pa.int64()),
            "text": pa.array(["a", "b", "a", "b", "c"]),
        }
    )
    kept = exact_dedup(rd.from_arrow(t)).to_pandas()
    assert sorted(kept["doc_id"].tolist()) == [1, 3, 9]


def test_minhash_estimates_jaccard(ray_session):
    import ray.data as rd

    from web_based_search_engine_ray.pipelines.dedup import (
        MinHasher,
        _shingle_hashes,
        minhash_lsh_pairs,
    )

    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = base + " extra"
    far = "completely different words nothing shared here at all whatsoever ok"
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], type=pa.int64()),
            "text": pa.array([base, near, far]),
        }
    )
    pairs = minhash_lsh_pairs(
        rd.from_arrow(t), threshold=0.3
    ).to_pandas()
    assert {(1, 2)} == set(zip(pairs["doc_a"], pairs["doc_b"]))
    est = pairs["est_jaccard"].iloc[0]
    a = set(_shingle_hashes(base, 3).tolist())
    b = set(_shingle_hashes(near, 3).tolist())
    true_j = len(a & b) / len(a | b)
    assert abs(est - true_j) < 0.25  # 64 permutations → coarse estimate


def test_media_pipeline_schema(ray_session, sf_dir):
    from web_based_search_engine_ray.pipelines.multimodal import (
        FEATURE_DIM,
        media_pipeline,
    )
    from web_based_search_engine_ray.sources.webcorpus import synth_corpus

    out = media_pipeline(
        synth_corpus(sf_dir).select_columns(["doc_id", "html"]).limit(20),
        payload_col="html",
        batch_size=8,
        concurrency=(1, 2),
    ).to_pandas()
    assert len(out) == 20
    assert "html" not in out.columns  # heavy payload dropped
    assert len(out["features"].iloc[0]) == FEATURE_DIM
    # determinism
    out2 = media_pipeline(
        synth_corpus(sf_dir).select_columns(["doc_id", "html"]).limit(20),
        payload_col="html",
        batch_size=8,
        concurrency=(1, 2),
    ).to_pandas()
    m1 = dict(zip(out["doc_id"], out["width"]))
    m2 = dict(zip(out2["doc_id"], out2["width"]))
    assert m1 == m2


def test_media_strict_mode_raises():
    from web_based_search_engine_ray.pipelines.multimodal import (
        MediaFeatureExtractor,
    )

    ex = MediaFeatureExtractor(payload_col="p", mode="strict")
    batch = pa.table({"p": pa.array([b"bytes"], type=pa.binary())})
    with pytest.raises(NotImplementedError):
        ex(batch)


def test_media_custom_decoder_injection():
    """A user codec drops in via register_decoder without editing the
    stage: the stage builds output columns from the decoder's declared
    schema."""
    from web_based_search_engine_ray.pipelines import multimodal

    class ByteLenDecoder:
        schema = [("n_bytes", pa.int64()), ("first", pa.int32())]

        def decode_batch(self, payloads):
            return {
                "n_bytes": pa.array([len(p) for p in payloads]),
                "first": pa.array(
                    [p[0] if p else -1 for p in payloads], type=pa.int32()
                ),
            }

    multimodal.register_decoder("bytelen", ByteLenDecoder)
    try:
        ex = multimodal.MediaFeatureExtractor(
            payload_col="p", decoder="bytelen"
        )
        batch = pa.table(
            {
                "doc_id": pa.array([1, 2], type=pa.int64()),
                "p": pa.array([b"abc", b""], type=pa.binary()),
            }
        )
        out = ex(batch)
        assert out.column_names == ["doc_id", "n_bytes", "first"]
        assert out["n_bytes"].to_pylist() == [3, 0]
        assert out["first"].to_pylist() == [ord("a"), -1]
    finally:
        del multimodal._DECODERS["bytelen"]

    with pytest.raises(ValueError, match="unknown media decoder"):
        multimodal.MediaFeatureExtractor(payload_col="p", decoder="nope")


def test_lww_shard_dedup_task_idempotent_on_retry(tmp_path):
    """Ray re-executes tasks on worker loss: a retry that finds a
    completed ``lww-compacted.parquet`` (plus leftover inputs from the
    interrupted remove loop) must converge on the compacted state —
    never delete the output (regression: the output was globbed as an
    input and removed)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from web_based_search_engine_ray.pipelines.build_index import (
        _lww_shard_dedup_task,
    )

    d = tmp_path / "doc_shard=0"
    d.mkdir()
    rows = pa.table({
        "url": ["u1", "u1", "u2"],
        "last_modified": pa.array(
            np.array(["2024-01-02", "2024-01-01", "2024-01-01"],
                     dtype="datetime64[us]"),
            type=pa.timestamp("us")),
        "text": ["new", "old", "x"],
    })
    pq.write_table(rows, d / "part-0.parquet")
    batch = pa.table({"shard": pa.array([0], pa.int64()),
                      "dir": pa.array([str(d)])})

    # first (clean) execution: compacts to 2 rows, removes the input
    r1 = _lww_shard_dedup_task(batch)
    assert r1["rows"].to_pylist() == [2]
    assert sorted(p.name for p in d.iterdir()) == ["lww-compacted.parquet"]

    # simulate an interrupted remove loop: leftover input + output
    pq.write_table(rows, d / "part-0.parquet")
    r2 = _lww_shard_dedup_task(batch)
    assert r2["rows"].to_pylist() == [2]
    files = sorted(p.name for p in d.iterdir())
    assert files == ["lww-compacted.parquet"], files
    out = pq.read_table(d / "lww-compacted.parquet")
    assert sorted(out["url"].to_pylist()) == ["u1", "u2"]
    assert "new" in out["text"].to_pylist()

    # pure re-execution (no leftovers) is also stable
    r3 = _lww_shard_dedup_task(batch)
    assert r3["rows"].to_pylist() == [2]
    assert sorted(p.name for p in d.iterdir()) == ["lww-compacted.parquet"]


def test_lww_resume_read_error_with_no_inputs_raises(tmp_path, monkeypatch):
    """A transient footer-read failure on a completed compaction whose
    inputs were already removed must RAISE — the compacted file is the
    shard's only copy (regression: the torn-copy branch deleted it and
    reported the shard as empty).  Inputs still present do NOT prove a
    torn copy (the remove loop can be interrupted midway through, so
    comp may hold rows whose inputs are already gone): only the
    ``.tmp`` source sibling — which ``fsio.replace`` deletes strictly
    AFTER verifying the copy — marks a genuine torn copy, and only then
    is comp discarded and the shard recompacted from the (then
    guaranteed complete) inputs."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from web_based_search_engine_ray.pipelines import build_index as bi

    d = tmp_path / "doc_shard=0"
    d.mkdir()
    rows = pa.table({
        "url": ["u1"],
        "last_modified": pa.array(
            np.array(["2024-01-01"], dtype="datetime64[us]"),
            type=pa.timestamp("us")),
        "text": ["x"],
    })
    pq.write_table(rows, d / "lww-compacted.parquet")
    batch = pa.table({"shard": pa.array([0], pa.int64()),
                      "dir": pa.array([str(d)])})

    def boom(path):
        raise OSError("transient object-store read failure")

    monkeypatch.setattr(bi.fsio, "parquet_num_rows", boom)
    with pytest.raises(OSError, match="transient"):
        bi._lww_shard_dedup_task(batch)
    assert (d / "lww-compacted.parquet").exists()  # sole copy untouched

    # inputs present but NO .tmp sibling: the replace COMPLETED (tmp is
    # deleted only after a verified copy), so the read failure is still
    # transient and comp may be the only copy of rows whose inputs a
    # prior attempt's remove loop already deleted — must still RAISE
    # (regression: leftover inputs were mis-read as proof of a torn copy
    # and comp was deleted, losing the already-removed inputs' rows)
    dup_rows = pa.table({
        "url": ["u1", "u1"],
        "last_modified": pa.array(
            np.array(["2024-01-02", "2024-01-01"], dtype="datetime64[us]"),
            type=pa.timestamp("us")),
        "text": ["new", "old"],
    })
    pq.write_table(dup_rows, d / "part-0.parquet")
    with pytest.raises(OSError, match="transient"):
        bi._lww_shard_dedup_task(batch)
    assert (d / "lww-compacted.parquet").exists()

    # .tmp sibling present -> genuine torn copy (crash mid-copy, remove
    # loop never ran): comp is discarded and the shard recompacts from
    # the intact inputs
    pq.write_table(dup_rows, d / "lww-compacted.parquet.tmp")
    r = bi._lww_shard_dedup_task(batch)
    assert r["rows"].to_pylist() == [1]
    assert sorted(p.name for p in d.iterdir()) == ["lww-compacted.parquet"]
    assert pq.read_table(d / "lww-compacted.parquet")["text"].to_pylist() \
        == ["new"]
