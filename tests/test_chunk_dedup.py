"""Chunk-level corpus dedup: keep-first semantics, reassembly, counts."""

import pyarrow as pa
import ray.data as rd

from web_based_search_engine_ray.pipelines.chunk_dedup import chunk_dedup

# 4-token chunks for readable fixtures
A = "a1 a2 a3 a4"
B = "b1 b2 b3 b4"
C = "c1 c2 c3 c4"
TAIL = "t1 t2"  # partial final chunk


def _ds(texts):
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), type=pa.int64()),
                "text": pa.array(texts, type=pa.string()),
            }
        )
    )


def _run(texts, **kw):
    out = (
        chunk_dedup(_ds(texts), chunk_tokens=4, **kw)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    return out


def test_keep_first_across_docs(ray_session):
    out = _run([f"{A} {B}", f"{B} {C}"])
    assert out.loc[0, "text_clean"] == f"{A} {B}"
    assert out.loc[1, "text_clean"] == C  # B seen in doc 0
    assert out["n_chunks"].tolist() == [2, 2]
    assert out["n_kept"].tolist() == [2, 1]


def test_within_doc_repeat_keeps_first(ray_session):
    out = _run([f"{A} {A} {B}"])
    assert out.loc[0, "text_clean"] == f"{A} {B}"
    assert out.loc[0, "n_kept"] == 2


def test_fully_duplicate_doc_becomes_empty(ray_session):
    out = _run([A, A])
    assert out.loc[0, "text_clean"] == A
    assert out.loc[1, "text_clean"] == ""
    assert out.loc[1, "n_kept"] == 0
    assert len(out) == 2  # row-aligned with input


def test_partial_tail_chunk_and_order(ray_session):
    out = _run([f"{A} {B} {TAIL}", f"{TAIL}"])
    # doc 0 keeps everything (first occurrences), order preserved
    assert out.loc[0, "text_clean"] == f"{A} {B} {TAIL}"
    # doc 1 is exactly the tail chunk, already seen
    assert out.loc[1, "text_clean"] == ""


def test_delimiter_mode(ray_session):
    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1], type=pa.int64()),
                "text": pa.array(
                    ["line one\nline two", "line two\nline three"],
                    type=pa.string(),
                ),
            }
        )
    )
    out = (
        chunk_dedup(docs, delimiter="\n")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out.loc[0, "text_clean"] == "line one line two"
    assert out.loc[1, "text_clean"] == "line three"


def test_bucket_count_invariance(ray_session):
    texts = [f"{A} {B}", f"{B} {C}", f"{C} {A} {TAIL}", A]
    a = _run(texts, num_buckets=2)
    b = _run(texts, num_buckets=17)
    assert a.equals(b)
