"""Word-bigram repetition metrics + corpus top-bigrams."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from web_based_search_engine_ray.pipelines.text_pipeline import (
    repetition_stats_batch,
    top_bigrams,
)


def _stats(texts):
    t = pa.table(
        {"doc_id": pa.array(range(len(texts)), type=pa.int64()),
         "text": pa.array(texts, type=pa.string())}
    )
    return repetition_stats_batch(t).to_pandas().set_index("doc_id")


def test_hand_computed():
    df = _stats(["a b a b c"])
    r = df.loc[0]
    assert r["n_tokens"] == 5
    # bigrams: (a,b)x2 (b,a)x1 (b,c)x1
    assert r["n_bigrams"] == 4
    assert r["dup_bigram_frac"] == pytest.approx(2 / 4)
    # top bigram (a b): count 2, char mass 2, total token chars 5
    assert r["top_bigram_frac"] == pytest.approx(2 * 2 / 5)


def test_top_tie_breaks_on_char_mass():
    # all bigrams count 1; (aaa,b) has the largest char mass 4
    df = _stats(["aaa b c b"])
    r = df.loc[0]
    assert r["n_bigrams"] == 3
    assert r["dup_bigram_frac"] == 0.0
    assert r["top_bigram_frac"] == pytest.approx(1 * 4 / 6)


def test_degenerate_docs():
    df = _stats(["", "solo", "x y"])
    assert df.loc[0]["n_tokens"] == 0
    assert df.loc[0]["n_bigrams"] == 0
    assert df.loc[0]["dup_bigram_frac"] == 0.0
    assert df.loc[1]["n_bigrams"] == 0
    assert df.loc[1]["top_bigram_frac"] == 0.0
    assert df.loc[2]["n_bigrams"] == 1
    assert df.loc[2]["top_bigram_frac"] == pytest.approx(1.0)


def test_case_folding_and_separators():
    # 'A.a' splits on '.', folds to the duplicate bigram key 'a a'
    df = _stats(["A.a B,a  a"])
    r = df.loc[0]
    assert r["n_tokens"] == 5
    # tokens: a a b a a -> bigrams (a,a)x2 (a,b) (b,a)
    assert r["dup_bigram_frac"] == pytest.approx(2 / 4)


def test_all_repeated():
    df = _stats(["w w w w w w"])
    r = df.loc[0]
    assert r["dup_bigram_frac"] == 1.0
    assert r["top_bigram_frac"] == pytest.approx(5 * 2 / 6)


def test_top_bigrams_counts_and_ties():
    texts = ["a b a b", "a b z z", "m n"]
    ds = rd.from_arrow(
        pa.table(
            {"doc_id": pa.array(range(3), type=pa.int64()),
             "text": pa.array(texts, type=pa.string())}
        )
    )
    res = top_bigrams(ds, k=3).to_pandas()
    # counts: 'a b' 3, 'b a' 1, 'b z' 1, 'z z' 1, 'm n' 1
    assert list(res["bigram"])[0] == "a b"
    assert int(res["n"].iloc[0]) == 3
    # deterministic tie order: lexicographic among count-1 bigrams
    assert list(res["bigram"])[1:] == ["b a", "b z"]


def test_no_cross_doc_bigrams():
    # 'x' at end of doc0 and 'y' at start of doc1 must not pair
    ds = rd.from_arrow(
        pa.table(
            {"doc_id": pa.array([0, 1], type=pa.int64()),
             "text": pa.array(["q x", "y q"], type=pa.string())}
        )
    )
    res = top_bigrams(ds, k=10).to_pandas()
    assert set(res["bigram"]) == {"q x", "y q"}
