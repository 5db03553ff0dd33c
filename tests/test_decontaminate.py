"""Decontamination: crafted corpus with known n-gram overlaps."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from web_based_search_engine_ray.pipelines.decontaminate import (
    _fold_ngrams_batch,
    benchmark_ngram_hashes,
    decontaminate,
    ngram_fold_constants,
)
from web_based_search_engine_ray.pipelines.dedup import (
    _MERSENNE,
    _batch_token_hash_arrays,
)

_BENCH = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
_W = _BENCH.split()


def _ds(texts, ids=None):
    ids = ids if ids is not None else list(range(len(texts)))
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "text": pa.array(texts, type=pa.string()),
            }
        )
    )


def test_flagging_semantics(ray_session):
    corpus = [
        # shares the full first 8-gram verbatim (inside longer text)
        "zzz " + " ".join(_W[:8]) + " yyy",
        # only 7 consecutive shared tokens -> NOT contaminated
        " ".join(_W[:7]) + " different tail words here now",
        # same 8 tokens but reordered -> NOT contaminated
        " ".join(_W[:8][::-1]) + " plus filler",
        # unrelated
        "completely unrelated text with many other tokens present",
        # shorter than n tokens -> never contaminated
        "alpha bravo charlie",
    ]
    bench = _ds([_BENCH], ids=[100])
    hashes = benchmark_ngram_hashes(bench, n=8)
    out = (
        decontaminate(_ds(corpus), hashes, n=8)
        .to_pandas()
        .sort_values("doc_id")
    )
    assert out["contaminated"].tolist() == [
        True, False, False, False, False,
    ]


def test_case_insensitive_and_drop_mode(ray_session):
    corpus = [" ".join(w.upper() for w in _W[:8]) + " extra", "clean doc"]
    hashes = benchmark_ngram_hashes(_ds([_BENCH]), n=8)
    kept = (
        decontaminate(_ds(corpus), hashes, n=8, action="drop")
        .to_pandas()
    )
    assert kept["doc_id"].tolist() == [1]


def test_empty_benchmark(ray_session):
    hashes = benchmark_ngram_hashes(
        _ds(["short"]), n=8
    )  # no full 8-gram -> empty set
    assert len(hashes) == 0
    out = decontaminate(_ds([_BENCH]), hashes, n=8).to_pandas()
    assert not out["contaminated"].any()


def test_fold_matches_constants():
    """The windowed fold equals the closed-form Σ h_j·c_j mod p with
    the SQL-inlined constants (the oracle contract)."""
    hv, offsets = _batch_token_hash_arrays([_BENCH])
    folds, doc_idx = _fold_ngrams_batch(hv, offsets, 8)
    cs = ngram_fold_constants(8)
    m = (hv % np.uint64(_MERSENNE)).astype(object)
    expect = [
        sum(int(m[i + j]) * cs[j] for j in range(8)) % _MERSENNE
        for i in range(len(m) - 7)
    ]
    assert folds.tolist() == expect
    assert (doc_idx == 0).all()


def test_window_never_crosses_doc_boundary():
    hv, offsets = _batch_token_hash_arrays(
        [" ".join(_W[:4]), " ".join(_W[4:8])]
    )
    folds, _ = _fold_ngrams_batch(hv, offsets, 8)
    assert len(folds) == 0  # 8 tokens total but split 4|4
