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


# --------------------------------------------------------------------------
# Word-bigram repetition metrics (Gopher/MassiveText-style repetition
# filters, adapted to word n-grams: Rae et al. 2021, public).  A doc's
# tokens are the engine tokenizer's lowercased non-empty tokens; a
# bigram never crosses a document boundary.


def _batch_doc_bigrams(batch: pa.Table):
    """Tokenize a batch and return the flat per-batch bigram arrays:

    ``(doc_bounds, tok_lens, bkey, binv, bcounts, bdoc, bmass, n_docs)``
    where ``bkey`` is the unique (doc, w1, w2) int64 combo key sorted
    doc-major, ``binv/bcounts`` the np.unique inverse/counts, ``bdoc``
    the doc ordinal of each bigram OCCURRENCE, and ``bmass`` the char
    mass ``len(w1)+len(w2)`` per unique bigram.  One ``re.split`` per
    doc (C call), everything after is vectorized."""
    texts = batch["text"].to_pylist()
    toks_per_doc = [
        [t.lower() for t in TOKEN_RE.split(txt) if t] for txt in texts
    ]
    n_tok = np.fromiter(
        (len(t) for t in toks_per_doc), dtype=np.int64, count=len(texts)
    )
    flat = [t for doc in toks_per_doc for t in doc]
    doc_of = np.repeat(np.arange(len(texts), dtype=np.int64), n_tok)
    if flat:
        import pandas as pd

        codes, uniq = pd.factorize(np.asarray(flat, dtype=object))
        codes = codes.astype(np.int64)
        lenu = np.fromiter((len(u) for u in uniq), dtype=np.int64,
                           count=len(uniq))
    else:
        codes = np.empty(0, dtype=np.int64)
        lenu = np.empty(0, dtype=np.int64)
    v = np.int64(max(len(lenu), 1))
    # combo key (doc * V + w1) * V + w2 must fit int64; batch-scale
    # vocab (≤ ~1e6) × docs (≤ ~1e5) stays far under 2^63
    if int(v) * int(v) * max(len(texts), 1) >= 2**62:
        raise ValueError("bigram combo key would overflow; shrink batch")
    adj = doc_of[1:] == doc_of[:-1]
    c1, c2 = codes[:-1][adj], codes[1:][adj]
    bdoc = doc_of[:-1][adj]
    key = (bdoc * v + c1) * v + c2
    ukey, binv, bcounts = np.unique(key, return_inverse=True,
                                    return_counts=True)
    uw1 = (ukey // v) % v
    uw2 = ukey % v
    bmass = lenu[uw1] + lenu[uw2] if len(ukey) else np.empty(0, np.int64)
    udoc = ukey // (v * v)
    tok_chars = np.zeros(len(texts), dtype=np.int64)
    np.add.at(tok_chars, doc_of, lenu[codes])
    return {
        "n_docs": len(texts),
        "n_tok": n_tok,
        "tok_chars": tok_chars,
        "codes": codes,
        "uniq_tokens": uniq if flat else np.empty(0, dtype=object),
        "bdoc": bdoc,
        "ukey": ukey,
        "udoc": udoc,
        "binv": binv,
        "bcounts": bcounts,
        "bmass": bmass,
        "v": v,
    }


def repetition_stats_batch(batch: pa.Table) -> pa.Table:
    """Per-doc word-bigram repetition metrics:

    - ``dup_bigram_frac``: fraction of bigram occurrences whose bigram
      appears more than once in the doc;
    - ``top_bigram_frac``: char mass of the most frequent bigram
      (ties → larger char mass) over the doc's total token chars.

    Both are exact integer ratios computed as ``int/int`` float64
    division, so the SQL oracle reproduces them bit-for-bit (callers
    floor-scale for the hash compare, like ``quality``)."""
    b = _batch_doc_bigrams(batch)
    nd = b["n_docs"]
    n_bigrams = np.zeros(nd, dtype=np.int64)
    np.add.at(n_bigrams, b["bdoc"], 1)
    dup_occ = np.zeros(nd, dtype=np.int64)
    if len(b["binv"]):
        dup_mask = b["bcounts"][b["binv"]] > 1
        np.add.at(dup_occ, b["bdoc"][dup_mask], 1)
    # top bigram per doc: lexicographic (count, char-mass) max via a
    # composite int; bmass < 2^20 (tokens are bounded by doc length)
    comp_top = np.zeros(nd, dtype=np.int64)
    if len(b["ukey"]):
        if int(b["bmass"].max()) >= 1 << 20:
            raise ValueError(
                "bigram char mass exceeds the 20-bit composite budget "
                "(a single token longer than ~500 KB); such docs should "
                "be length-filtered upstream"
            )
        comp = b["bcounts"] * np.int64(1 << 20) + b["bmass"]
        np.maximum.at(comp_top, b["udoc"], comp)
    top_cnt = comp_top >> 20
    top_mass = comp_top & ((1 << 20) - 1)
    with np.errstate(divide="ignore", invalid="ignore"):
        dup_frac = np.where(
            n_bigrams > 0, dup_occ / np.maximum(n_bigrams, 1), 0.0
        )
        top_frac = np.where(
            n_bigrams > 0,
            (top_cnt * top_mass) / np.maximum(b["tok_chars"], 1),
            0.0,
        )
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_tokens": pa.array(b["n_tok"], type=pa.int64()),
            "n_bigrams": pa.array(n_bigrams, type=pa.int64()),
            "dup_bigram_frac": pa.array(dup_frac, type=pa.float64()),
            "top_bigram_frac": pa.array(top_frac, type=pa.float64()),
        }
    )


def top_bigrams(ds, *, k: int = 20):
    """Corpus-wide top-k word bigrams: per-batch partial counts
    (combiner — the shuffle carries unique bigrams per block, not
    occurrences), small ``groupby(bigram).sum``, deterministic top-k
    by (count desc, bigram asc)."""
    from ray.data.aggregate import Sum

    from web_based_search_engine_ray.util import coalesce

    def partial(batch: pa.Table) -> pa.Table:
        b = _batch_doc_bigrams(batch)
        if not len(b["ukey"]):
            return pa.table(
                {"bigram": pa.array([], type=pa.string()),
                 "n": pa.array([], type=pa.int64())}
            )
        v = b["v"]
        uw1 = (b["ukey"] // v) % v
        uw2 = b["ukey"] % v
        toks = b["uniq_tokens"]
        # collapse across docs within the batch
        pair = uw1 * v + uw2
        upair, pinv = np.unique(pair, return_inverse=True)
        cnt = np.zeros(len(upair), dtype=np.int64)
        np.add.at(cnt, pinv, b["bcounts"])
        names = [f"{toks[p // v]} {toks[p % v]}" for p in upair]
        return pa.table(
            {"bigram": pa.array(names, type=pa.string()),
             "n": pa.array(cnt, type=pa.int64())}
        )

    agg = (
        coalesce(ds.map_batches(partial, batch_format="pyarrow"))
        .groupby("bigram")
        .aggregate(Sum("n", alias_name="n"))
    )
    return agg.sort(["n", "bigram"], descending=[True, False]).limit(k)
