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
    """(doc_id, token_count) using the engine tokenizer regex."""
    texts = batch["text"].to_pylist()
    counts = [len([t for t in TOKEN_RE.split(x) if t]) for x in texts]
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "token_count": pa.array(counts, type=pa.int64()),
        }
    )


def quality_batch(batch: pa.Table) -> pa.Table:
    """Vectorized quality metrics per doc: char count, alpha ratio,
    digit ratio, whitespace ratio, mean token length, stopword ratio."""
    texts = batch["text"].to_pylist()
    stops = stopword_set()
    n = len(texts)
    n_chars = np.empty(n, dtype=np.int64)
    alpha = np.empty(n, dtype=np.float64)
    digit = np.empty(n, dtype=np.float64)
    space = np.empty(n, dtype=np.float64)
    mean_tok = np.empty(n, dtype=np.float64)
    stop_ratio = np.empty(n, dtype=np.float64)
    for i, t in enumerate(texts):
        L = len(t)
        n_chars[i] = L
        if L == 0:
            alpha[i] = digit[i] = space[i] = mean_tok[i] = stop_ratio[i] = 0.0
            continue
        a = sum(c.isalpha() for c in t)
        d = sum(c.isdigit() for c in t)
        s = sum(c.isspace() for c in t)
        toks = [x for x in TOKEN_RE.split(t) if x]
        alpha[i] = a / L
        digit[i] = d / L
        space[i] = s / L
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
