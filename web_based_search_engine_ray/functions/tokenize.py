"""Tokenizer + stop-stem normalization.

Semantics pinned to the reference:

- Token split regex ``[^a-zA-Z0-9_-]+`` (``Crawler.java:39,59``;
  query side ``JavalinServer.java:48,58``).  ``_`` and ``-`` stay inside
  tokens.  Java's ``String.split`` keeps a leading empty token and drops
  trailing ones; empty tokens are always dropped later by ``stemWord``
  (blank check, ``Indexer.java:71-72``) and never occupy a position, so
  dropping them here is observationally identical.
- ``stem_word`` (``Indexer.stemWord``, ``Indexer.java:65-75``):
  lowercase → stopword test on the *raw lowercased token* → Porter
  ``strip_affixes`` → drop if blank.
- Positions (used for phrase search) are indices into the
  *post-filter* term sequence: dropped tokens (stopwords, blanks) do
  not take a position (``Indexer.java:117-140`` builds the filtered
  list, ``PostingIndex.java:50-64`` enumerates it).
"""

from __future__ import annotations

import re

from web_based_search_engine_ray.functions.porter import strip_affixes
from web_based_search_engine_ray.functions.stopwords import stopword_set

TOKEN_PATTERN = r"[^a-zA-Z0-9_-]+"
TOKEN_RE = re.compile(TOKEN_PATTERN)


def tokenize(text: str) -> list[str]:
    """Raw tokens (non-empty) in order."""
    return [t for t in TOKEN_RE.split(text) if t]


def stem_word(
    word: str,
    *,
    use_stopwords: bool = True,
    use_stemming: bool = True,
    _stops: frozenset[str] | None = None,
) -> str | None:
    """Normalize one raw token; ``None`` means the token is dropped."""
    w = word.lower()
    if use_stopwords:
        stops = _stops if _stops is not None else stopword_set()
        if w in stops:
            return None
    if use_stemming:
        w = strip_affixes(w)
    if not w or w.isspace():
        return None
    return w


def analyze(
    text: str,
    *,
    use_stopwords: bool = True,
    use_stemming: bool = True,
) -> list[str]:
    """Tokenize + normalize; the i-th element's index IS its position."""
    stops = stopword_set() if use_stopwords else None
    out = []
    for tok in TOKEN_RE.split(text):
        if not tok:
            continue
        w = stem_word(
            tok,
            use_stopwords=use_stopwords,
            use_stemming=use_stemming,
            _stops=stops,
        )
        if w is not None:
            out.append(w)
    return out
