"""Stopword set (reference resource ``src/main/resources/stopwords.txt``,
loaded once per process like ``StopStem.java:17-29``).  The membership test
runs on the *lowercased raw token, before stemming* (``Indexer.java:65-68``).
"""

from __future__ import annotations

import functools
from importlib import resources


@functools.lru_cache(maxsize=1)
def stopword_set() -> frozenset[str]:
    text = (
        resources.files("web_based_search_engine_ray")
        .joinpath("data/stopwords.txt")
        .read_text(encoding="utf-8")
    )
    # splitlines() strips \r\n like Java's BufferedReader.lines().
    return frozenset(line for line in text.splitlines() if line)
