from __future__ import annotations

from web_based_search_engine_ray.functions.stopwords import stopword_set
from web_based_search_engine_ray.functions.tokenize import (
    analyze,
    stem_word,
    tokenize,
)


def test_tokenize_regex():
    # [^a-zA-Z0-9_-]+ keeps _ and - inside tokens (Crawler.java:39)
    assert tokenize("Hello, world!  foo_bar-baz") == ["Hello", "world", "foo_bar-baz"]
    assert tokenize(",leading. and trailing,, ") == ["leading", "and", "trailing"]
    assert tokenize("") == []
    assert tokenize("   ") == []
    assert tokenize("a1 B2_c-3") == ["a1", "B2_c-3"]


def test_stopword_set_loaded():
    s = stopword_set()
    # 428 lines, 5 duplicates — the Java HashSet also holds 423.
    assert len(s) == 423
    assert "the" in s and "about" in s and "a" in s
    assert "spark" not in s


def test_stem_word_order():
    # stopword test happens BEFORE stemming, on the lowercased raw token
    # (Indexer.java:65-75).
    assert stem_word("The") is None
    assert stem_word("WAS") is None          # "was" is a stopword
    # "running" is not a stopword; stems to "run"
    assert stem_word("Running") == "run"
    # stemming may produce a stopword-looking string; it is still kept
    # (only the raw token is checked) — e.g. "theses" → "these" is a
    # stopword string but the raw token "theses" isn't.
    assert stem_word("theses") == "these"
    # blank after stemming → dropped
    assert stem_word("kilos") is None
    assert stem_word("--") is None


def test_analyze_positions():
    # Dropped tokens do not occupy positions: "hello the world" yields
    # hello@0, world@1, so the phrase "hello world" matches adjacency.
    assert analyze("hello the world") == ["hello", "world"]
    assert analyze("The Fast Merge!") == ["fast", "merg"]
    assert analyze("the of and") == []


def test_analyze_no_stem_no_stop():
    assert analyze("The Fast Merge!", use_stopwords=False, use_stemming=False) == [
        "the", "fast", "merge",
    ]
