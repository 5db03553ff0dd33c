"""Conformance tests for the reference-faithful Porter stemmer.

Expected values are hand-traced from ``Porter.java`` (quirk cases were
also probed on the reference implementation per SURVEY.md §2.2)."""

from __future__ import annotations

import pytest

from web_based_search_engine_ray.functions.porter import strip_affixes

CASES = [
    # --- quirks recorded in SURVEY.md (probed on the Java) ---
    ("this", "thi"),           # bare-s removal has no measure guard
    ("was", "wa"),
    ("kilogram", "gram"),      # metric prefix stripping
    ("digitiser", "digit"),    # British -iser → ize → step4 -ize
    ("Well-Known", "wellknown"),  # clean() strips non-alphanumerics
    ("web_site", "websit"),    # clean() joins, then step5 drops the e (m=2)
    # --- length <= 2 returned unchanged (after lowercase+clean) ---
    ("is", "is"),
    ("a", "a"),
    ("GO", "go"),
    ("", ""),
    # --- classic Porter behavior shared with this variant ---
    ("caresses", "caress"),
    ("ponies", "poni"),
    ("caress", "caress"),
    ("cats", "cat"),
    ("agreed", "agre"),        # eed → ee, then step5 drops the e (m=1, ends vowel)
    ("running", "run"),        # double consonant undoubled
    ("hopping", "hop"),
    ("falling", "fall"),       # -ll not undoubled
    ("filing", "file"),        # cvc → restore e
    ("sky", "sky"),            # y kept when stem has no vowel
    ("happy", "happi"),
    ("relational", "relat"),   # step2 ational→ate, step5 drops e
    ("conditional", "condition"),  # step2 tional→tion; step4 m("condi")=1 → kept
    ("connection", "connec"),  # step4 strips tion (m("connec")=2)
    ("digitizer", "digit"),
    ("organisation", "organ"), # British -isation → ize, step4 -ize
    ("normalise", "normal"),   # step3 alise → al
    ("hopefulness", "hope"),
    ("generalization", "gener"),
    ("oscillators", "oscil"),  # step4 -ate, step5 double-l
    ("controller", "control"),
    ("kilometers", "meter"),
    ("pseudoscience", "scienc"),
    ("stemming", "stem"),
    ("stemmed", "stem"),
    ("words", "word"),
    ("search", "search"),
    ("engine", "engin"),
    ("engines", "engin"),
    ("indexed", "index"),
    ("indexing", "index"),
    ("queries", "queri"),
    ("crawler", "crawler"),    # step4 -er needs m(stem) > 1; m("crawl")=1
    ("documents", "docum"),    # step4: -ment fails (m=1) but loop continues; -ent strips (m=2)
    ("dies", "di"),
    ("ties", "ti"),
    ("sses", "sse"),           # bare-s drop (second-to-last is 'e'), then nothing applies
    ("kilos", ""),             # prefix strip → "s" → step1 → ""
]


@pytest.mark.parametrize("word,expected", CASES)
def test_strip_affixes(word, expected):
    assert strip_affixes(word) == expected


def test_trace_measure_and_helpers():
    from web_based_search_engine_ray.functions import porter

    assert porter._measure("digit") == 2
    assert porter._measure("rel") == 1
    assert porter._measure("agree") == 1
    assert porter._measure("tr") == 0
    # y-as-vowel rules: "syzygy" s-y(v)-z-y(v)-g-y(v)
    assert porter._measure("syzygy") == 2
    assert porter._cvc("fil")
    assert not porter._cvc("fall")
    assert not porter._cvc("box")       # ends x
    # y after a consonant is a vowel, so "sky" contains a vowel; but the
    # step1 y-rule checks the stem "sk", which doesn't.
    assert porter._contains_vowel("sky") is True
    assert porter._contains_vowel("sk") is False
    assert porter._contains_vowel("run") is True


def test_idempotent_on_common_words():
    # Stemming twice must equal stemming once for typical index terms
    # (query terms are stemmed the same single time as index terms, but
    # this guards against accidental re-entrancy bugs).
    for w in ["merge", "join", "window", "batch", "stream", "spark",
              "filter", "customer", "query", "tables", "sorted"]:
        once = strip_affixes(w)
        assert strip_affixes(once) == once
