"""Reference-faithful Porter stemmer.

This is a behavioral re-implementation of the *non-canonical* Porter
variant used by the reference engine (``Porter.java:21-402``, the
Lazarinis C→Java translation).  It must NOT be replaced by
NLTK/Snowball: document/query terms must produce identical keys for
rank-identical results.  Known deviations from canonical Porter that
this implementation reproduces (verified against the Java source, see
``tests/test_porter.py``):

- ``stripAffixes`` lowercases, then ``clean()`` strips every
  non-alphanumeric char (``well-known`` → ``wellknown``), then only for
  len > 2: strips metric prefixes {kilo micro milli intra ultra mega
  nano pico pseudo} (``Porter.java:354-369``) before suffix steps.
- Tokens of length <= 2 are returned unchanged (``Porter.java:391``).
- British suffix rules: ``-iser``/``-isation`` → ``ize``, ``-alise`` →
  ``al``, ``-ise`` stripped in step 4 (``Porter.java:251,258,287,308``).
- ``y`` counts as a vowel iff the previous char is not a vowel
  (``Porter.java:76-89``); at scan starts the "previous" char is ``'a'``
  or ``'?'`` exactly as in the Java (``Porter.java:101-119``).
- step1's bare-``s`` removal drops the final ``s`` whenever the
  second-to-last char isn't ``s`` (no measure guard), so ``this`` →
  ``thi``, ``was`` → ``wa``.
- step5 measures the *whole* string, not the stem (``Porter.java:327``).
"""

from __future__ import annotations

_VOWELS = frozenset("aeiou")


def _vowel(ch: str, prev: str) -> bool:
    # Porter.java:68-94 — y is a vowel only after a non-vowel.
    if ch in _VOWELS:
        return True
    if ch == "y":
        return prev not in _VOWELS
    return False


def _measure(stem: str) -> int:
    # Porter.java:96-128 — count of VC sequences, literal translation.
    i, count, length = 0, 0, len(stem)
    while i < length:
        while i < length:
            prev = stem[i - 1] if i > 0 else "a"
            if _vowel(stem[i], prev):
                break
            i += 1
        i += 1
        while i < length:
            prev = stem[i - 1] if i > 0 else "?"
            if not _vowel(stem[i], prev):
                break
            i += 1
        if i < length:
            count += 1
            i += 1
    return count


def _contains_vowel(word: str) -> bool:
    # Porter.java:130-142
    for i, ch in enumerate(word):
        prev = word[i - 1] if i > 0 else "a"
        if _vowel(ch, prev):
            return True
    return False


def _cvc(s: str) -> bool:
    # Porter.java:144-168 — ends consonant-vowel-consonant, last not w/x/y.
    length = len(s)
    if length < 3:
        return False
    if (
        not _vowel(s[-1], s[-2])
        and s[-1] not in "wxy"
        and _vowel(s[-2], s[-3])
    ):
        if length == 3:
            return not _vowel(s[0], "?")
        return not _vowel(s[-3], s[-4])
    return False


def _has_suffix(word: str, suffix: str) -> bool:
    # Porter.java:43-66 — true iff word strictly longer than suffix and
    # ends with it (the charAt pre-check there is just an optimization).
    return len(word) > len(suffix) and word.endswith(suffix)


def _step1(s: str) -> str:
    # Porter.java:170-242 — plurals, -ed/-ing, terminal y.
    if s[-1] == "s":
        if _has_suffix(s, "sses") or _has_suffix(s, "ies"):
            s = s[:-2]
        else:
            if len(s) == 1:
                return ""
            if s[-2] != "s":
                s = s[:-1]

    if _has_suffix(s, "eed"):
        if _measure(s[:-3]) > 0:
            s = s[:-1]
    else:
        stem = None
        if _has_suffix(s, "ed"):
            stem = s[:-2]
        elif _has_suffix(s, "ing"):
            stem = s[:-3]
        if stem is not None and _contains_vowel(stem):
            s = stem
            if len(s) == 1:
                return s
            if _has_suffix(s, "at") or _has_suffix(s, "bl") or _has_suffix(s, "iz"):
                s += "e"
            elif s[-1] == s[-2] and s[-1] not in "lsz":
                s = s[:-1]
            elif _measure(s) == 1 and _cvc(s):
                s += "e"

    if _has_suffix(s, "y") and _contains_vowel(s[:-1]):
        s = s[:-1] + "i"
    return s


_STEP2_SUFFIXES = (
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"), ("anci", "ance"),
    ("izer", "ize"), ("iser", "ize"), ("abli", "able"), ("alli", "al"),
    ("entli", "ent"), ("eli", "e"), ("ousli", "ous"), ("ization", "ize"),
    ("isation", "ize"), ("ation", "ate"), ("ator", "ate"), ("alism", "al"),
    ("iveness", "ive"), ("fulness", "ful"), ("ousness", "ous"),
    ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
)  # Porter.java:246-267 (order matters; includes the British -iser/-isation)

_STEP3_SUFFIXES = (
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("alise", "al"),
    ("iciti", "ic"), ("ical", "ic"), ("ful", ""), ("ness", ""),
)  # Porter.java:284-291

_STEP4_SUFFIXES = (
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "sion", "tion", "ou", "ism", "ate", "iti", "ous",
    "ive", "ize", "ise",
)  # Porter.java:306-308 (note plain sion/tion, and the British -ise)


def _step2(s: str) -> str:
    for suf, rep in _STEP2_SUFFIXES:
        if _has_suffix(s, suf):
            stem = s[: -len(suf)]
            if _measure(stem) > 0:
                return stem + rep
    return s


def _step3(s: str) -> str:
    for suf, rep in _STEP3_SUFFIXES:
        if _has_suffix(s, suf):
            stem = s[: -len(suf)]
            if _measure(stem) > 0:
                return stem + rep
    return s


def _step4(s: str) -> str:
    for suf in _STEP4_SUFFIXES:
        if _has_suffix(s, suf):
            stem = s[: -len(suf)]
            if _measure(stem) > 1:
                return stem
    return s


def _step5(s: str) -> str:
    # Porter.java:324-352 — terminal e, terminal double-l.  NB: measures
    # the whole string (equal to measuring the stem when it ends in a
    # vowel, per the comment in the Java).
    if s[-1] == "e":
        m = _measure(s)
        if m > 1:
            s = s[:-1]
        elif m == 1:
            stem = s[:-1]
            if not _cvc(stem):
                s = stem
    if len(s) == 1:
        return s
    if s[-1] == "l" and s[-2] == "l" and _measure(s) > 1:
        s = s[:-1]
    return s


def _strip_prefixes(s: str) -> str:
    # Porter.java:354-369
    for p in ("kilo", "micro", "milli", "intra", "ultra", "mega", "nano",
              "pico", "pseudo"):
        if s.startswith(p):
            return s[len(p):]
    return s


def _strip_suffixes(s: str) -> str:
    # Porter.java:371-384
    s = _step1(s)
    if s:
        s = _step2(s)
    if s:
        s = _step3(s)
    if s:
        s = _step4(s)
    if s:
        s = _step5(s)
    return s


def _clean(s: str) -> str:
    # Porter.java:30-41 — keep only letter-or-digit chars.  Matches
    # Java's Character.isLetterOrDigit (categories L* and Nd): Python's
    # str.isalnum also accepts No/Nl number characters ('²', '½'),
    # which Java rejects, so non-ASCII chars get an explicit category
    # test.  (Tokenizer output is ASCII-only; the slow path exists for
    # direct strip_affixes callers.)
    if s.isascii():
        return "".join(ch for ch in s if ch.isalnum())
    import unicodedata

    return "".join(
        ch for ch in s
        if (cat := unicodedata.category(ch)).startswith("L") or cat == "Nd"
    )


def strip_affixes(word: str) -> str:
    """Equivalent of ``Porter.stripAffixes`` (``Porter.java:386-400``)."""
    s = _clean(word.lower())
    if len(s) > 2:
        s = _strip_prefixes(s)
        if s:
            s = _strip_suffixes(s)
    return s
