"""Porter stemmer (M.F. Porter, "An algorithm for suffix stripping",
Program 14(3) 1980) + the Lucene English stop set — the pieces behind the
``EnglishAnalyzer`` value of ``luc:analyzer`` (B43 FTS).

Implemented from the published algorithm (public domain; the reference
wraps Lucene's EnglishAnalyzer whose stem filter is this same algorithm).
The five steps run in order, longest-matching suffix per step; conditions
are expressed on the *stem* that remains after removing the candidate
suffix, using Porter's measure m (the number of VC sequences in the
[C](VC)^m[V] decomposition).

This module is deliberately dependency-free and driver/executor agnostic:
query-side analysis runs driver-side on the handful of query terms, and
the index build applies :func:`english_analyze` through one Arrow-batched
pandas UDF over the document text (operators/fts.py) — stemming is
genuinely inexpressible in built-in SQL functions, and the UDF runs once
per index build, never on the per-query hot path.
"""

from __future__ import annotations

_VOWELS = set("aeiou")


def _is_consonant(word: str, i: int) -> bool:
    c = word[i]
    if c in _VOWELS:
        return False
    if c == "y":
        # y is a consonant at word start or after a vowel; a vowel after
        # a consonant (Porter §2: "y ... with a consonant to its left")
        return i == 0 or not _is_consonant(word, i - 1)
    return True


def _measure(stem: str) -> int:
    """m in [C](VC)^m[V]."""
    m = 0
    i = 0
    n = len(stem)
    while i < n and _is_consonant(stem, i):        # leading [C]
        i += 1
    while i < n:
        while i < n and not _is_consonant(stem, i):  # V part
            i += 1
        if i >= n:
            break
        m += 1                                      # ...C closes a VC
        while i < n and _is_consonant(stem, i):
            i += 1
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _is_consonant(stem, i) for i in range(len(stem)))


def _ends_double_consonant(word: str) -> bool:
    return (len(word) >= 2 and word[-1] == word[-2]
            and _is_consonant(word, len(word) - 1))


def _ends_cvc(word: str) -> bool:
    """*o: last three letters are consonant-vowel-consonant and the final
    consonant is not w, x or y."""
    if len(word) < 3:
        return False
    return (_is_consonant(word, len(word) - 3)
            and not _is_consonant(word, len(word) - 2)
            and _is_consonant(word, len(word) - 1)
            and word[-1] not in "wxy")


# (suffix, replacement, min_m) rule tables; longest suffix wins per step
_STEP2 = [("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
          ("anci", "ance"), ("izer", "ize"), ("abli", "able"),
          ("alli", "al"), ("entli", "ent"), ("eli", "e"),
          ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
          ("ator", "ate"), ("alism", "al"), ("iveness", "ive"),
          ("fulness", "ful"), ("ousness", "ous"), ("aliti", "al"),
          ("iviti", "ive"), ("biliti", "ble")]

_STEP3 = [("icate", "ic"), ("ative", ""), ("alize", "al"),
          ("iciti", "ic"), ("ical", "ic"), ("ful", ""), ("ness", "")]

_STEP4 = ["al", "ance", "ence", "er", "ic", "able", "ible", "ant",
          "ement", "ment", "ent", "ion", "ou", "ism", "ate", "iti",
          "ous", "ive", "ize"]


def _rule_table(word: str, rules, min_m: int) -> str:
    for suf, rep in sorted(rules, key=lambda r: -len(r[0])):
        if word.endswith(suf):
            stem = word[: len(word) - len(suf)]
            if _measure(stem) > min_m:
                return stem + rep
            return word          # longest match decides, even if m fails
    return word


def porter_stem(word: str) -> str:
    """Stem one lowercase word (callers lowercase; tokens here are
    already [a-z0-9]+ from the FTS tokenizer)."""
    w = word
    if len(w) <= 2:
        return w

    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]

    # step 1b
    did_1b = False
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    elif w.endswith("ed") and _has_vowel(w[:-2]):
        w = w[:-2]
        did_1b = True
    elif w.endswith("ing") and _has_vowel(w[:-3]):
        w = w[:-3]
        did_1b = True
    if did_1b:
        if w.endswith(("at", "bl", "iz")):
            w = w + "e"
        elif _ends_double_consonant(w) and w[-1] not in "lsz":
            w = w[:-1]
        elif _measure(w) == 1 and _ends_cvc(w):
            w = w + "e"

    # step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"

    # step 2 (m > 0) and step 3 (m > 0)
    w = _rule_table(w, _STEP2, 0)
    w = _rule_table(w, _STEP3, 0)

    # step 4 (m > 1; "ion" additionally requires stem ending s or t)
    for suf in sorted(_STEP4, key=len, reverse=True):
        if w.endswith(suf):
            stem = w[: len(w) - len(suf)]
            if _measure(stem) > 1 and (suf != "ion" or stem[-1:] in ("s", "t")):
                w = stem
            break

    # step 5a
    if w.endswith("e"):
        stem = w[:-1]
        m = _measure(stem)
        if m > 1 or (m == 1 and not _ends_cvc(stem)):
            w = stem
    # step 5b
    if _measure(w) > 1 and _ends_double_consonant(w) and w.endswith("l"):
        w = w[:-1]
    return w


#: Lucene's default English stop set (StopAnalyzer.ENGLISH_STOP_WORDS_SET,
#: public API constant — 33 words)
EN_STOPWORDS = frozenset(
    "a an and are as at be but by for if in into is it no not of on or "
    "such that the their then there these they this to was will with"
    .split())


def english_analyze(tokens) -> list[str]:
    """The EnglishAnalyzer token pipeline over ALREADY-tokenized lowercase
    terms: stop-word removal then Porter stemming (approximating Lucene's
    StandardTokenizer -> LowerCase -> Stop -> PorterStem chain; possessive
    handling inherits this engine's base non-alphanumeric splitter, a
    documented deviation shared with the standard analyzer)."""
    return [porter_stem(t) for t in tokens if t not in EN_STOPWORDS]
