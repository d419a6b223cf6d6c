"""Classic Porter stemmer (M.F. Porter, "An algorithm for suffix
stripping", Program 14(3), 1980) — the second implementation behind the
pluggable-tokenizer hook (``IndexConfig.stemmer = "porter"``).

The reference engine's PRIMARY tokenizer branch stems with NLTK's
PorterStemmer when NLTK is present (/root/reference/utils/
text_processing.py:62-74); the sandbox exercises the fallback branch, so
round-1 conformance was against the unstemmed chain. This module
implements the PUBLISHED algorithm (not NLTK's extension mode) from the
paper's rule tables; unit tests pin the paper's own example vectors.

Hot-path application is per-DISTINCT-token: ``stem_array`` dictionary-
encodes the token column and stems each distinct token once (Python cost
O(vocabulary), not O(tokens)).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_VOWELS = "aeiou"


def _is_cons(w: str, i: int) -> bool:
    c = w[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return i == 0 or not _is_cons(w, i - 1)
    return True


def _measure(stem: str) -> int:
    """m in [C](VC)^m[V]: the number of vowel→consonant transitions."""
    m = 0
    prev_cons = True  # initial consonant run doesn't count
    started_vowel = False
    for i in range(len(stem)):
        cons = _is_cons(stem, i)
        if not cons:
            started_vowel = True
        elif started_vowel and not prev_cons:
            m += 1
        prev_cons = cons
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(w: str) -> bool:
    return (len(w) >= 2 and w[-1] == w[-2] and _is_cons(w, len(w) - 1))


def _ends_cvc(w: str) -> bool:
    """*o: stem ends cons-vowel-cons, final cons not w, x or y."""
    if len(w) < 3:
        return False
    return (_is_cons(w, len(w) - 3) and not _is_cons(w, len(w) - 2)
            and _is_cons(w, len(w) - 1) and w[-1] not in "wxy")


# (suffix, replacement) tables; within a step the LONGEST matching suffix
# wins, and if its m-condition fails nothing else in the step applies.
_STEP2 = [
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
    ("anci", "ance"), ("izer", "ize"), ("abli", "able"), ("alli", "al"),
    ("entli", "ent"), ("eli", "e"), ("ousli", "ous"), ("ization", "ize"),
    ("ation", "ate"), ("ator", "ate"), ("alism", "al"), ("iveness", "ive"),
    ("fulness", "ful"), ("ousness", "ous"), ("aliti", "al"),
    ("iviti", "ive"), ("biliti", "ble"),
]
_STEP3 = [
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
]
_STEP4 = [
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
]


def _longest_match(w: str, table) -> tuple[str, str] | None:
    best = None
    for suf, rep in table:
        if w.endswith(suf) and (best is None or len(suf) > len(best[0])):
            best = (suf, rep)
    return best


def porter_stem(word: str) -> str:
    w = word
    if len(w) <= 2:
        return w

    # Step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]

    # Step 1b
    cleanup = False
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    elif w.endswith("ed"):
        if _has_vowel(w[:-2]):
            w = w[:-2]
            cleanup = True
    elif w.endswith("ing"):
        if _has_vowel(w[:-3]):
            w = w[:-3]
            cleanup = True
    if cleanup:
        if w.endswith(("at", "bl", "iz")):
            w += "e"
        elif _ends_double_cons(w) and w[-1] not in "lsz":
            w = w[:-1]
        elif _measure(w) == 1 and _ends_cvc(w):
            w += "e"

    # Step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"

    # Step 2
    m2 = _longest_match(w, _STEP2)
    if m2 is not None:
        suf, rep = m2
        if _measure(w[:-len(suf)]) > 0:
            w = w[:-len(suf)] + rep

    # Step 3
    m3 = _longest_match(w, _STEP3)
    if m3 is not None:
        suf, rep = m3
        if _measure(w[:-len(suf)]) > 0:
            w = w[:-len(suf)] + rep

    # Step 4
    m4 = _longest_match(w, [(s, "") for s in _STEP4])
    if m4 is not None:
        suf, _ = m4
        stem = w[:-len(suf)]
        if _measure(stem) > 1:
            if suf == "ion":
                if stem and stem[-1] in "st":
                    w = stem
            else:
                w = stem

    # Step 5a
    if w.endswith("e"):
        m = _measure(w[:-1])
        if m > 1 or (m == 1 and not _ends_cvc(w[:-1])):
            w = w[:-1]

    # Step 5b
    if w.endswith("ll") and _measure(w) > 1:
        w = w[:-1]

    return w


STEMMERS = {"none": None, "porter": porter_stem}


def stem_array(tokens: pa.Array | pa.ChunkedArray,
               stemmer: str = "porter") -> pa.Array:
    """Stem a token column, hashing each DISTINCT token once (dictionary
    encode → stem distincts in Python → gather through the codes)."""
    fn = STEMMERS[stemmer]
    if fn is None:
        return tokens
    if isinstance(tokens, pa.ChunkedArray):
        tokens = tokens.combine_chunks()
    if len(tokens) == 0:
        return tokens
    dic = tokens.dictionary_encode()
    stemmed = pa.array([fn(t) for t in dic.dictionary.to_pylist()],
                       type=pa.string())
    codes = dic.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    return stemmed.take(pa.array(codes))
